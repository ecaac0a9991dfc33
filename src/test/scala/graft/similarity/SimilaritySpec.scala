package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine on known vectors") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.norm(col("a")).as("n"),
      Similarity.cosine(col("a"), col("a")).as("self")).collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-15)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-15)
  }

  test("bruteForceTopK returns k best non-self neighbors with deterministic ties") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.01f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("id", "v")
    val out = Similarity.bruteForceTopK(vecs.filter(col("id") === 1L), vecs, "id", "v", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (1L, 3L))) // cos: 2≈1.0 > 3=0.0 > 4=-1.0
  }

  test("lshSignature: identical vectors collide, opposite vectors differ") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Array(-1.0f, -2.0f, -3.0f, -4.0f))).toDF("id", "v")
    val sig = vecs.select(col("id"), Similarity.lshSignature(col("v"), 8, 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L)) // all 8 plane signs flip
    assert((sig(1L) ^ sig(3L)) == 0xffL)
  }

  test("lshTopK at nPlanes=0 equals brute force (the sim2b anchor)") {
    // nPlanes=0 => constant signature => one bucket => exhaustive search
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.2f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.3f)),
      (5L, Array(0.2f, 0.2f, 0.9f, 0.1f))).toDF("id", "v")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairs(Similarity.lshTopK(vecs, "id", "v", k = 2, nPlanes = 0, dim = 4))
    val brute = pairs(Similarity.bruteForceTopK(vecs, vecs, "id", "v", k = 2))
    assert(lsh == brute && lsh.size == 10) // 5 queries x k=2
  }

  test("softmaxArray sums to 1 and argmaxArray is 0-based") {
    val df = Seq(Array(0.1, 2.0, 0.5)).toDF("v")
    val r = df.select(
      aggregate(Similarity.softmaxArray(col("v")), lit(0.0), (a, x) => a + x).as("s"),
      Similarity.argmaxArray(col("v")).as("am")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == 1L)
  }

  test("mmrRerank: first pick is the top hit; diversity demotes the near-dup") {
    // query 0 ~ e1; candidates: 1 and 2 nearly identical (both close to q),
    // 3 orthogonal-ish but still relevant
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.14f, 0.0f)),
      (2L, Array(0.99f, 0.141f, 0.0f)), // near-dup of 1
      (3L, Array(0.7f, 0.0f, 0.7f)))
      .toDF("id", "v")
    val shortlist = Similarity.bruteForceTopK(
      corpus.filter(col("id") === 0L), corpus, "id", "v", k = 3)
    // λ=1: plain relevance order 1, 2, 3
    val plain = Similarity.mmrRerank(shortlist, corpus, "id", "v", m = 3, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(plain == Seq(1L, 2L, 3L))
    // moderate λ: the near-dup 2 drops below the diverse 3
    val div = Similarity.mmrRerank(shortlist, corpus, "id", "v", m = 3, lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(div == Seq(1L, 3L, 2L))
    // m caps output; deterministic across partitionings
    val m2 = Similarity.mmrRerank(shortlist.repartition(7), corpus, "id", "v",
      m = 2, lambda = 0.5).orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(m2 == Seq(1L, 3L))
  }

  test("rangeSearch: threshold cut equals filtered exhaustive top-k; zero vecs excluded") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.9, 0.1)), (2L, Array(0.0, 1.0)),
      (3L, Array(-1.0, 0.0)), (4L, Array(0.0, 0.0))).toDF("id", "v")
    val out = Similarity.rangeSearch(vecs.filter($"id" === 0L), vecs,
        "id", "v", minCos = 0.5, roundDigits = 6)
      .orderBy("neighbor_id").collect()
    // only vec 1 is within cos >= 0.5 of vec 0; the zero vector never
    // appears (NaN cosine would otherwise rank above everything)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L))
    // equivalence to brute-force top-k with k = corpus, then threshold
    val viaTopK = Similarity.bruteForceTopK(vecs.filter($"id" === 0L),
        vecs.filter($"id" =!= 4L), "id", "v", k = 10, roundDigits = 6)
      .filter($"cos" >= 0.5).orderBy("neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      == viaTopK)
    intercept[IllegalArgumentException] {
      Similarity.rangeSearch(vecs, vecs, "id", "v", minCos = -1.0)
    }
  }

  test("mmrRerank survives a zero-norm vector in the shortlist") {
    // cosine against the zero vector is 0/0 = NaN; every MMR score involving
    // it is NaN and must not derail selection (regression: best stayed -1)
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)), // zero-norm
      (3L, Array(0.5f, 0.5f)))
      .toDF("id", "v")
    val shortlist = Seq((0L, 1L, 0.99), (0L, 2L, 0.0), (0L, 3L, 0.7))
      .toDF("query_id", "neighbor_id", "cos")
    val out = Similarity.mmrRerank(shortlist, corpus, "id", "v", m = 3, lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out.length == 3 && out.toSet == Set(1L, 2L, 3L))
    assert(out.head == 1L) // relevance still leads
  }

  test("nPlanesFor holds bucket occupancy as the corpus scales") {
    assert(Similarity.nPlanesFor(2048, 16) == 7)     // 2^7 buckets of ~16
    assert(Similarity.nPlanesFor(20480, 16) == 11)   // 10x data -> +log2(10)
    assert(Similarity.nPlanesFor(1, 16) == 1)        // clamp low
    assert(Similarity.nPlanesFor(Long.MaxValue, 1) == 63) // clamp to one long
    // monotone in corpus size
    val seq = Seq(100L, 1000L, 10000L, 100000L).map(Similarity.nPlanesFor(_, 16))
    assert(seq == seq.sorted)
    // expected occupancy n / 2^p stays within [target/2, target] at the
    // computed p (ceil rounds the bucket count up, halving occupancy at most)
    for (n <- Seq(500L, 5000L, 50000L, 500000L)) {
      val p = Similarity.nPlanesFor(n, 16)
      val occ = n.toDouble / (1L << p)
      assert(occ <= 16.0 + 1e-9 && occ > 8.0 - 1e-9, s"n=$n p=$p occ=$occ")
    }
    intercept[IllegalArgumentException] { Similarity.nPlanesFor(0, 16) }
  }

  test("jlProjection: deterministic signs, norm preserved in expectation, identical vectors stay identical") {
    // signs are a pure function of (seed, i, j)
    assert(Similarity.jlSign("rp", 3, 5) == Similarity.jlSign("rp", 3, 5))
    assert(Seq(Similarity.jlSign("rp", 0, 0)).forall(s => s == 1.0 || s == -1.0))
    // sign table is balanced enough to be a real projection (not constant)
    val signs = for (i <- 0 until 64; j <- 0 until 16)
      yield Similarity.jlSign("rp", i, j)
    assert(signs.count(_ > 0) > 300 && signs.count(_ < 0) > 300)
    // project a few structured vectors: cosine(v, v) stays exactly 1 after
    // projection (same vector -> same projected vector), and squared norm
    // is preserved within JL tolerance for a dense vector
    import spark.implicits._
    val v = Array.tabulate(64)(i => math.sin(i + 1.0))
    val df = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
    val proj = Similarity.randomProject(df, "embedding", 64, 16)
    val rows = proj.orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    assert(rows(0).length == 16)
    assert(rows(0).toSeq == rows(1).toSeq)
    val n0 = v.map(x => x * x).sum
    val n1 = rows(0).map(x => x * x).sum
    assert(math.abs(n1 - n0) / n0 < 0.75, s"norm $n0 -> $n1 outside JL slack")
    intercept[IllegalArgumentException] {
      Similarity.randomProject(df, "embedding", 16, 64)
    }
  }
}
