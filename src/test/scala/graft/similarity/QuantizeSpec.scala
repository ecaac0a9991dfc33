package graft.similarity

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8: scale from max magnitude, codes in [-127,127], error bounded") {
    // max magnitude 127 makes scale exactly 1.0, so the code arithmetic is
    // binary-exact and the half-way rounding case (0.5 -> 1) is pinned
    val vecs = Seq(
      (1L, Array(127.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),      // zero vector: all-zero codes, no error
      (3L, Array(1.0f))                   // scale = 1/127; code 127, err ~1e-16 -> 0
    ).toDF("vec_id", "embedding")
    val out = Quantize.int8(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect()

    val r1 = out(0)
    assert(r1.getLong(1) == 3L)
    assert(r1.getDouble(2) == 1.0)
    assert(r1.getSeq[Double](3) == Seq(127.0, -2.0, 1.0)) // 0.5 rounds half-up to 1
    assert(r1.getDouble(4) == 0.5, "error bounded by scale/2, attained at the half-way code")

    val r2 = out(1)
    assert(r2.getDouble(2) == 0.0 && r2.getSeq[Double](3) == Seq(0.0, 0.0, 0.0)
      && r2.getDouble(4) == 0.0)

    val r3 = out(2)
    assert(r3.getSeq[Double](3) == Seq(127.0) && r3.getDouble(4) == 0.0)
  }

  test("int8TopK: unbounded shortlist equals brute force; bounded keeps recall") {
    // points on an arc (cosine = angle gap, well separated) with varying
    // norms — a raw-dot shortlist would rank the big-norm vectors first;
    // the code-space COSINE must rank by angle
    val vecs = (0L until 60L).map { i =>
      val theta = i * 1.5 * math.Pi / 180.0
      val r = (1 + i % 3).toDouble
      (i, Array((r * math.cos(theta)).toFloat, (r * math.sin(theta)).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 2)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding",
        k = 5, roundDigits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val anchored = Quantize.int8TopK(queries, vecs, "vec_id", "embedding",
        k = 5, shortlist = 1 << 20, roundDigits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(anchored == exact, "full shortlist must reproduce brute force")
    val bounded = Quantize.int8TopK(queries, vecs, "vec_id", "embedding",
        k = 5, shortlist = 15, roundDigits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bounded & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"bounded-shortlist recall $recall below 0.8")
    intercept[IllegalArgumentException] {
      Quantize.int8TopK(queries, vecs, "vec_id", "embedding", k = 5, shortlist = 3)
    }
  }

  test("int8TopK: zero vectors never surface as NaN-scored neighbors") {
    // a zero corpus vector has cosine 0/0 = NaN against everything; Spark
    // orders NaN above every real double, so without the zero-norm filter
    // it would permanently occupy a top-k slot
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)),  // zero corpus vector
      (3L, Array(0.8f, 0.2f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.int8TopK(vecs.filter($"vec_id" === 0L), vecs,
        "vec_id", "embedding", k = 3, shortlist = 10, roundDigits = 6)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.getDouble(2).isNaN), "no NaN scores")
    assert(!out.map(_.getLong(1)).contains(2L), "zero vector excluded")
    // a zero QUERY has no defined neighbors — it yields no rows, not NaNs
    val zq = Quantize.int8TopK(vecs.filter($"vec_id" === 2L), vecs,
        "vec_id", "embedding", k = 3, shortlist = 10)
      .collect()
    assert(zq.isEmpty, "zero query produces no NaN-ranked rows")
  }
}
