package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // clustered data: 8 well-separated centers in 16-dim, 40 points each —
  // the regime PQ is built for (random orthogonal noise defeats ANY
  // 8-byte compression and would test nothing but luck)
  private val dim = 16
  private def clustered = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 5))
    (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("trainCodebooks: m codebooks of ksub codes with the right shapes") {
    val cb = Pq.trainCodebooks(clustered, "vec_id", "embedding",
      dim, m = 4, ksub = 8, iters = 2)
    assert(cb.books.length == 4)
    assert(cb.books.forall(_.length == 8))
    assert(cb.books.forall(_.forall(_.length == dim / 4)))
    assert(cb.subDim == 4)
  }

  test("encode compresses to m small ints") {
    val data = clustered
    val cb = Pq.trainCodebooks(data, "vec_id", "embedding", dim, m = 4, ksub = 8)
    val codes = Pq.encode(data, "embedding", cb)
      .select($"codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("pqTopK recall vs brute force is high on clustered data") {
    val data = clustered
    val queries = data.filter($"vec_id" % 40 === 0) // 8 queries, one per cluster
    val cb = Pq.trainCodebooks(data, "vec_id", "embedding", dim, m = 4, ksub = 16)
    val k = 10
    val truth = Similarity.bruteForceTopK(queries, data, "vec_id", "embedding", k)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Pq.pqTopK(data, queries, "vec_id", "embedding", k, cb, refine = 30)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall")
    // re-ranked scores are exact cosines: spot-check one overlapping pair
    val exact = Similarity.bruteForceTopK(queries, data, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = Pq.pqTopK(data, queries, "vec_id", "embedding", k, cb, refine = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = (truth & got).head
    assert(math.abs(exact(shared) - pq(shared)) < 1e-9)
  }

  test("ivfPqTopK: good recall probing a quarter of the cells; exact at full probe") {
    val data = clustered
    val unitized = data // trainCentroids on raw is fine for the recall bar here
    val queries = data.filter($"vec_id" % 40 === 1)
    val cents = Ivf.trainCentroids(unitized, "vec_id", "embedding", nCells = 8, iters = 2)
    val cb = Pq.trainCodebooks(data, "vec_id", "embedding", dim, m = 4, ksub = 16)
    val truth = Similarity.bruteForceTopK(queries, data, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Pq.ivfPqTopK(data, queries, "vec_id", "embedding", 10,
        cents, cb, nProbe = 2, refine = 30)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & pruned).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall $recall") // 2/8 cells probed
    val full = Pq.ivfPqTopK(data, queries, "vec_id", "embedding", 10,
        cents, cb, nProbe = 8, refine = Int.MaxValue)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == truth) // full probe + unbounded shortlist = exact
  }

  test("refine = corpus size degenerates to exact brute force") {
    val data = clustered.limit(60)
    val queries = data.filter($"vec_id" < 2)
    val cb = Pq.trainCodebooks(data, "vec_id", "embedding", dim, m = 4, ksub = 8)
    val got = Pq.pqTopK(data, queries, "vec_id", "embedding", k = 5, cb, refine = 60)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Similarity.bruteForceTopK(queries, data, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth)
  }
}
