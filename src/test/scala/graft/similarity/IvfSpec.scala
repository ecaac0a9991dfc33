package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters around axis directions
  private def clustered = (
    (0 until 10).map(i => (i.toLong, Array(10.0f + i * 0.1f, 0.0f, 0.0f))) ++
    (10 until 20).map(i => (i.toLong, Array(0.0f, 10.0f + i * 0.1f, 0.0f))) ++
    (20 until 30).map(i => (i.toLong, Array(0.0f, 0.0f, 10.0f + i * 0.1f)))
  ).toDF("vec_id", "embedding")

  test("Lloyd training converges to one centroid per cluster") {
    val cents = Ivf.trainCentroids(clustered, "vec_id", "embedding", nCells = 3, iters = 4)
    // each centroid should be dominated by exactly one axis, all three axes covered
    val domAxes = cents.map(c => c.indexOf(c.max)).toSet
    assert(domAxes == Set(0, 1, 2))
  }

  test("cell assignment groups each cluster together") {
    val cents = Ivf.trainCentroids(clustered, "vec_id", "embedding", nCells = 3, iters = 4)
    val cells = Ivf.withCell(clustered, "embedding", cents)
      .select("vec_id", "__cell").collect().map(r => r.getLong(0) -> r.getInt(1))
    val byCluster = cells.groupBy(_._1 / 10).view.mapValues(_.map(_._2).toSet).toMap
    assert(byCluster.values.forall(_.size == 1))               // pure cells
    assert(byCluster.values.flatten.toSet.size == 3)           // distinct cells
  }

  test("nProbe=1 searches only the home cluster; nProbe=nCells equals brute force") {
    val cents = Ivf.trainCentroids(clustered, "vec_id", "embedding", nCells = 3, iters = 4)
    val queries = clustered.filter(col("vec_id") === 0L)
    val narrow = Ivf.ivfTopK(clustered, queries, "vec_id", "embedding",
        k = 5, cents, nProbe = 1)
      .collect().map(_.getLong(1))
    assert(narrow.forall(_ < 10))  // neighbors only from cluster 0
    val full = Ivf.ivfTopK(clustered, queries, "vec_id", "embedding",
        k = 5, cents, nProbe = 3, roundDigits = 6)
      .orderBy("neighbor_id").collect().map(r => (r.getLong(1), r.getDouble(2)))
    val brute = Similarity.bruteForceTopK(queries, clustered, "vec_id", "embedding",
        k = 5, roundDigits = 6)
      .orderBy("neighbor_id").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(full.toSeq == brute.toSeq)
  }
}
