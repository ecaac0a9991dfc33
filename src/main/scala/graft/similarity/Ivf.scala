package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.agg.VectorAgg

/** IVF (inverted-file) approximate nearest neighbor — the k-means-quantized
  * scale path beside [[Similarity.lshTopK]]: train a small coarse quantizer
  * (Lloyd iterations as DataFrame jobs), assign every corpus vector to its
  * nearest centroid cell once, then search only the `nProbe` cells nearest
  * each query. `nProbe = nCells` degenerates to exhaustive search (the
  * correctness anchor the oracle checks).
  *
  * Scale design: the quantizer is tiny (nCells ≤ a few hundred) and ships
  * as literal arrays — no shuffle touches it; cell assignment is one
  * codegen'd map pass (native dot per centroid); the probe join is an
  * equi-join on cell id, so a 100 TB corpus is scanned once at build time
  * and each query touches nProbe/nCells of the data.
  */
object Ivf {

  /** Deterministic Lloyd training: init = nCells vectors evenly spaced in
    * id order (consecutive ids often share a cluster, so lowest-k init
    * degenerates); each iteration assigns by nearest centroid and
    * recomputes cell means (map-side-partial vector mean); empty cells
    * keep their centroid. */
  def trainCentroids(data: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 3): Array[Array[Double]] = {
    val n = data.count()
    val step = math.max(1L, n / nCells)
    val withId = graft.graph.RelGraph.withRowId(
      data.select(col(idCol), col(vecCol)), Seq(idCol))
    var cents: Array[Array[Double]] = withId
      .filter(col(graft.graph.RelGraph.RowId) % step === 0)
      .orderBy(col(graft.graph.RelGraph.RowId)).limit(nCells)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    (1 to iters).foreach { _ =>
      val assigned = withCell(data, vecCol, cents)
      val means = assigned.groupBy(col("__cell"))
        .agg(VectorAgg.vecMean(col(vecCol).cast("array<double>")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
    }
    cents
  }

  /** Nearest-centroid cell id per row (0-based): argmin over squared
    * distance, which for fixed |v| is argmin of |c|² − 2·v·c — one native
    * dot per centroid, no intermediate arrays. */
  private def cellExpr(vecCol: Column, cents: Array[Array[Double]]): Column = {
    val scores = cents.map { c =>
      val normSq = c.map(x => x * x).sum
      lit(normSq) - lit(2.0) * Similarity.dot(vecCol, Similarity.litVec(c))
    }
    val arr = array(scores: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  def withCell(data: DataFrame, vecCol: String, cents: Array[Array[Double]]): DataFrame =
    data.withColumn("__cell", cellExpr(col(vecCol), cents))

  /** The `nProbe` nearest centroid cell ids for a query vector, as an
    * array expression — (score, cellId) structs sorted lexicographically,
    * so ties break by cell id and probe cells are distinct by
    * construction. Shared by [[ivfTopK]] and [[Pq.ivfPqTopK]] so the two
    * probe paths can never drift. */
  private[similarity] def probeCellsExpr(qv: Column,
      cents: Array[Array[Double]], nProbe: Int): Column = {
    val probeScores = cents.map { c =>
      val normSq = c.map(x => x * x).sum
      lit(normSq) - lit(2.0) * Similarity.dot(qv, Similarity.litVec(c))
    }
    val scoreStructs = array(probeScores.zipWithIndex.map { case (s, i) =>
      struct(s.as("s"), lit(i).as("i"))
    }: _*)
    slice(transform(sort_array(scoreStructs), x => x.getField("i")), 1, nProbe)
  }

  /** Top-k cosine neighbors searching only each query's `nProbe` nearest
    * cells. Ties broken by neighbor id; `roundDigits` as in
    * [[Similarity.bruteForceTopK]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, cents: Array[Array[Double]], nProbe: Int,
      roundDigits: Int = -1): DataFrame = {
    val nCells = cents.length
    require(nProbe >= 1 && nProbe <= nCells)
    val corpusCells = withCell(corpus, vecCol, cents)
      .select(col("__cell"), col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__probe",
        explode(probeCellsExpr(col("__qv"), cents, nProbe)))
    val rawCos = Similarity.cosine(col("__qv"), col("__cv"))
    val scored = broadcast(probes).join(corpusCells, col("__probe") === col("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", if (roundDigits >= 0) round(rawCos, roundDigits) else rawCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }
}
