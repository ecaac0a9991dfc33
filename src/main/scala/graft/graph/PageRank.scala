package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the second classic iterative graph
  * algorithm beside [[graft.dedup.Dedup.connectedComponents]], in the same
  * Spark shape: per iteration one join + one partial-aggregating groupBy
  * (shuffling only (id, contribution)), eager localCheckpoint per round to
  * keep lineage flat. Dangling-node mass (vertices with no out-edges) is
  * redistributed uniformly each round, so total rank stays 1 and the
  * result is a proper distribution.
  *
  * The out-degree table is computed once and checkpointed; the per-round
  * dangling-mass term is a scalar aggregate collected to the driver (one
  * tiny job per iteration — the same bounded-driver-state class as Lloyd
  * centroids, not a data-sized collect).
  */
object PageRank {

  /** @param vertices one row per vertex id
    * @param edges    directed (src, dst); parallel edges count once each.
    *                 PRECONDITION: every src and dst must appear in
    *                 `vertices` — contributions to an unknown dst are
    *                 dropped by the final left join and an unknown src
    *                 never contributes, so rank mass would silently leak
    *                 and the ranks-sum-to-1 contract break. Pass
    *                 `validate = true` to assert this (one extra anti-join
    *                 count up front).
    * @param validate when true, fail fast if any edge endpoint is missing
    *                 from `vertices` instead of leaking mass
    * @return (id, rank), ranks summing to 1 */
  def run(vertices: DataFrame, idCol: String, edges: DataFrame,
      iters: Int = 10, damping: Double = 0.85,
      validate: Boolean = false): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(damping > 0 && damping < 1, s"damping $damping must be in (0,1)")
    if (validate) {
      val vs = vertices.select(col(idCol).as("id"))
      val orphans = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id")))
        .join(vs, Seq("id"), "left_anti").limit(1).count()
      require(orphans == 0,
        "edges reference ids absent from vertices — rank mass would leak")
    }
    val n = vertices.count().toDouble
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val e = edges.join(outDeg, "src")
      .select(col("src"), col("dst"), col("__deg")).localCheckpoint(true)
    val ids = vertices.select(col(idCol).as("id")).localCheckpoint(true)
    val hasOut = outDeg.select(col("src").as("id")).localCheckpoint(true)
    var ranks = ids.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val dangling = ranks.join(hasOut, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).collect()(0).getDouble(0)
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      val next = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("__s"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint(true)
      // next is materialized — the superseded generation's blocks go now,
      // not at the ContextCleaner's leisure (see graft.util.Checkpoints)
      graft.util.Checkpoints.release(ranks)
      ranks = next
    }
    // the returned frame is its own checkpoint; the loop-static inputs are
    // dead weight once the last iteration has run
    Seq(e, ids, hasOut).foreach(graft.util.Checkpoints.release)
    ranks
  }

  /** Weighted PageRank: each edge carries a weight and a vertex's rank
    * splits across its out-edges PROPORTIONALLY (`w / Σw_src`) instead of
    * uniformly — link strength, click counts, transaction volume. Same
    * plan shape as [[run]]: the per-src weight sums are one aggregate
    * computed once and joined into the checkpointed edge list, so each
    * iteration still costs one join + one partial-aggregating groupBy.
    * Zero-total-weight sources are rejected up front (their rank could
    * neither flow nor count as dangling without silently leaking mass).
    * Dangling vertices (no out-edges at all) redistribute uniformly as in
    * [[run]]. With all weights equal this reduces to [[run]] numerically
    * (same mathematics; bit-identical only when the uniform fractions are
    * exactly representable — degree 3 makes `rank·(w/3w)` differ from
    * run()'s `rank/3` by an ulp, two roundings vs one).
    *
    * PRECONDITION (as in [[run]]): every src and dst must appear in
    * `vertices`, or rank mass silently leaks; pass `validate = true` to
    * assert it.
    *
    * @param edges (src, dst, weightCol), weights > 0 */
  def runWeighted(vertices: DataFrame, idCol: String, edges: DataFrame,
      weightCol: String, iters: Int = 10, damping: Double = 0.85,
      validate: Boolean = false): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(damping > 0 && damping < 1, s"damping $damping must be in (0,1)")
    if (validate) {
      val vs = vertices.select(col(idCol).as("id"))
      val orphans = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id")))
        .join(vs, Seq("id"), "left_anti").limit(1).count()
      require(orphans == 0,
        "edges reference ids absent from vertices — rank mass would leak")
    }
    val n = vertices.count().toDouble
    val w = col(weightCol).cast("double")
    val badW = edges.filter(w.isNull || w <= 0).limit(1).count()
    require(badW == 0, "edge weights must be positive and non-NULL")
    val outW = edges.groupBy(col("src")).agg(sum(w).as("__wsum"))
    val e = edges.join(outW, "src")
      .select(col("src"), col("dst"), (w / col("__wsum")).as("__frac"))
      .localCheckpoint(true)
    val ids = vertices.select(col(idCol).as("id")).localCheckpoint(true)
    val hasOut = outW.select(col("src").as("id")).localCheckpoint(true)
    var ranks = ids.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val dangling = ranks.join(hasOut, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).collect()(0).getDouble(0)
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("rank") * col("__frac")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      val next = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("__s"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint(true)
      graft.util.Checkpoints.release(ranks)
      ranks = next
    }
    Seq(e, ids, hasOut).foreach(graft.util.Checkpoints.release)
    ranks
  }
}
