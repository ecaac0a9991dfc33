package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OLAP shape helpers: hierarchical rollups, pivoted counts, fixed-width
  * histograms. Thin, deliberately — each is a declarative composition the
  * optimizer already executes well (rollup expands to grouping sets in ONE
  * aggregate; pivot is a single groupBy with conditional aggregates; a
  * histogram is a bucket-expression groupBy). The value is the contract:
  * deterministic output shapes with DuckDB-restatable semantics.
  */
object Olap {

  /** Hierarchical totals over `dims` (rollup: (d1,d2,...), (d1,...), ()),
    * with `grouping_id` disambiguating subtotal levels and NULL dims made
    * explicit so subtotal rows are distinguishable from NULL data values. */
  def rollupAgg(df: DataFrame, dims: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "rollupAgg needs at least one aggregate")
    df.rollup(dims.map(col): _*)
      // grouping_id() is only resolvable INSIDE the grouping-sets
      // aggregate, so it rides the agg list rather than a later projection
      .agg(aggs.head, (aggs.tail :+ grouping_id().cast("bigint").as("gid")): _*)
  }

  /** [[rollupAgg]]'s full-lattice sibling: every dim subset (2^n grouping
    * sets) instead of the prefix hierarchy. */
  def cubeAgg(df: DataFrame, dims: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "cubeAgg needs at least one aggregate")
    df.cube(dims.map(col): _*)
      .agg(aggs.head, (aggs.tail :+ grouping_id().cast("bigint").as("gid")): _*)
  }

  /** Counts pivoted to one column per (small, known) pivot value — the
    * wide-format feature block. `values` must be enumerated: an unlisted
    * value is dropped (and Spark never scans for the domain, which would
    * be an extra pass at 100 TB). */
  def pivotCounts(df: DataFrame, keyCol: String, pivotCol: String,
      values: Seq[String]): DataFrame =
    df.groupBy(col(keyCol)).pivot(pivotCol, values).count()
      .na.fill(0L, values)

  /** Fixed-width histogram of a numeric column: `nBuckets` buckets over
    * [lo, hi), out-of-range rows clamped to the edge buckets (bucket ids
    * stay in [0, nBuckets)). One bucket-expression groupBy; empty buckets
    * are filled in with a literal bucket spine so the output shape is
    * always `nBuckets` rows. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need nBuckets > 0 and hi > lo")
    val w = (hi - lo) / nBuckets
    val bucket = least(greatest(
      floor((col(valueCol) - lo) / w).cast("long"), lit(0L)), lit(nBuckets - 1L))
    // NaN would floor to NaN and non-ANSI-cast to 0L — indistinguishable
    // from a real edge-bucket value — so it is excluded like NULL
    val counts = df.filter(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(0, nBuckets).toDF("bucket")
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (lit(lo) + col("bucket") * w).as("lo"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-group mode of the NON-NULL values, ties to the smallest value —
    * the grouped form of the A11 imputation statistic. One grouped count
    * + one per-group window over the (group, value) count table (bounded
    * by distinct pairs, not data volume). NULLs are excluded up front:
    * NULL ordering in a tiebreak is exactly where engines disagree
    * (Spark sorts NULLS FIRST asc, DuckDB NULLS LAST), so the contract
    * keeps them out of the race. */
  def modePerGroup(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol)).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("n").desc, col(valCol))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(valCol).as("mode"), col("n"))
  }

  /** Unpivot (melt): wide numeric columns to (id, column-name, value) long
    * form — [[pivotCounts]]'s inverse and the standard reshape in front of
    * per-feature profiling ([[graft.analyze.SchemaAnalyzer]]-style stats
    * over ONE value column instead of N). Pure row-local `stack`: each
    * input row emits `cols.length` output rows inside the scan — no
    * shuffle, no UDF, survives any table width the planner can parse. */
  def unpivot(df: DataFrame, idCols: Seq[String], cols: Seq[String],
      nameCol: String = "column", valueCol: String = "value"): DataFrame = {
    require(cols.nonEmpty, "need at least one column to unpivot")
    df.unpivot(idCols.map(col).toArray, cols.map(col).toArray,
      nameCol, valueCol)
  }
}
