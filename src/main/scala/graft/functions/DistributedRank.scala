package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global `row_number() OVER (ORDER BY …)` semantics WITHOUT the
  * single-partition funnel of an unpartitioned window (`WindowExec: No
  * Partition Defined` collapses the whole input onto one task — fatal on
  * an unbounded vocabulary or dictionary at 100 TB scale).
  *
  * Device (same as the W1 row-id contract in
  * [[graft.graph.RelGraph.withRowId]]): `orderBy` gives a range-partitioned
  * total order, then RDD `zipWithIndex` assigns contiguous ranks fully
  * distributed — one extra count job for partition offsets, no funnel.
  * Results are identical to the window form whenever `order` is a total
  * order (unique per row), which every caller here guarantees.
  *
  * When only the top `k` ranks are kept downstream, [[topK]] first pre-cuts
  * each partition to its local top `k` with a PARTITIONED window (any
  * global top-k row is a fortiori in its partition's top-k), so the global
  * sort ranks at most `partitions × k` rows however large the input.
  */
object DistributedRank {

  /** Rows above this are refused by [[withRank]] unless the caller raises
    * `maxRows` deliberately: the rank itself stays distributed at any
    * size, but every ranked row pays the off-codegen RDD `Row` round-trip
    * and a checkpoint block — a frame big enough to need real scale
    * should go through [[topK]]'s pre-cut (when a rank cut follows) or
    * accept the cost explicitly. */
  val DefaultMaxRankRows: Long = 100000000L

  /** Append `rankCol` = 1-based global rank of `df` rows under the total
    * order `order`.
    *
    * Contract and tradeoffs — read before adding a call site:
    *  - EAGER: the sorted frame is `localCheckpoint(true)`ed, so merely
    *    CONSTRUCTING (or explaining) the returned frame runs the upstream
    *    plan as Spark jobs. Without the checkpoint the upstream aggregate
    *    + sort would recompute for `zipWithIndex`'s offset job, its map
    *    job, AND every downstream action — but the side effect is real:
    *    don't build this frame speculatively.
    *  - NOT fault-tolerant: `localCheckpoint` blocks live on executors;
    *    losing one after the checkpoint invalidates the blocks and fails
    *    every downstream action (no lineage to recompute from). Fine in
    *    single-JVM/local mode and for short-lived bounded frames; a
    *    long-lived cluster pipeline that cannot tolerate a restart should
    *    swap in `persist(DISK_ONLY)+count` or a reliable `checkpoint`.
    *  - BOUNDED: refuses frames above `maxRows` (cheap — the count reads
    *    the just-materialized checkpoint blocks). Callers that only keep
    *    the top k must use [[topK]], whose pre-cut bounds this input at
    *    `partitions × k`; callers ranking a genuinely huge frame must
    *    raise `maxRows` at the call site, where a reviewer can see it. */
  def withRank(df: DataFrame, order: Seq[Column], rankCol: String,
      maxRows: Long = DefaultMaxRankRows): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*).localCheckpoint(true)
    val n = sorted.count()
    require(n <= maxRows,
      s"withRank input has $n rows > maxRows=$maxRows: every ranked row " +
        "pays the off-codegen RDD round-trip — pre-cut with topK (if a " +
        "rank cut follows) or raise maxRows explicitly at the call site")
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(ranked, sorted.schema.add(rankCol, LongType, nullable = false))
  }

  /** The top `k` rows of `df` under `order`, with `rankCol` = 1-based global
    * rank. Local pre-cut first: the partitioned window bounds the global
    * sort's input at `partitions × k` rows. */
  def topK(df: DataFrame, order: Seq[Column], rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val localW = Window.partitionBy(spark_partition_id()).orderBy(order: _*)
    val pre = df.withColumn("__lr", row_number().over(localW))
      .filter(col("__lr") <= k).drop("__lr")
    withRank(pre, order, rankCol).filter(col(rankCol) <= k)
  }
}
