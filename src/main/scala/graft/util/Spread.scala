package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism floor for expensive map-side pipelines over narrow scans.
  *
  * A small parquet input (one file, one row group — every local-mode SF
  * dir here) scans as ONE partition, so everything between the scan and
  * the first exchange — shingling, per-token md5 ladders, positional
  * n-gram explodes, pair generation — runs on one core while the rest of
  * the cluster idles. Spreading the (cheap, pre-explode/pre-expand) rows
  * costs one exchange of the raw rows and parallelizes the expensive
  * compute that follows.
  *
  * Scale-adaptive by construction (guide §2): the branch is a no-op the
  * moment the input's estimated size reaches what a production scan would
  * split into ≥ defaultParallelism partitions — only a narrow local input
  * pays the (tiny) spreading shuffle. `defaultParallelism` tracks the
  * master's core count, so the driver's lower-core bench run spreads to
  * ITS parallelism, not a constant tuned for one box. Same device as
  * [[graft.analyze.Bootstrap.replicateMeans]]'s narrow-input spread
  * (round 14's bs2 fix), promoted to a shared utility.
  *
  * Width check (r15): the trigger reads the optimized logical plan's size
  * estimate (`stats.sizeInBytes` — file-footer bytes for the scan leaves,
  * already cached by the FileIndex) against `defaultParallelism ×
  * spark.sql.files.maxPartitionBytes`, the scan splitter's own geometry.
  * The r14 form read `df.rdd.getNumPartitions`, which spun up a second
  * QueryExecution per call just to read a partition count — and, worse,
  * under AQE `Dataset.rdd` MATERIALIZES any upstream query stages
  * (AdaptiveSparkPlanExec.doExecute finalizes the plan), so a call site
  * above an exchange would have eagerly executed that shuffle once for
  * the probe and again for the query. Every current call site sits
  * directly on a scan projection, where the two rules agree at every
  * bench SF (single-file inputs ≪ par × 128 MB spread; a production-sized
  * table is ≥ par × maxPartitionBytes and skips); the stats rule just
  * cannot be tricked into running jobs. Estimate error is benign in both
  * directions: an underestimate adds one cheap exchange of pre-explode
  * rows, an overestimate leaves a narrow input unspread — never wrong
  * results (callers feed key-based aggregates/joins, partitioning-
  * independent by construction).
  *
  * Round-robin `repartition(n)` (not a keyed one) keeps the spread
  * skew-free regardless of key distribution.
  */
object Spread {

  /** `df` repartitioned to `defaultParallelism` when its optimizer size
    * estimate says the scan would yield fewer partitions than that
    * (identity for production-sized inputs). */
  def wide(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(par) * maxPartitionBytes) df.repartition(par) else df
  }
}
