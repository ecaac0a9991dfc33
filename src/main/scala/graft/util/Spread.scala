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
  * moment the input already carries ≥ defaultParallelism partitions,
  * which any production-sized table does — only a narrow local input
  * pays the (tiny) spreading shuffle. `defaultParallelism` tracks the
  * master's core count, so the driver's lower-core bench run spreads to
  * ITS parallelism, not a constant tuned for one box. Same device as
  * [[graft.analyze.Bootstrap.replicateMeans]]'s narrow-input spread
  * (round 14's bs2 fix), promoted to a shared utility.
  *
  * Round-robin `repartition(n)` (not a keyed one) keeps the spread
  * skew-free regardless of key distribution; every caller feeds the
  * result into key-based aggregates/joins, so results are
  * partitioning-independent.
  */
object Spread {

  /** `df` with at least `defaultParallelism` partitions (identity when
    * the input is already that wide). */
  def wide(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
