package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet layout — THE scan-elimination lever at
  * 100 TB: a predicate on the partition column prunes whole directories
  * BEFORE any I/O happens. This is strictly stronger than predicate
  * pushdown (`PushedFilters`, which still opens every footer and decodes
  * row groups whose stats overlap): partition pruning shows up as
  * `PartitionFilters` on the scan node and the unselected directories
  * are never listed into tasks at all. The P5/q6 pushdown queries cover
  * the footer-level path; pp1 + PartitionedSpec pin this one.
  *
  * Layout discipline for a 1000-executor cluster: partition by a LOW-
  * cardinality, query-aligned column (date grain, source, language — the
  * reference's per-table date segments, `convert/` F16, are exactly such
  * keys); high-cardinality keys explode the file count and small-file
  * overhead dominates. Combine with in-file ordering (the zo1 z-order
  * stats) for range pruning inside each partition.
  */
object Partitioned {

  /** Write `df` partitioned by `partCols` (hive layout:
    * `outDir/col=value/part-*.parquet`). */
  def write(df: DataFrame, outDir: String, partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(outDir)
  }

  /** Read a hive-layout directory back; partition columns are
    * reconstructed from the directory names and filters on them prune
    * directories at planning time. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
