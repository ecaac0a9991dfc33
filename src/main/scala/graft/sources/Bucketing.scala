package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the shuffle-elimination story for repeated
  * big-big joins at 100 TB. Two tables written with the SAME bucket key
  * and count pre-partition (and pre-sort) their files per bucket, so a
  * join between them plans WITHOUT an Exchange on either side — the
  * dominant cost of a large fact-fact join disappears for every downstream
  * query that joins or aggregates on the bucket key (pay the shuffle once
  * at write time, reuse it forever). BucketingSpec asserts the no-Exchange
  * plan. Broadcast covers small-dim joins; bucketing covers the fact-fact
  * joins Catalyst would otherwise shuffle every run.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * `nBuckets` should match the downstream join partner's bucket count
    * (Spark only elides both shuffles on equal counts). */
  def writeBucketed(df: DataFrame, tableName: String, keyCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(tableName)

  /** Read a bucketed table back (bucket metadata rides the catalog entry,
    * not the files — reads must go through the table, not the path). */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Directory-partitioned parquet write: the OTHER pay-once layout lever.
    * Bucketing kills the join shuffle; partitioning by a coarse,
    * low-cardinality column (ingest date, source) kills the SCAN — a
    * filtered read prunes whole directories before touching a row
    * (`PartitionFilters` in the plan; BucketingSpec asserts the pruned
    * file count). Keep partition columns coarse: one directory per value
    * per write, and a 100 TB corpus wants thousands of partitions, not
    * millions of tiny files. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
