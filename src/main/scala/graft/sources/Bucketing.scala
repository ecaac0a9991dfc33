package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Small-file compaction — the file-count governance lever. Streaming
    * micro-batches and fine-grained partitioned writes accrete files far
    * smaller than a scan-efficient parquet target, and at 100 TB the
    * resulting metadata/open-cost dominates reads long before data volume
    * does. One pass: repartition to ⌈rows / targetRecordsPerFile⌉ output
    * shards (with `maxRecordsPerFile` as the hard per-file backstop) and
    * rewrite. The row count is taken from the input (one cheap
    * metadata-friendly job) — pass `knownRows` to skip it when the caller
    * already counted. Returns the number of rows written.
    *
    * If the input carries a sort/cluster layout worth keeping (a
    * [[graft.functions.ZOrder.clusterBy]] key, an ingest-time sort), pass
    * it as `layoutCols`: the rewrite then range-partitions and re-sorts
    * on that key, so per-file min/max stats stay tight and data skipping
    * survives the compaction. The default round-robin shuffle is
    * layout-destroying by construction — fine for unordered corpora,
    * silently widens every file's key span otherwise. */
  def compact(df: DataFrame, outPath: String, targetRecordsPerFile: Long,
      knownRows: Long = -1L, layoutCols: Seq[String] = Nil): Long = {
    require(targetRecordsPerFile >= 1,
      s"targetRecordsPerFile must be >= 1, got $targetRecordsPerFile")
    Sinks.requireNotSourcePath(df, outPath)
    val rows = if (knownRows >= 0) knownRows else df.count()
    val shards = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile)
    require(shards <= Int.MaxValue, "shard count overflows Int")
    val shaped =
      if (layoutCols.isEmpty) df.repartition(shards.toInt)
      else df.repartitionByRange(shards.toInt, layoutCols.map(c => col(c)): _*)
        .sortWithinPartitions(layoutCols.map(c => col(c)): _*)
    shaped.write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(outPath)
    rows
  }
}
