package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed co-location must eliminate BOTH shuffles from a fact-fact
  * equi-join on the bucket key — the pay-once-at-write scale story. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two same-bucketed tables plans without any Exchange") {
    val a = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 800L).map(i => (i % 50, i * 10)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4)
    Bucketing.writeBucketed(b, "bkt_b", "k", 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // concrete plan (no AQE wrapper) and no broadcast escape hatch:
      // the join must survive as a shuffle-free sort-merge join
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "bkt_a")
        .join(Bucketing.table(spark, "bkt_b"), "k")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, s"expected no shuffle, found: $exchanges")
      // and it still computes the right thing
      val expected = a.join(b, "k").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("partitioned layout prunes directories for a partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (1L to 300L).map(i => (i, s"d${i % 3}", i * 1.5)).toDF("id", "day", "v")
    Bucketing.writePartitioned(df, dir, Seq("day"))
    val read = spark.read.parquet(dir).filter($"day" === "d1")
    // the filter must prune at the directory level, not per-row
    val scans = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.relation.location.inputFiles.length >= 3) // all dirs on disk
    val selected = scans.head.selectedPartitions.totalNumberOfFiles
    assert(selected < scans.head.relation.location.inputFiles.length,
      "partition filter did not prune any files")
    assert(read.count() == 100)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("groupBy on the bucket key also skips the shuffle") {
    val a = (1L to 500L).map(i => (i % 20, i)).toDF("k", "v")
    Bucketing.writeBucketed(a, "bkt_g", "k", 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val aggd = Bucketing.table(spark, "bkt_g").groupBy("k").agg(sum($"v"))
      val exchanges = aggd.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty)
      assert(aggd.count() == 20)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_g")
    }
  }

  test("compact: many small files collapse to the target count, rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val smallDir = s"$dir/small"
    val outDir = s"$dir/compacted"
    val df = (1L to 1000L).toDF("id")
    df.repartition(25).write.parquet(smallDir) // the small-file problem
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(smallDir) == 25)
    val read = spark.read.parquet(smallDir)
    val rows = Bucketing.compact(read, outDir, targetRecordsPerFile = 500)
    assert(rows == 1000L)
    assert(parquetFiles(outDir) == 2) // ceil(1000/500)
    assert(spark.read.parquet(outDir).agg(sum($"id")).head().getLong(0)
      == 500L * 1001L)
    intercept[IllegalArgumentException] {
      Bucketing.compact(read, outDir, targetRecordsPerFile = 0)
    }
    // in-place compaction (outPath == input source path) is rejected up
    // front — mode("overwrite") onto the live input would be data loss
    val inPlace = intercept[IllegalArgumentException] {
      Bucketing.compact(read, smallDir, targetRecordsPerFile = 500)
    }
    assert(inPlace.getMessage.contains("in-place"))
    // layout-preserving mode: per-file key ranges stay disjoint, so
    // min/max skipping survives the compaction
    val sortedDir = s"$dir/sorted"
    Bucketing.compact(read, sortedDir, targetRecordsPerFile = 250,
      layoutCols = Seq("id"))
    val ranges = spark.read.parquet(sortedDir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"id").as("lo"), max($"id").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"overlapping file ranges: $a $b")
      case _ =>
    }
  }
}
