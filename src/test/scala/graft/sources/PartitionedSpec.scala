package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write prunes directories at planning time, not just footers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toFile
    try {
      val df = Seq((1L, 1995, 10.0), (2L, 1995, 20.0), (3L, 1996, 30.0),
        (4L, 1997, 40.0)).toDF("id", "yr", "v").repartition(1)
      Partitioned.write(df, dir.getPath, Seq("yr"))
      // hive layout on disk: one directory per year (one file each after
      // the repartition(1))
      val parts = dir.listFiles().map(_.getName).filter(_.startsWith("yr="))
      assert(parts.toSet == Set("yr=1995", "yr=1996", "yr=1997"))
      val back = Partitioned.read(spark, dir.getPath).filter(col("yr") === 1995)
      // correctness: only 1995 rows, partition column reconstructed —
      // collected through back's OWN query execution so the scan metrics
      // below belong to this exact run
      val rows = back.collect()
      // the partition column moves to the END of the reconstructed schema
      assert(rows.map(_.getAs[Double]("v")).sum == 30.0)
      // the filter must land in PartitionFilters (directory pruning),
      // and the EXECUTED scan must have read exactly ONE of the 3 files
      val scan = back.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in the plan"))
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "yr")),
        s"yr filter missing from PartitionFilters: ${scan.partitionFilters}")
      assert(scan.relation.location.inputFiles.length == 3,
        "fixture should have one file per partition")
      assert(scan.metrics("numFiles").value == 1,
        s"pruned scan must read 1 of 3 files, read ${scan.metrics("numFiles").value}")
      // a non-partition predicate does NOT prune directories
      val unpruned = Partitioned.read(spark, dir.getPath).filter(col("v") > 15.0)
      val scan2 = unpruned.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get
      assert(scan2.partitionFilters.isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
