package graft.tools
import org.apache.spark.sql.SparkSession
/** Fresh-JVM per-query timer: `runMain graft.tools.TimeQ <query>...` —
  * isolates a query's cost from the 55-query sweep's heap/GC pressure. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // scale audits can shrink per-task aggregate hash maps by running
    // MORE, smaller shuffle partitions than concurrent tasks (the kc1
    // 30x execution-memory floor is partition-count-sensitive)
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup + the Bench calibration probe: a TimeQ number is only
    // comparable across runs/rounds relative to the probe (BENCH_NOTES
    // records both) — the box's effective speed drifts 2-3x between
    // measurement windows (judge A/B, round 8)
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val cal = graft.Bench.calibrate(spark)
    println(f"[cal] probe=$cal%.2f s load=${graft.Bench.loadAvg()}%.2f cpus=$cpus")
    for (n <- args) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[time] $n rows=$c ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
