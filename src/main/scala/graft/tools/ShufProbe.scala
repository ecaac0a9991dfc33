package graft.tools
import org.apache.spark.sql.SparkSession

/** Deterministic plan-cost probe: `runMain graft.tools.ShufProbe <query>...`
  * prints each query's shuffle-read/write and spill BYTES (via the Bench
  * task listener) beside its wall time. Bytes are a property of the plan +
  * data, not the measurement window — on a box whose wall-clock noise is
  * ±50% (BENCH_NOTES round 10), byte deltas are the trustworthy way to
  * A/B a shuffle-shape change. */
object ShufProbe {

  /** Probe-only variants of registered queries (alternate knob settings
    * worth A/B-ing without adding registry entries — the registry stays
    * the oracle-checked configuration). */
  private val devVariants: Map[String,
      (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "dev_dupspan1_hashed" -> ((s, dir) =>
      graft.dedup.Dedup.repeatedSpanStats(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        n = 8, hashGrams = true)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val io = new graft.Bench.TaskIoListener
    spark.sparkContext.addSparkListener(io)
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    for (n <- args) {
      val s0 = io.snapshot()
      val t0 = System.nanoTime()
      val fn = graft.SparkEntry.queries.get(n).orElse(devVariants.get(n))
        .getOrElse(sys.error(s"unknown query '$n'; dev variants: " +
          s"${devVariants.keys.mkString(", ")}; registered: " +
          s"${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val c = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // listener bus drain
      val s1 = io.snapshot()
      println(f"[shuf] $n rows=$c $sec%.1f s " +
        f"read=${(s1.shufRead - s0.shufRead) / 1e6}%.1f MB " +
        f"write=${(s1.shufWrite - s0.shufWrite) / 1e6}%.1f MB " +
        f"spill=${(s1.memSpill - s0.memSpill + s1.diskSpill - s0.diskSpill) / 1e6}%.1f MB")
      spark.catalog.clearCache()
      // same inter-query isolation as Bench.runOne: the result frame's
      // checkpoint blocks must not distort the next probe
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
