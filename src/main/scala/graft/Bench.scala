package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total",...,"queries":{...}}.
  *
  * Hygiene: the cache is cleared between queries (several operators persist
  * intermediates — row-id'd graph nodes, per-edge-type counts — and letting
  * them accumulate across a 55-query sweep distorts the later timings), and
  * a failing query is recorded in a separate "failed" map rather than as a
  * fake fast timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first query in a fresh JVM otherwise absorbs
    // ~5 s of classloading/codegen/parquet-footer setup (measured: d7 at
    // 6.2 s cold vs 0.6 s warm with an identical plan) — charge that to
    // the session, not to whichever query happens to run first.
    try {
      spark.range(1 << 20).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      spark.catalog.clearCache()
      // clearCache does not touch localCheckpoint blocks (dedup pipelines,
      // connected components); those are freed by the ContextCleaner only
      // after the referencing DataFrames are garbage collected. Nudge the
      // collector so block-manager memory from one query can't distort the
      // next — the r4 driver sweep showed one query inflating 10x+ under
      // accumulated block pressure that a fresh JVM didn't reproduce.
      System.gc()
    }
    import JsonEscape.q
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma-decimal locale would emit {"value":12,345} — invalid JSON.
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = timings.map { case (k, v) => q(k) + ":" + sec(v) }.mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => q(k) + ":" + q(v) }.mkString("{", ",", "}")
    val total = timings.values.sum
    // Two lines: the per-query detail first, then the canonical summary line
    // LAST. The harness that collects this output keeps only a bounded tail
    // of it; a single line carrying every per-query timing outgrows that
    // window and arrives head-truncated (unparseable). The summary line is
    // sized to always fit the window, and carries the slowest queries (the
    // ones worth chasing round-over-round) plus the total.
    println(s"""{"metric":"per_query","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    val top = timings.toSeq.sortBy(-_._2).take(15)
      .map { case (k, v) => q(k) + ":" + sec(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$top,"n_queries":${timings.size},"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
