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
  *
  * Calibration: sweep totals measured in different weeks are only
  * comparable if the box's effective speed is known at measurement time
  * (the r7→r8 "34% regression" was pure environment drift — a judge A/B
  * on a held-constant box showed the r8 code strictly faster). So the
  * sweep self-calibrates: before timing any query it runs a fixed
  * synthetic CPU+shuffle probe (data-independent: `spark.range` → hash →
  * 1000-key groupBy aggregate → sort) three times and reports the median
  * seconds plus the 1-minute load average in the summary JSON. To compare
  * totals across rounds, divide each by its calibration value first.
  */
object Bench {

  /** Median-of-3 wall time of a fixed probe plan exercising the same
    * machinery the sweep does — codegen'd expressions, one shuffle
    * exchange, partial+final aggregation, a sort — on synthetic input so
    * the number is independent of SF dir and repo code under test. */
  def calibrate(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22)
        .selectExpr("pmod(hash(id), 1000) AS k", "cast(hash(id, 7) AS double) AS v")
        .groupBy("k").agg("v" -> "sum", "v" -> "avg", "v" -> "count")
        .sort("k")
        .selectExpr("sum(hash(k)) AS h").collect()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(once(), once(), once()).sorted.apply(1)
  }

  def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
    // self-calibration AFTER warmup (so it measures the box, not JIT):
    // median-of-3 probe seconds + load average, emitted in the summary.
    val cal = calibrate(spark)
    val load0 = loadAvg()
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
    // calibration fields: probe median at sweep start + a closing probe
    // (drift WITHIN the sweep shows up as start/end disagreement), plus
    // the load averages bracketing the run.
    val calEnd = calibrate(spark)
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$top,"n_queries":${timings.size},"n_failed":${failed.size},"calibration_sec":${sec(cal)},"calibration_end_sec":${sec(calEnd)},"load_avg_start":${sec(load0)},"load_avg_end":${sec(loadAvg())},"sf":"$sfDir"}""")
    spark.stop()
  }
}
