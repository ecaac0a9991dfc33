package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column quantiles in long form `(col, p, q)` — the distribution profile
  * a feature-engineering pipeline reads before scaling/clipping.
  *
  * Mirrors the engine's exact/approx duality for distinct counts
  * ([[DistinctCounter]]): [[exact]] is the oracle-parity path (linear
  * interpolation over the fully sorted column — Spark's `percentile`
  * aggregate buffers the column per partition, fine at test SF, memory-bound
  * at 100 TB); [[approx]] is the scale path (Greenwald-Khanna sketch via
  * `percentile_approx`: O(1/ε) state, partial-aggregating, one pass —
  * what a 1000-executor profile job should run).
  */
object Quantiles {

  /** `col(name)` parses dots/backticks as structure; quote the raw name so
    * any physical column name (backticks included) resolves literally. */
  private def rawCol(c: String) = col("`" + c.replace("`", "``") + "`")

  private def validate(cols: Seq[String], ps: Seq[Double]): Unit = {
    require(cols.nonEmpty, "need at least one column")
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentiles must be in [0,1]: $ps")
  }

  /** Exact interpolated quantiles: one aggregation job computes every
    * column's percentile array; the long-form unpivot is a driver-side plan
    * construction (per-column selects over the 1-row aggregate, unioned) —
    * no per-column pass over the data. */
  def exact(df: DataFrame, cols: Seq[String], ps: Seq[Double]): DataFrame = {
    validate(cols, ps)
    // Column-based aggregate (not an expr string): immune to identifier
    // quoting in column names and to Double→string literal round-trips.
    unpivot(df.agg(
      percentile(rawCol(cols.head), lit(ps.toArray)).as(cols.head),
      cols.tail.map(c => percentile(rawCol(c), lit(ps.toArray)).as(c)): _*), cols, ps)
  }

  /** Approximate quantiles (GK sketch), same output shape. `accuracy` is
    * Spark's 1/ε knob (10000 ≈ 0.01% rank error). */
  def approx(df: DataFrame, cols: Seq[String], ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    validate(cols, ps)
    unpivot(df.agg(
      percentile_approx(rawCol(cols.head), lit(ps.toArray), lit(accuracy)).as(cols.head),
      cols.tail.map(c =>
        percentile_approx(rawCol(c), lit(ps.toArray), lit(accuracy)).as(c)): _*),
      cols, ps)
  }

  /** Equal-frequency (quantile) binning: rows bucket by comparison against
    * the k−1 interior percentile boundaries, reported as
    * `(bin, n, lo, hi)`. Boundaries are rounded to 4 decimals BEFORE
    * comparing — the cross-engine-stable form (raw interpolated doubles
    * can differ in the last ulp between implementations; a 4-decimal
    * boundary is exactly representable on both sides of an oracle check).
    * The boundary collect is k−1 doubles of driver state (same bounded
    * class as Lloyd centroids); binning itself is one codegen'd filter-HOF
    * over a literal array — a scan, then a k-group aggregate. NULL values
    * are excluded (they order nowhere). */
  def equalFrequencyBins(df: DataFrame, c: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 bins, got $k")
    val ps = (1 until k).map(_.toDouble / k)
    val raw = df.filter(rawCol(c).isNotNull)
    val qrow = raw.agg(percentile(rawCol(c), lit(ps.toArray)).as("q")).collect()(0)
    require(!qrow.isNullAt(0),
      s"equalFrequencyBins: column `$c` has no non-NULL values to bin")
    val qs = qrow.getSeq[Double](0)
    val bounds = qs.map(b =>
      BigDecimal(b).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val arr = array(bounds.map(lit): _*)
    raw
      .withColumn("bin",
        (size(filter(arr, x => rawCol(c) > x)) + 1).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(rawCol(c)), 2).as("lo"), round(max(rawCol(c)), 2).as("hi"))
  }

  /** Winsorization: clamp `c` to its [pLo, pHi] interpolated percentiles —
    * the outlier-taming step before scaling/normalizing features. Two
    * phases: ONE percentile aggregation (bounded sorted-buffer state; swap
    * in `percentile_approx` at 100 TB), boundaries rounded to 4 decimals
    * (the [[equalFrequencyBins]] cross-engine-stability device), then one
    * codegen clamp scan — no shuffle beyond the scalar agg. Output adds
    * `<c>_w` (clamped value) plus constant `lo_bound`/`hi_bound` columns
    * so downstream consumers (and oracles) see the boundaries used. */
  def winsorize(df: DataFrame, c: String, pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pLo < pHi && pHi <= 1,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val qrow = df.agg(percentile(rawCol(c), lit(Array(pLo, pHi))).as("q")).head()
    require(!qrow.isNullAt(0), s"winsorize: column `$c` has no non-NULL values")
    val bounds = qrow.getSeq[Double](0).map(b =>
      BigDecimal(b).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val (l, h) = (bounds(0), bounds(1))
    df.withColumn(c + "_w", least(greatest(rawCol(c), lit(l)), lit(h)))
      .withColumn("lo_bound", lit(l))
      .withColumn("hi_bound", lit(h))
  }

  /** Population Stability Index between a reference and a current sample
    * of the same column — THE drift monitor a production feature pipeline
    * runs per release. Bin boundaries are the reference sample's `k`
    * equal-frequency percentiles (rounded to 4 decimals, the
    * [[equalFrequencyBins]] cross-engine device); both populations are
    * bucketed with one codegen filter-HOF scan each, and every PSI term
    * `(p−q)·ln(p/q)` is a ratio of exact integer counts — deterministic
    * on any engine. Long form: one row per bin with both counts and the
    * term (sum the column for the headline PSI; ≥0.2 conventionally
    * means action). Laplace-smoothed (+1 per bin) so empty bins don't
    * produce infinities. */
  def psiDrift(ref: DataFrame, cur: DataFrame, c: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 bins, got $k")
    val ps = (1 until k).map(_.toDouble / k)
    val refRaw = ref.filter(rawCol(c).isNotNull)
    val qrow = refRaw.agg(percentile(rawCol(c), lit(ps.toArray)).as("q")).head()
    require(!qrow.isNullAt(0), s"psiDrift: reference `$c` has no non-NULL values")
    val bounds = qrow.getSeq[Double](0).map(b =>
      BigDecimal(b).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val arr = array(bounds.map(lit): _*)
    def binned(df: DataFrame, out: String) = df
      .filter(rawCol(c).isNotNull)
      .groupBy((size(filter(arr, x => rawCol(c) > x)) + 1).cast("int").as("bin"))
      .agg(count(lit(1)).as(out))
    // left side is a literal bin spine so bins empty in BOTH samples still
    // report (smoothed) — the report shape never depends on the data
    import ref.sparkSession.implicits._
    val base = (1 to k).toDF("bin")
    val joined = base
      .join(binned(refRaw, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    // smoothed totals ride as a broadcast 1-ROW aggregate (the t6/tc2
    // device) instead of an unpartitioned window over the bin table —
    // same values, no single-task WindowExec in any plan
    val tots = joined.agg(sum(col("n_ref") + 1).as("__tr"),
      sum(col("n_cur") + 1).as("__tc"))
    joined.crossJoin(broadcast(tots))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        (((col("n_ref") + 1) / col("__tr")) - ((col("n_cur") + 1) / col("__tc"))).as("__d"),
        log(((col("n_ref") + 1) / col("__tr")) / ((col("n_cur") + 1) / col("__tc"))).as("__l"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("__d") * col("__l"), 6).as("psi_term"))
  }

  /** Exact interpolated quantiles PER GROUP, long form
    * `(group, p, q)` — the distribution profile stratified by a dimension
    * (e.g. document length per language). One grouped aggregation; the
    * per-group percentile state is the same sorted-buffer contract as
    * [[exact]] (use approx at 100 TB scale). Output `q` rounds to 4
    * decimals (interpolated values are ratio-of-sums doubles). */
  def groupedExact(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    validate(Seq(valueCol), ps)
    val psArr = array(ps.map(lit): _*)
    df.groupBy(rawCol(groupCol))
      .agg(percentile(rawCol(valueCol), lit(ps.toArray)).as("__q"))
      .select(rawCol(groupCol), posexplode(col("__q")).as(Seq("__i", "q")))
      .select(rawCol(groupCol), element_at(psArr, col("__i") + 1).as("p"),
        round(col("q").cast("double"), 4).as("q"))
  }

  /** Robust per-group outlier profile — median/MAD anomaly detection (the
    * standard robust z-score: mean/stddev move with the outliers they're
    * meant to catch; median and median-absolute-deviation don't). A value
    * is anomalous when `|x − median| > k · 1.4826 · MAD` (1.4826 scales
    * MAD to σ under normality). Two grouped exact-percentile passes
    * (median, then median of deviations — the [[groupedExact]] sorted-
    * buffer contract; swap in [[approx]] percentiles at 100 TB) with the
    * tiny per-group medians broadcast back between them; medians round to
    * 4 decimals BEFORE use (the [[winsorize]] boundary device), so both
    * engines compare against bit-identical thresholds and flag identical
    * rows.
    *
    * @return per group: (group, n, n_outliers, median, mad) */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val g = rawCol(groupCol); val v = rawCol(valueCol).cast("double")
    val med = df.groupBy(g)
      .agg(round(percentile(v, lit(0.5)), 4).as("__med"))
    val dev = df.join(broadcast(med), groupCol)
      .select(g, v.as("__v"), col("__med"),
        abs(v - col("__med")).as("__dev"))
    val mad = dev.groupBy(g)
      .agg(round(percentile(col("__dev"), lit(0.5)), 4).as("__mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(g)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__dev") > lit(k) * lit(1.4826) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        first(col("__med")).as("median"),
        first(col("__mad")).as("mad"))
  }

  private def unpivot(aggd: DataFrame, cols: Seq[String], ps: Seq[Double]): DataFrame = {
    val psArr = array(ps.map(lit): _*)
    cols.map { c =>
      aggd.select(lit(c).as("col"), posexplode(rawCol(c)).as(Seq("__i", "q")))
        .select(col("col"), element_at(psArr, col("__i") + 1).as("p"),
          col("q").cast("double").as("q"))
    }.reduce(_ unionAll _)
  }
}
