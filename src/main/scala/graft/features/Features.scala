package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key ordered feature engineering for training-data pipelines:
  * lag/rolling-window features over an event sequence, and typed field
  * extraction from semi-structured payload columns. All window functions
  * over ONE (key, order) sort — a single shuffle regardless of how many
  * features are derived; JSON extraction is a codegen'd expression
  * (`get_json_object`), no UDFs.
  */
object Features {

  /** Rolling features per key, ordered by (ts, tie): previous value, mean
    * over the trailing `k` rows (current inclusive), and the 1-based
    * sequence number. One window sort serves all three. `tie` makes the
    * order total when ts alone can collide (pass the row's unique id). */
  def rolling(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tie: String, k: Int = 3): DataFrame = {
    require(k >= 1, "rolling window must cover at least the current row")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tie))
    df.withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn(s"avg$k",
        avg(col(valueCol)).over(w.rowsBetween(-(k - 1), Window.currentRow)))
      .withColumn("seq", row_number().over(w).cast("long"))
  }

  /** Typed scalar extracted from a JSON payload column (codegen'd path
    * expression; `dataType` e.g. "int", "double", "string"). */
  def jsonField(c: Column, path: String, dataType: String): Column =
    get_json_object(c, path).cast(dataType)

  /** Finite-window exponentially weighted moving average per key — the
    * recency-weighted sibling of [[rolling]]'s flat mean (the standard
    * smoothing feature for event streams): over the last `k` rows in
    * (ts, tie) order, `ewma = Σ wᵢ·x_{t-i} / Σ wᵢ` with `wᵢ = (1−α)^i`,
    * weights renormalized over however many rows actually precede the
    * current one (a key's first row is its own EWMA). Expressed as a
    * fixed chain of `lag` columns over ONE window sort — single shuffle,
    * pure codegen arithmetic, no per-row state — so it scales like any
    * other window feature and is restatable verbatim in SQL.
    *
    * α is constrained to 0.5 (weights 1, 1/2, 1/4, … — exact binary
    * fractions) when cross-engine bit-parity matters; any α in (0,1)
    * works numerically. */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tie: String, k: Int, alpha: Double = 0.5): DataFrame = {
    require(k >= 1, s"window must cover at least the current row, got $k")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tie))
    val x = col(valueCol).cast("double")
    // i ascending, left-assoc sums: the op order the SQL restatement pins
    val terms = (0 until k).map { i =>
      val wi = math.pow(1.0 - alpha, i.toDouble)
      val xi = if (i == 0) x else lag(x, i).over(w)
      (coalesce(xi * wi, lit(0.0)), when(xi.isNotNull, wi).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    // all of the window NULL (including the current value) ⇒ no weight at
    // all: emit an explicit NULL rather than the 0/0 NaN the raw division
    // would produce — NULL-in, NULL-out, stated, never a silent NaN
    df.withColumn("ewma", when(den > 0, num / den))
  }

  /** Calendar-spine gap filling — the densification step before any
    * rolling/EWMA feature is trustworthy (a silent missing hour reads as
    * "no activity" only if a zero row exists to say so): aggregate to
    * fixed time buckets per key, then left-join each key's own
    * [min, max] bucket spine so absent buckets materialize with zero
    * counts. The spine explodes per key bounded by that key's observed
    * range (never the global range — a key active for one day costs 24
    * rows no matter how long the table's history is); both joins shuffle
    * on (key, bucket).
    *
    * @return (key, bucket_start epoch-seconds, n, sum_value) densified */
  def fillHourlyGaps(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val bucket = date_trunc("hour", col(tsCol))
    val hourly = df.groupBy(col(keyCol), bucket.as("__h"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__v"))
    val spine = hourly.groupBy(col(keyCol))
      .agg(min(col("__h")).as("__lo"), max(col("__h")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 hour"))).as("__h"))
    spine.join(hourly, Seq(keyCol, "__h"), "left")
      .select(col(keyCol),
        unix_timestamp(col("__h")).as("bucket_start"),
        coalesce(col("__n"), lit(0L)).as("n"),
        coalesce(col("__v"), lit(0.0)).as("sum_value"))
  }

  /** Rank-based features per key: percent rank (0..1 position in the
    * key's value order) and quartile (ntile 4) — the distribution-free
    * normalization that survives arbitrary outliers (a value's rank can't
    * be dragged the way [[scaleFeatures]]' min-max can). One window sort
    * per key, totalized by the tie column so both the rank and the tile
    * assignment are engine-deterministic. */
  def rankFeatures(df: DataFrame, keyCol: String, valueCol: String,
      tie: String, tiles: Int = 4): DataFrame = {
    require(tiles >= 2, s"need at least 2 tiles, got $tiles")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valueCol), col(tie))
    df.withColumn("pct_rank", percent_rank().over(w))
      .withColumn("tile", ntile(tiles).over(w).cast("bigint"))
  }

  /** Per-group min-max scaling: `(x − min_g)/(max_g − min_g)` with the
    * group stats from one unordered window pass (no sort — min/max over
    * the whole partition); a constant group scales to 0. The grouped
    * sibling of [[scaleFeatures]]' global modes, for features whose scale
    * is only meaningful within a stratum (per-language doc lengths,
    * per-source scores). */
  def scaleByGroup(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val v = col(valueCol).cast("double")
    val lo = min(v).over(w); val hi = max(v).over(w)
    df.withColumn("scaled",
      when(hi === lo, lit(0.0)).otherwise((v - lo) / (hi - lo)))
  }

  /** Slowly-changing-dimension type-2 history built from a change log:
    * collapse consecutive rows whose tracked attribute is unchanged, then
    * assign each surviving version a half-open validity interval
    * `[valid_from_us, valid_to_us)` in epoch microseconds (`valid_to_us`
    * NULL ⇔ `is_current`). Two window functions over the SAME
    * (key, ts, tie) sort — Catalyst reuses one shuffle+sort for both.
    * `tie` totalizes the order under timestamp collisions. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, attrCol: String,
      tie: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tie))
    // lag over a struct distinguishes "no previous row" (NULL struct) from
    // "previous attribute was NULL" (struct with NULL field) — a bare
    // lag(attr) conflates the two and drops a key's initial NULL version.
    val changes = df
      .withColumn("__prev", lag(struct(col(attrCol).as("a")), 1).over(w))
      .filter(col("__prev").isNull || // first version always survives
        !(col("__prev").getField("a") <=> col(attrCol))) // null-safe: NULL↔value transitions version too
    changes
      .select(col(keyCol), col(attrCol),
        unix_micros(col(tsCol)).as("valid_from_us"),
        unix_micros(lead(col(tsCol), 1).over(w)).as("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Smoothed target (mean) encoding of a categorical column — the
    * classic high-cardinality categorical featurizer: category →
    * `(Σy_cat + m·ȳ) / (n_cat + m)`, shrinking rare categories toward the
    * global mean. Returns the ENCODER TABLE (category, n, encoded) —
    * apply it with a broadcast join, persist it beside the model (the
    * train-time table must encode serving traffic too). One grouped
    * aggregation + one scalar aggregate; with an integer-valued target
    * every sum is exact, so the encoder restates as SQL bit-for-bit.
    * Rows with a NULL target contribute to neither count. */
  def targetEncode(df: DataFrame, catCol: String, yCol: String,
      m: Double): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val y = col(yCol).cast("double")
    val t0 = df.agg(sum(y).as("s"), count(y).as("n")).head()
    require(!t0.isNullAt(0), s"targetEncode: `$yCol` has no non-NULL values")
    val prior = m * (t0.getDouble(0) / t0.getLong(1))
    df.groupBy(col(catCol).as("category"))
      .agg(sum(y).as("__sy"), count(y).as("__n"))
      .select(col("category"), col("__n").as("n"),
        round((col("__sy") + prior) / (col("__n") + m), 6).as("encoded"))
  }

  /** Column scaling for feature engineering — min-max, z-score and robust
    * (median/MAD) variants added in one codegen scan after two bounded
    * aggregation passes (moments + quantiles; at 100 TB, swap the exact
    * percentiles for `percentile_approx` — the scan shape is unchanged).
    *
    * Deterministic by construction instead of by luck: mean and stddev
    * come from exact Σx / Σx² integer-moment sums (order-proof when the
    * feature is integer-valued — Spark's builtin `stddev` merges Welford
    * states in partition order and is NOT cross-engine-stable), and the
    * robust boundaries (median, MAD) are rounded to 4 decimals before
    * use, the [[graft.analyze.Quantiles.winsorize]] device. Scaled
    * outputs round to 4 decimals. */
  def scaleFeatures(df: DataFrame, c: String): DataFrame = {
    val x = col(c).cast("double")
    // pass 1: moments AND median share one scan; only the MAD pass
    // genuinely depends on a prior result (the rounded median)
    val r = df.agg(min(x).as("mn"), max(x).as("mx"), sum(x).as("s1"),
      sum(x * x).as("s2"), count(x).as("n"),
      percentile(x, lit(0.5)).as("med")).head()
    require(!r.isNullAt(0), s"scaleFeatures: column `$c` has no non-NULL values")
    val (mn, mx, s1, s2) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    val n = r.getLong(4).toDouble
    require(n >= 2, "need at least two non-NULL rows")
    require(mx > mn, s"constant column `$c` cannot be scaled")
    val mean = s1 / n
    val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    require(sd > 0, s"zero variance in `$c`")
    def round4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val med = round4(r.getDouble(5))
    val mad = round4(df.agg(percentile(abs(x - med), lit(0.5))).head().getDouble(0))
    require(mad > 0, s"zero MAD in `$c` — more than half the values equal the median")
    df.withColumn(c + "_minmax", round((x - mn) / (mx - mn), 4))
      .withColumn(c + "_zscore", round((x - mean) / sd, 4))
      .withColumn(c + "_robust", round((x - med) / mad, 4))
  }
}
