package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series diagnostics over (date, value) series. The reference's only
  * temporal surface is date-part feature extraction
  * (db_transformer/data/convert/column/datetime.py); these are the
  * series-level statistics a pipeline computes on top of such features to
  * detect seasonality and drift before training.
  */
object TimeSeries {

  /** Lagged autocorrelation: Pearson correlation between the series and
    * its k-day-shifted self, for k = 1..maxLag, over the pairs BOTH of
    * whose endpoints exist (gap days drop out of the pair set, they are
    * not imputed).
    *
    * Determinism: values are cast to long up front, every aggregate is an
    * exact integer sum, and the one floating step per lag is the final
    * `num / (sqrt(va)·sqrt(vb))` over exactly-equal operands — sqrt is
    * correctly rounded IEEE in any engine, so the rounded result is
    * restatable. Exactness bound: needs n·Σx² < 2^63 per lag window
    * (about 3e9 rows of values up to ~1e3, or any daily series whose
    * sums fit a long squared); pre-scale the series if it doesn't.
    *
    * Scale shape: one explode(1..maxLag) over the (already aggregated,
    * dates-bounded — i.e. tiny) series, one equi-join on the shifted
    * date, one groupBy(lag). The upstream daily aggregation is where the
    * data volume dies; everything here is O(days · maxLag). */
  /** Day-of-week seasonal profile of a daily series: per weekday the day
    * count, mean (exact integer sum / count, one rounded division), min,
    * and max. `dow` is 0 = Sunday .. 6 = Saturday (Spark's `dayofweek`−1,
    * which equals DuckDB's `dayofweek` — the alignment the oracle
    * relies on). Same scale shape as [[acf]]: the data volume dies in the
    * upstream daily aggregation, this is O(days). */
  def seasonalProfile(series: DataFrame, dateCol: String,
      valueCol: String): DataFrame =
    series.select(col(dateCol).as("__d"), col(valueCol).cast("long").as("__x"))
      .groupBy((dayofweek(col("__d")) - 1).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("__x")).cast("double") /
          count(lit(1)).cast("double"), 4).as("mean_v"),
        min(col("__x")).as("min_v"), max(col("__x")).as("max_v"))

  def acf(series: DataFrame, dateCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val s = series.select(col(dateCol).as("__d"),
      col(valueCol).cast("long").as("__x"))
    val lagged = s
      .select(col("__d"), col("__x").as("__xa"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("__jd", date_add(col("__d"), col("lag")))
    val pairs = lagged.join(
      s.select(col("__d").as("__jd"), col("__x").as("__xb")), Seq("__jd"))
    pairs.groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__xa") * col("__xb")).as("__sxy"),
        sum(col("__xa")).as("__sx"), sum(col("__xb")).as("__sy"),
        sum(col("__xa") * col("__xa")).as("__sxx"),
        sum(col("__xb") * col("__xb")).as("__syy"))
      .withColumn("acf", round(
        (col("n_pairs") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double") /
          (sqrt((col("n_pairs") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double")) *
           sqrt((col("n_pairs") * col("__syy") - col("__sy") * col("__sy"))
            .cast("double"))), 4))
      .select(col("lag"), col("n_pairs"), col("acf"))
  }
}
