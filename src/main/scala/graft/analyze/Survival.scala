package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis — the Kaplan–Meier product-limit estimator
  * (Kaplan & Meier 1958, JASA) over right-censored durations: the
  * standard churn/retention curve with censoring done correctly
  * (still-active subjects leave the risk set without counting as
  * deaths — naive retention curves over open cohorts understate
  * survival).
  *
  * Cost shape: ONE groupBy(duration) pass over the subjects (map-side
  * combine into ≤ distinct-duration groups), then windows over the
  * aggregated life table only — the table is bounded by the number of
  * distinct durations (days, usually thousands at most), so the
  * single-partition ordered window is a deliberate bounded-frame
  * choice, same as the DSIR/chi-square marginals. Subjects never
  * re-shuffle.
  *
  * The survival product Π(1 − d/n) is evaluated as
  * exp(Σ ln(1 − d/n)) with a per-row positivity guard plus a
  * cumulative-minimum zero detector (once a factor hits 0 — everyone
  * at risk died — survival is exactly 0 forever after; ln never sees
  * a non-positive argument in either engine).
  */
object Survival {

  /** Life table + survival curve from per-subject rows:
    * `durationCol` (non-negative, grouped as given — pre-bin to days/
    * weeks upstream) and `eventCol` (1 = event/death observed,
    * 0 = right-censored). Returns one row per distinct duration:
    * (t, n_at_risk, n_events, n_censored, survival).
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val lt = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("n_events"),
        count(lit(1)).as("__nr"))
    val all = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    val prev = Window.orderBy("t").rowsBetween(Long.MinValue, -1)
    val upTo = Window.orderBy("t").rowsBetween(Long.MinValue, 0)
    val withRisk = lt
      .withColumn("n_at_risk",
        sum(col("__nr")).over(all) -
          coalesce(sum(col("__nr")).over(prev), lit(0L)))
      .withColumn("__f",
        lit(1.0) - col("n_events").cast("double") / col("n_at_risk"))
    withRisk
      .withColumn("survival",
        when(min(col("__f")).over(upTo) <= 0.0, lit(0.0))
          .otherwise(exp(sum(
            when(col("__f") > 0.0, log(col("__f"))).otherwise(lit(0.0))
          ).over(upTo))))
      .select(col("t"), col("n_at_risk"), col("n_events"),
        (col("__nr") - col("n_events")).as("n_censored"),
        col("survival"))
  }
}
