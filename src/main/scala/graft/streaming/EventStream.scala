package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-ready event transforms. The reference is batch-only
  * (SURVEY §2.8) — its only temporal hook is an unused per-dataset
  * `timestamp_column` (ctu_repository_defauts.py:16). These transforms are
  * pure DataFrame functions, so the SAME code runs on a batch DataFrame
  * (how the correctness oracle checks them) and on `spark.readStream`
  * input, where `withWatermark` bounds state.
  */
object EventStream {

  /** Tumbling-window counts + sums per key. Batch and streaming share this
    * plan; pass `watermark = Some("10 minutes")` on a streaming input. */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    src.groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col(s"window.start").as("w_start"),
        col(keyCol), col("n"), col("sum_value"))
  }

  /** Oracle-friendly projection: epoch-second window start, rounded sums. */
  def hourlyStats(events: DataFrame): DataFrame =
    windowedAgg(events, "ts", "event_type", "1 hour")
      .select(
        unix_timestamp(col("w_start")).as("wstart"),
        col("event_type"),
        col("n"),
        round(col("sum_value"), 4).as("sum_value"))
}
