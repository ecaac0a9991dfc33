package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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

  /** Per-key running totals via arbitrary stateful processing —
    * `KeyValueGroupedDataset.mapGroupsWithState` (the §2.8 design hook for
    * custom state the built-in windowed aggregates can't express). State is
    * one (count, sum) pair per key; with a streaming source each
    * micro-batch updates it incrementally, and the same code runs on a
    * batch Dataset (state trivially per-group). */
  final case class KeyTotals(key: String, n: Long, total: Double)

  def runningTotals(events: DataFrame, keyCol: String,
      valueCol: String): Dataset[KeyTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), KeyTotals](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          KeyTotals(key, n, s)
      }
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
