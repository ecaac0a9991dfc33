package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** HLL registers per tumbling window — the streaming form of
    * [[graft.analyze.Sketches.hllRegisters]]: ONE groupBy((window, bucket))
    * with a max aggregate, so it lifts to Structured Streaming unchanged
    * (max is a supported streaming aggregate; the watermark evicts closed
    * windows' register state). The sink persists registers, not counts —
    * the estimate ([[graft.analyze.Sketches.hllEstimate]]) is computed at
    * QUERY time over the tiny register table, which is how a streaming
    * distinct-count stays incremental: per window only 256 max-registers
    * of state, duplicate and late-but-in-watermark arrivals absorbed by
    * max's idempotence. */
  def windowedDistinctRegisters(events: DataFrame, tsCol: String,
      idCol: String, windowLen: String,
      watermark: Option[String] = None): DataFrame = {
    import graft.analyze.Sketches
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    val h = Sketches.hexHash(col(idCol), "hll")
    src.select(window(col(tsCol), windowLen).as("__w"), h.as("__h"))
      .groupBy(col("__w"),
        substring(col("__h"), 1, Sketches.BucketChars).as("bucket"))
      .agg(max(Sketches.rho(col("__h"))).as("r"))
      .select(col("__w.start").as("w_start"), col("bucket"), col("r"))
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

  /** Batch sessionization: per-key sessions split where the gap between
    * consecutive events exceeds `gapSeconds`. Classic lag + running-sum
    * windows — two window passes over ONE partitioning (Catalyst plans a
    * single exchange), then a session aggregate. */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(byKey)
    val isNew = when(prev.isNull ||
      (unix_timestamp(col(tsCol)) - unix_timestamp(prev)) > gapSeconds, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_timestamp(min(col(tsCol))).as("start_s"),
        unix_timestamp(max(col(tsCol))).as("end_s"))
  }

  /** Streaming sessionization: `flatMapGroupsWithState` with EVENT-TIME
    * timeout — state per key is the open session (start, last, count).
    * A session is emitted when an in-batch event arrives after the gap, OR
    * when the watermark passes last+gap with no new events (the timeout
    * path): an idle key's final session is emitted on watermark advance
    * alone and its state evicted, so state stays bounded on a real stream.
    * The batch form above is the oracle for bounded input.
    *
    * Requires `withWatermark`-able event time, which this function sets on
    * `tsCol` with `watermarkDelay` before grouping. */
  final case class SessionOut(key: String, n_events: Long, start_s: Long, end_s: Long)
  // public: the state encoder's generated code must construct it
  final case class SessionState(start: Long, last: Long, n: Long)

  def sessionizeStream(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark(tsCol, watermarkDelay)
      // no cast on the ts column: a cast would mint a new attribute and
      // strip the event-time watermark tag the timeout needs
      .select(col(keyCol).cast("string").as("_1"), col(tsCol).as("_2"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, s.n, s.start, s.last))
          } else {
            // epoch-second floor, matching sessionizeBatch's unix_timestamp
            val sorted = rows.map(r => Math.floorDiv(r._2.getTime, 1000L)).toSeq.sorted
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapSeconds =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(key, s.n, s.start, s.last)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire when the watermark passes last+gap; clamp above the
              // current watermark (required by Spark for late-arriving keys)
              val target = (s.last + gapSeconds) * 1000L + 1L
              val wm =
                try state.getCurrentWatermarkMs()
                catch { case _: UnsupportedOperationException => Long.MinValue }
              state.setTimeoutTimestamp(math.max(target, wm + 1L))
            }
            closed.iterator
          }
      }
  }
  /** Streaming exact dedup: keep the first occurrence of each key, with
    * watermark-bounded state — the streaming form of `Dedup.exactDedup`
    * for continuous ingestion (an LLM-data pipeline consuming a document
    * firehose). `dropDuplicatesWithinWatermark` evicts a key's state once
    * the watermark passes its event time + delay, so state is bounded by
    * the watermark window instead of growing with the corpus; exact
    * global dedup over unbounded history belongs to the batch operator.
    * Runs unchanged on a batch DataFrame (plain dropDuplicates semantics,
    * which is how the spec cross-checks it). */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
      watermarkDelay: String): DataFrame = {
    val src = events.withWatermark(tsCol, watermarkDelay)
    if (events.isStreaming) src.dropDuplicatesWithinWatermark(keyCols)
    else src.dropDuplicates(keyCols)
  }

  /** Incremental-ingestion dedup against a STATIC history: arriving rows
    * whose `keyCols` already exist in `history` are dropped via a
    * stream-static LEFT ANTI join — the continuous form of the batch
    * fingerprint anti-join. The static side is re-read per micro-batch
    * (pointing it at a parquet path picks up compactions); combine with
    * [[dedupStream]] to also dedup WITHIN the stream's watermark window.
    * Runs unchanged on a batch DataFrame. */
  def antiJoinDedup(incoming: DataFrame, history: DataFrame,
      keyCols: Seq[String]): DataFrame =
    incoming.join(history.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")

  /** Stream-stream (or batch) interval join: right rows within
    * `[leftTs + lower, leftTs + upper)` of a left row with the same key.
    * On streaming inputs, pass `watermarkDelay`: both sides get watermarks
    * and the two-sided time-range condition lets Spark's symmetric hash
    * join evict state outside the window — the continuous-ingestion form
    * of [[graft.joins.TemporalJoins.rangeJoinBucketed]]. On batch inputs
    * the same plan is a key equi-join + range filter (watermark nodes are
    * optimized away), which is how the oracle checks it.
    *
    * Output carries both sides' columns — pre-rename to avoid collisions. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lower: String, upper: String,
      watermarkDelay: Option[String] = None): DataFrame = {
    val l = watermarkDelay.fold(left)(w => left.withWatermark(leftTs, w)).alias("l")
    val r = watermarkDelay.fold(right)(w => right.withWatermark(rightTs, w)).alias("r")
    l.join(r, expr(
      s"l.`$leftKey` = r.`$rightKey` AND " +
        s"r.`$rightTs` >= l.`$leftTs` + INTERVAL $lower AND " +
        s"r.`$rightTs` < l.`$leftTs` + INTERVAL $upper"))
  }

  /** Oracle-friendly projection: epoch-second window start, rounded sums. */
  def hourlyStats(events: DataFrame): DataFrame =
    windowedAgg(events, "ts", "event_type", "1 hour")
      .select(
        unix_timestamp(col("w_start")).as("wstart"),
        col("event_type"),
        col("n"),
        round(col("sum_value"), 4).as("sum_value"))

  /** Gap sessions via Spark's NATIVE `session_window` — the declarative
    * twin of [[sessionizeBatch]]'s stateful form: one groupBy, Catalyst
    * owns the merge, and the identical expression lifts to Structured
    * Streaming (where the engine also handles state eviction). Session
    * end is `last event + gap`, and the merge boundary is INCLUSIVE: an
    * event at exactly the previous session's end still extends it
    * (measured Spark behavior — a new session needs `gap STRICTLY
    * exceeded`). Output in epoch micros so the boundary semantics
    * compare exactly. */
  def sessionWindows(events: DataFrame, keyCol: String, tsCol: String,
      gap: String): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
}
