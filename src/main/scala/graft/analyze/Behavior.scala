package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event log — the funnel / cohort-retention
  * shapes every product-analytics warehouse query layer offers.
  *
  * Both operators are designed around ONE key-shuffle: funnel folds each
  * user's (ts, stage) sequence with a codegen'd array `aggregate` (no
  * self-join per stage — at 100 TB an n-stage funnel as n joins is n scans
  * and n shuffles; here it is one of each), and cohort retention joins a
  * first-seen table (one row per user — small relative to the event log
  * it summarizes, auto-broadcast by Catalyst when it fits).
  */
object Behavior {

  /** Ordered-funnel completion counts: stage k counts the users whose
    * event log contains `stages(0) … stages(k)` in strictly increasing
    * timestamp order (the classic "signup → activate → purchase" funnel).
    *
    * Per user: sort the stage events once, then fold left — advance to
    * stage r+1 at the first event of stage r strictly after the timestamp
    * that reached r (ties never advance, matching the min-ts SQL
    * restatement). Output long form: (stage, name, users), one row per
    * stage, users non-increasing.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct == stages, s"duplicate funnel stages: $stages")
    val stageIdx = stages.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("__u"),
        struct(unix_micros(col(tsCol)).as("t"), stageIdx.as("i")).as("__e"))
      .groupBy("__u")
      .agg(array_sort(collect_list(col("__e"))).as("__es"))
    val init = struct(lit(0).as("r"), lit(Long.MinValue).as("t"))
    val fold = aggregate(col("__es"), init, (acc: Column, e: Column) =>
      when(e("i") === acc("r") && e("t") > acc("t"),
        struct((acc("r") + 1).as("r"), e("t").as("t"))).otherwise(acc))
    val reached = perUser.select(fold("r").as("__reach"))
    def stageCount(i: Int) =
      coalesce(sum(when(col("__reach") >= i + 1, 1L).otherwise(0L)), lit(0L)).as(s"s$i")
    val counts = reached.agg(stageCount(0), stages.indices.tail.map(stageCount): _*)
    // one explode over the 1-row aggregate, not a union re-reading it per stage
    val names = array(stages.map(lit): _*)
    counts
      .select(posexplode(array(stages.indices.map(i => col(s"s$i")): _*))
        .as(Seq("stage", "users")))
      .select(col("stage"), element_at(names, col("stage") + 1).as("name"),
        col("users"))
  }

  /** Cohort retention: users grouped by the DATE of their first event (the
    * cohort), counted per whole-week offset from it — the activity decay
    * curve per acquisition cohort. Day-arithmetic only (`days / 7` floor),
    * no week-boundary truncation semantics to disagree over between
    * engines. The first-seen table is one row per user — Catalyst
    * broadcasts it when it fits, shuffles it when it doesn't.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("__cohort"))
    // no forced broadcast: first-seen is one row per DISTINCT USER, which
    // at large scale exceeds the broadcast limit — let Catalyst/AQE pick
    // (it still broadcasts whenever the user set is actually small)
    events.select(col(userCol), to_date(col(tsCol)).as("__day"))
      .join(first, userCol)
      .groupBy(col("__cohort").cast("string").as("cohort_day"),
        floor(datediff(col("__day"), col("__cohort")) / 7).cast("int").as("week_offset"))
      .agg(count_distinct(col(userCol)).as("users"))
  }

  /** Consecutive-day activity streaks (gaps-and-islands): one row per
    * maximal run of days on which the key was active. The classic
    * rownumber-difference device — `day − row_number` is constant within
    * an island — so the whole thing is ONE per-key window sort over the
    * deduped (key, day) set plus a grouped aggregate; no self-join, no
    * iteration, at any scale. */
  def streaks(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__day"))
    events.select(col(keyCol), to_date(col(tsCol)).as("__day")).distinct()
      .withColumn("__anchor", date_sub(col("__day"), row_number().over(w)))
      .groupBy(col(keyCol), col("__anchor"))
      .agg(min(col("__day")).cast("string").as("streak_start"),
        max(col("__day")).cast("string").as("streak_end"),
        count(lit(1)).as("streak_days"))
      .drop("__anchor")
  }

  /** Rolling 7-day active users (DAU→WAU): each (user, active-day) pair
    * contributes to the 7 report days it falls inside, so the sliding
    * distinct-count becomes one explode + one distinct aggregate — no
    * per-day self-join, no quadratic window. Report days are clipped to
    * the observed range (no phantom trailing days). Exchange is bounded
    * by active-pairs × window, and the distinct agg is the standard
    * two-phase hash shape. */
  def rollingActives(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val days = events.select(col(userCol), to_date(col(tsCol)).as("__day")).distinct()
    // range clip rides in-plan as a cross join with the 1-row bounds
    // aggregate (broadcast) — fully lazy, and the distinct scan is not
    // recomputed for a driver-side bounds action
    val bounds = days.agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
    days
      .select(col(userCol),
        explode(sequence(col("__day"),
          date_add(col("__day"), windowDays - 1))).as("report_day"))
      .crossJoin(broadcast(bounds))
      .filter(col("report_day") >= col("__lo") && col("report_day") <= col("__hi"))
      .groupBy(col("report_day").cast("string").as("report_day"))
      .agg(count_distinct(col(userCol)).as("active_users"))
  }

  /** Hourly OHLC bars per key — event-stream downsampling (the shape a
    * metrics/trading pipeline reduces ticks with). Open/close are picked
    * by lexicographic struct min/max over (ts, tie, value) — one grouped
    * aggregate, ONE shuffle, no window sort; `tie` totalizes the order
    * under timestamp collisions. */
  def ohlcBars(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val pick = struct(col(tsCol), col(tieCol), col(valueCol).as("__v"))
    events
      .groupBy(col(keyCol),
        unix_timestamp(date_trunc("hour", col(tsCol))).as("bar_start"))
      .agg(round(min(pick).getField("__v"), 4).as("open"),
        round(max(col(valueCol)), 4).as("high"),
        round(min(col(valueCol)), 4).as("low"),
        round(max(pick).getField("__v"), 4).as("close"),
        count(lit(1)).as("n_events"))
  }
}
