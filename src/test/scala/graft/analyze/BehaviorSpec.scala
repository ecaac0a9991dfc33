package graft.analyze

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val stages = Seq("signup", "click", "purchase")

  private def funnelCounts(rows: Seq[(Long, String, String)]): Map[String, Long] =
    Behavior.funnel(rows.toDF("user_id", "event_type", "t")
        .withColumn("ts", col("t").cast("timestamp")),
      "user_id", "event_type", "ts", stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("funnel counts strictly-ordered completions only") {
    val rows = Seq(
      // u1 completes in order
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // u2 purchases BEFORE clicking: stops at click
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-01 00:30:00"),
      (2L, "click", "2024-01-01 01:00:00"),
      // u3 never signs up: counted nowhere
      (3L, "click", "2024-01-01 00:00:00"),
      (3L, "purchase", "2024-01-01 01:00:00"))
    val c = funnelCounts(rows)
    assert(c("signup") == 2 && c("click") == 2 && c("purchase") == 1)
  }

  test("a tie on the timestamp does not advance the funnel") {
    val rows = Seq(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 00:00:00"), // same instant as signup
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-01 00:00:01"))
    val c = funnelCounts(rows)
    assert(c("signup") == 2 && c("click") == 1 && c("purchase") == 0)
  }

  test("later qualifying events still complete a funnel after a false start") {
    val rows = Seq(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 00:10:00"), // too early: no click yet
      (1L, "click", "2024-01-01 00:20:00"),
      (1L, "purchase", "2024-01-01 00:30:00")) // now counts
    val c = funnelCounts(rows)
    assert(c("purchase") == 1)
  }

  test("cohort retention: day-0 cohorts, floor-week offsets, distinct users") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), // cohort 2024-01-01
      (1L, "2024-01-07 10:00:00"), // day 6 -> week 0
      (1L, "2024-01-08 10:00:00"), // day 7 -> week 1
      (1L, "2024-01-08 23:00:00"), // same user same week: distinct
      (2L, "2024-01-03 00:00:00")) // cohort 2024-01-03, week 0
      .toDF("user_id", "t").withColumn("ts", col("t").cast("timestamp"))
    val out = Behavior.cohortRetention(df, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out(("2024-01-01", 0)) == 1)
    assert(out(("2024-01-01", 1)) == 1)
    assert(out(("2024-01-03", 0)) == 1)
    assert(out.size == 3)
  }

  test("streaks: islands split on missing days, multi-event days dedupe") {
    val df = Seq(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 18:00:00"), // one day
      (1L, "2024-01-02 12:00:00"), (1L, "2024-01-03 12:00:00"), // streak of 3
      (1L, "2024-01-05 12:00:00"),                              // gap -> new streak
      (2L, "2024-01-10 00:00:00"))
      .toDF("user_id", "t").withColumn("ts", col("t").cast("timestamp"))
    val out = Behavior.streaks(df, "user_id", "ts")
      .orderBy("user_id", "streak_start").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-10", "2024-01-10", 1L)))
  }

  test("rollingActives: each active day feeds 7 report days, range clipped") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 12:00:00"), // dedupes
      (2L, "2024-01-05 10:00:00"),
      (3L, "2024-01-10 10:00:00"))
      .toDF("user_id", "t").withColumn("ts", col("t").cast("timestamp"))
    val out = Behavior.rollingActives(df, "user_id", "ts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("2024-01-01") == 1) // user 1 only
    assert(out("2024-01-05") == 2) // users 1 (day 1 + 4 < 7) and 2
    assert(out("2024-01-08") == 1) // user 1 aged out, user 2 still in
    assert(out("2024-01-10") == 2) // users 2 (Jan 5 + 5 < 7) and 3
    assert(!out.contains("2024-01-11") && !out.contains("2023-12-31"))
  }

  test("ohlcBars: open/close by (ts, tie) order, high/low over the bar") {
    val df = Seq(
      (1L, "2024-01-01 10:00:05", 2L, 30.0), // same ts as event 1: tie -> event 1 opens
      (1L, "2024-01-01 10:00:05", 1L, 10.0),
      (1L, "2024-01-01 10:59:59", 3L, 5.0),  // close; also the low
      (1L, "2024-01-01 11:00:00", 4L, 7.0))  // next bar
      .toDF("user_id", "t", "event_id", "value")
      .withColumn("ts", col("t").cast("timestamp"))
    val out = Behavior.ohlcBars(df, "user_id", "ts", "event_id", "value")
      .orderBy("bar_start").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(out(0) == ((10.0, 30.0, 5.0, 5.0, 3L))) // open=tie-winner, high, low, close
    assert(out(1) == ((7.0, 7.0, 7.0, 7.0, 1L)))
  }
}
