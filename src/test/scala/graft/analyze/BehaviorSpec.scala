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
}
