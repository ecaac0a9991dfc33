package graft.joins

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, ts); right: (key, ts, rid, payload)
  private def left = Seq(
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 50L),
    (4L, "b", 300L), (5L, "c", 10L))
    .toDF("id", "k", "t")

  private def right = Seq(
    ("a", 100L, 10L, 1.0), ("a", 200L, 11L, 2.0), ("a", 200L, 12L, 3.0),
    ("b", 250L, 20L, 4.0), ("b", 400L, 21L, 5.0))
    .toDF("k", "t", "rid", "payload")

  test("asofJoin picks the latest right row at-or-before each left row") {
    val out = TemporalJoins.asofJoin(left, right, "k", "k", "t", "t",
        carry = Seq("rid", "payload"), tieBreak = "rid")
      .select($"id", $"rid", $"payload").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(1L) == ((Some(10L), Some(1.0)))) // exact-ts match is inclusive
    assert(out(2L) == ((Some(12L), Some(3.0)))) // tie at t=200 -> max rid, SAME row's payload
    assert(out(3L) == ((None, None)))           // before any right row
    assert(out(4L) == ((Some(20L), Some(4.0)))) // 400 is in the future
    assert(out(5L) == ((None, None)))           // key with no right rows
  }

  test("asofJoin keeps every left row and its columns") {
    val out = TemporalJoins.asofJoin(left, right, "k", "k", "t", "t",
      carry = Seq("rid"), tieBreak = "rid")
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("id", "k", "t", "rid"))
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    val points = (1L to 200L).map(i => (i, s"k${i % 3}", i * 7 % 500)).toDF("pid", "k", "pt")
    val intervals = (1L to 40L).map { i =>
      val lo = (i * 37) % 450
      (i, s"k${i % 3}", lo, lo + 5 + (i % 60)) // some spans cross several buckets
    }.toDF("iid", "ik", "lo", "hi")

    val bucketed = TemporalJoins.rangeJoinBucketed(points, intervals,
        "k", "ik", "pt", "lo", "hi", bucketWidth = 50L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = points.join(intervals,
        points("k") === intervals("ik") &&
          points("pt") >= intervals("lo") && points("pt") < intervals("hi"))
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("rangeJoinBucketed handles fractional timestamps") {
    // point 100.2 in [0.0, 100.5): with floor((hi-1)/b) bucketing this
    // candidate was silently dropped (regression guard for that fix)
    val pts = Seq((1L, "x", 100.2), (2L, "x", 100.6)).toDF("pid", "k", "pt")
    val ivs = Seq((7L, "x", 0.0, 100.5), (8L, "x", 100.0, 100.4)).toDF("iid", "ik", "lo", "hi")
    val hits = TemporalJoins.rangeJoinBucketed(pts, ivs, "k", "ik", "pt",
        "lo", "hi", bucketWidth = 50L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 7L), (1L, 8L))) // 100.2 is inside BOTH intervals
  }

  test("rangeJoinBucketed is half-open: lo inclusive, hi exclusive") {
    val pts = Seq((1L, "x", 10L), (2L, "x", 20L)).toDF("pid", "k", "pt")
    val ivs = Seq((7L, "x", 10L, 20L)).toDF("iid", "ik", "lo", "hi")
    val hits = TemporalJoins.rangeJoinBucketed(pts, ivs, "k", "ik", "pt",
      "lo", "hi", bucketWidth = 4L).select($"pid").as[Long].collect().toSet
    assert(hits == Set(1L))
  }
}
