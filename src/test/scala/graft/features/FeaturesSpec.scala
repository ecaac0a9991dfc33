package graft.features

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Seq(
    (1L, "u1", 10L, 1.0, """{"k": 5}"""),
    (2L, "u1", 20L, 2.0, """{"k": 6}"""),
    (3L, "u1", 30L, 4.0, """{"k": 7}"""),
    (4L, "u1", 40L, 8.0, """{"k": 8}"""),
    (5L, "u2", 10L, 3.0, """{"missing": 1}"""))
    .toDF("id", "user", "ts", "value", "props")

  test("rolling computes lag, trailing-k mean and sequence per key") {
    val out = Features.rolling(ev, "user", "ts", "value", tie = "id", k = 3)
      .select($"id", $"prev_value", $"avg3", $"seq").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(1L) == ((None, 1.0, 1L)))
    assert(out(2L) == ((Some(1.0), 1.5, 2L)))             // (1+2)/2
    assert(out(3L) == ((Some(2.0), 7.0 / 3, 3L)))         // (1+2+4)/3
    assert(out(4L) == ((Some(4.0), 14.0 / 3, 4L)))        // (2+4+8)/3 — window slides
    assert(out(5L) == ((None, 3.0, 1L)))                  // independent key
  }

  test("ewma: recency weights, renormalized head, independent keys") {
    val out = Features.ewma(ev, "user", "ts", "value", tie = "id", k = 3)
      .select($"id", $"ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)                          // first row: own value
    assert(out(2L) == (2.0 + 0.5 * 1.0) / 1.5)      // weights 1, 1/2
    assert(out(3L) == (4.0 + 0.5 * 2.0 + 0.25 * 1.0) / 1.75)
    assert(out(4L) == (8.0 + 0.5 * 4.0 + 0.25 * 2.0) / 1.75) // window slides
    assert(out(5L) == 3.0)                          // independent key
    // more recent rows dominate: EWMA of u1's tail exceeds the flat mean
    assert(out(4L) > (2.0 + 4.0 + 8.0) / 3.0)
    intercept[IllegalArgumentException] {
      Features.ewma(ev, "user", "ts", "value", tie = "id", k = 0)
    }
    intercept[IllegalArgumentException] {
      Features.ewma(ev, "user", "ts", "value", tie = "id", k = 3, alpha = 1.0)
    }
    // an all-NULL window carries no weight: explicit NULL, never a 0/0 NaN
    val withNull = Seq((1L, "u3", 10L, null: java.lang.Double))
      .toDF("id", "user", "ts", "value")
    val nullOut = Features.ewma(withNull, "user", "ts", "value", tie = "id", k = 2)
      .select("ewma").collect()(0)
    assert(nullOut.isNullAt(0), "NULL-in, NULL-out for a weightless window")
  }

  test("fillHourlyGaps materializes missing hours as zero rows, per-key spine") {
    // u1 active at hours 0 and 3 (gap: 1, 2); u2 active only at hour 5 —
    // its spine must NOT extend to u1's range
    def hour(h: Int) = h * 3600L * 1000000L // epoch micros
    val ev = Seq(
      (1L, "u1", hour(0), 2.0), (2L, "u1", hour(0) + 60L * 1000000L, 3.0),
      (3L, "u1", hour(3), 4.0), (4L, "u2", hour(5), 7.0))
      .toDF("id", "user", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Features.fillHourlyGaps(ev, "user", "ts", "value")
      .orderBy("user", "bucket_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("u1", 0L, 2L, 5.0), ("u1", 3600L, 0L, 0.0), ("u1", 7200L, 0L, 0.0),
      ("u1", 10800L, 1L, 4.0), ("u2", 18000L, 1L, 7.0)))
  }

  test("rankFeatures: percent rank and tiles from the totalized order") {
    val out = Features.rankFeatures(ev, "user", "ts", tie = "id", tiles = 2)
      .select($"id", $"pct_rank", $"tile").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // u1 has 4 rows ordered by ts: pct_rank = (rank-1)/3
    assert(out(1L) == ((0.0, 1L)))
    assert(out(2L)._1 == 1.0 / 3 && out(2L)._2 == 1L)
    assert(out(3L)._1 == 2.0 / 3 && out(3L)._2 == 2L)
    assert(out(4L) == ((1.0, 2L)))
    assert(out(5L) == ((0.0, 1L)), "singleton key: rank 0, first tile")
    intercept[IllegalArgumentException] {
      Features.rankFeatures(ev, "user", "ts", tie = "id", tiles = 1)
    }
  }

  test("scaleByGroup: group-relative min-max, constant group scales to 0") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val out = Features.scaleByGroup(df, "g", "v")
      .select($"g", $"v", $"scaled").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 10.0)) == 0.0 && out(("a", 20.0)) == 0.5 &&
      out(("a", 30.0)) == 1.0)
    assert(out(("b", 7.0)) == 0.0, "constant group maps to 0, not NaN")
  }

  test("jsonField extracts typed scalars; missing path is NULL") {
    val out = ev.select($"id", Features.jsonField($"props", "$.k", "int").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(5))
    assert(out(4L) == Some(8))
    assert(out(5L).isEmpty)
  }

  test("scd2 collapses unchanged runs and chains validity intervals") {
    val log = Seq(
      (1L, "2024-01-01 00:00:00", 10L, 1L),
      (1L, "2024-01-02 00:00:00", 10L, 2L), // unchanged: collapses
      (1L, "2024-01-03 00:00:00", 20L, 3L), // version 2
      (1L, "2024-01-04 00:00:00", 10L, 4L), // back to 10: version 3
      (2L, "2024-01-01 00:00:00", 5L, 5L))
      .toDF("k", "t", "attr", "id").withColumn("ts", col("t").cast("timestamp"))
    val out = Features.scd2(log, "k", "ts", "attr", "id")
      .orderBy("k", "valid_from_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, false, false), (1L, 20L, false, false), (1L, 10L, true, true),
      (2L, 5L, true, true)))
    // intervals chain: each valid_to equals the next valid_from
    val k1 = Features.scd2(log, "k", "ts", "attr", "id")
      .filter($"k" === 1L).orderBy("valid_from_us")
      .select("valid_from_us", "valid_to_us").collect()
    k1.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) == b.getLong(0))
      case _ =>
    }
  }

  test("scd2 keeps a key's initial NULL-attribute version") {
    // regression: lag()=NULL on the first row null-safe-equalled a NULL attr
    // and the opening version (and its interval) vanished
    val log = Seq(
      (1L, "2024-01-01 00:00:00", None: Option[Long], 1L),
      (1L, "2024-01-02 00:00:00", Some(10L), 2L))
      .toDF("k", "t", "attr", "id").withColumn("ts", col("t").cast("timestamp"))
    val out = Features.scd2(log, "k", "ts", "attr", "id")
      .orderBy("valid_from_us").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(1) && !out(0).getBoolean(4)) // NULL version, closed
    assert(out(0).getLong(3) == out(1).getLong(2)) // interval chains to v2
    assert(out(1).getLong(1) == 10L && out(1).getBoolean(4))
  }

  test("targetEncode shrinks rare categories toward the global mean") {
    // global mean 3.0; 'a' has 4 values mean 2.0, 'b' one value 7.0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0), ("b", 7.0))
      .toDF("cat", "y")
    val out = Features.targetEncode(df, "cat", "y", m = 2.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // a: (8 + 2*3)/(4+2) = 14/6 = 2.333333; b: (7 + 6)/(1+2) = 4.333333
    assert(out("a") == ((4L, 2.333333)))
    assert(out("b") == ((1L, 4.333333)))
    // b sits far closer to the global mean than its raw mean 7.0
    assert(math.abs(out("b")._2 - 3.0) < math.abs(7.0 - 3.0))
    intercept[IllegalArgumentException] { Features.targetEncode(df, "cat", "y", -1) }
  }

  test("scaleFeatures: three modes from closed-form stats") {
    // values 1..5: min 1, max 5, mean 3, sd sqrt(2.5), median 3, MAD 1
    val df = (1 to 5).map(_.toDouble).toDF("x")
    val out = Features.scaleFeatures(df, "x").orderBy("x").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._2).toSeq == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    val expectedZ = Seq(-2, -1, 0, 1, 2).map(k =>
      BigDecimal(k / math.sqrt(2.5)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.map(_._3).toSeq == expectedZ)
    assert(out.map(_._4).toSeq == Seq(-2.0, -1.0, 0.0, 1.0, 2.0)) // (x-3)/1
    // degenerate inputs fail fast rather than emit NaN columns
    intercept[IllegalArgumentException] {
      Features.scaleFeatures(Seq(7.0, 7.0, 7.0).toDF("x"), "x") // constant
    }
    intercept[IllegalArgumentException] {
      Features.scaleFeatures(Seq(1.0, 1.0, 1.0, 9.0).toDF("x"), "x") // MAD 0
    }
  }
}
