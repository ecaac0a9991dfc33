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

  test("jsonField extracts typed scalars; missing path is NULL") {
    val out = ev.select($"id", Features.jsonField($"props", "$.k", "int").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(5))
    assert(out(4L) == Some(8))
    assert(out(5L).isEmpty)
  }
}
