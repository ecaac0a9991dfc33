package graft.analyze

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OlapSpec extends SparkSpec {
  import spark.implicits._

  private def sales = Seq(
    ("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 4.0), ("b", "x", 8.0))
    .toDF("d1", "d2", "v")

  test("rollupAgg emits detail, subtotal and grand-total levels with gid") {
    val out = Olap.rollupAgg(sales, Seq("d1", "d2"), Seq(sum($"v").as("s")))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (Some("a"), Some("x"), 3.0, 0L),
      (Some("a"), Some("y"), 4.0, 0L),
      (Some("b"), Some("x"), 8.0, 0L),
      (Some("a"), None, 7.0, 1L),
      (Some("b"), None, 8.0, 1L),
      (None, None, 15.0, 3L)))
  }

  test("cubeAgg adds the column-subtotal level rollup lacks") {
    val out = Olap.cubeAgg(sales, Seq("d1", "d2"), Seq(sum($"v").as("s")))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getDouble(2), r.getLong(3)))
      .toSet
    // the gid=2 sets (d2 kept, d1 aggregated) exist only in the cube
    assert(out.contains((None, Some("x"), 11.0, 2L)))
    assert(out.contains((None, Some("y"), 4.0, 2L)))
    assert(out.contains((None, None, 15.0, 3L)))
    assert(out.size == 8) // 3 detail + 2 d1-subtotals + 2 d2-subtotals + 1 grand
  }

  test("pivotCounts enumerates the domain and zero-fills") {
    val ev = Seq(("u1", "x"), ("u1", "x"), ("u1", "z"), ("u2", "y"))
      .toDF("u", "t")
    val out = Olap.pivotCounts(ev, "u", "t", Seq("x", "y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("u1") == ((2L, 0L)))  // 'z' not enumerated -> dropped
    assert(out("u2") == ((0L, 1L)))
  }

  test("histogram clamps out-of-range rows and fills empty buckets") {
    val df = Seq(-5.0, 0.0, 1.0, 9.9, 10.0, 35.0, 99.0, 250.0).toDF("x")
    val out = Olap.histogram(df, "x", lo = 0.0, hi = 100.0, nBuckets = 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out.size == 10)
    assert(out(0L) == ((0.0, 4L)))   // -5 clamps in; 0, 1, 9.9
    assert(out(1L) == ((10.0, 1L)))  // 10.0 is bucket 1 (half-open)
    assert(out(3L) == ((30.0, 1L)))
    assert(out(9L) == ((90.0, 2L)))  // 99 + clamped 250
    assert(out(5L)._2 == 0L)         // empty bucket present
  }

  test("histogram excludes NaN and NULL rows from every bucket") {
    val df = Seq(Some(5.0), Some(Double.NaN), None).toDF("x")
    val out = Olap.histogram(df, "x", lo = 0.0, hi = 10.0, nBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L)) // only the real 5.0 counted (bucket 1)
  }

  test("modePerGroup: ties go to the smallest value, NULLs excluded") {
    val df = Seq(
      ("g1", Some(3L)), ("g1", Some(3L)), ("g1", Some(1L)),
      ("g2", Some(5L)), ("g2", Some(2L)), // tie at count 1 -> 2 wins
      ("g3", None: Option[Long]), ("g3", Some(9L)))
      .toDF("g", "v")
    val out = Olap.modePerGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("g1") == ((3L, 2L)))
    assert(out("g2") == ((2L, 1L))) // smallest value on a count tie
    assert(out("g3") == ((9L, 1L))) // NULL never competes
  }

  test("unpivot melts wide columns to long form, NULLs carried through") {
    val wide = Seq((1L, 10.0, 0.5), (2L, 20.0, Double.NaN))
      .toDF("id", "a", "b")
      .withColumn("b", when(col("id") === 2L, lit(null: java.lang.Double))
        .otherwise(col("b")))
    val out = Olap.unpivot(wide, Seq("id"), Seq("a", "b"))
      .orderBy("id", "column")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (1L, "b", 0.5),
      (2L, "a", 20.0), (2L, "b", null)))
    intercept[IllegalArgumentException] {
      Olap.unpivot(wide, Seq("id"), Seq())
    }
  }
}
