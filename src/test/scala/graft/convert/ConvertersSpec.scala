package graft.convert

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.schema._

class ConvertersSpec extends SparkSpec {
  import spark.implicits._

  test("DurationConverter: total nanoseconds from a day-time interval") {
    val df = spark.sql(
      """SELECT * FROM VALUES
         (INTERVAL '0 00:00:01.5' DAY TO SECOND),
         (INTERVAL '1 02:03:04.000005' DAY TO SECOND),
         (INTERVAL '-0 00:00:02' DAY TO SECOND),
         (CAST(NULL AS INTERVAL DAY TO SECOND)) AS t(d)""")
    val Seq((suffix, e, _)) = Converters.DurationConverter.convert("d", DurationColumnDef(), col("d"))
    val out = df.select(e.as("ns")).collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(suffix == "_nanoseconds")
    assert(out(0).contains(1.5e9))
    assert(out(1).contains(((86400 + 2 * 3600 + 3 * 60 + 4) * 1e9 + 5e3)))
    assert(out(2).contains(-2e9))
    assert(out(3).isEmpty)
  }

  test("TimeConverter: HH:mm:ss strings, malformed and null degrade to 0.0") {
    val df = Seq("01:02:03", "23:59:59", "garbage", null).toDF("t")
    val Seq((_, e, _)) = Converters.TimeConverter.convert("t", TimeColumnDef(), col("t"))
    val out = df.select(e.as("s")).as[Double].collect()
    assert(out.toSeq == Seq(3723.0, 86399.0, 0.0, 0.0))
  }

  test("DateTimeConverter: year/dayofyear/seconds-since-midnight, null seconds -> 0") {
    val df = Seq(Some("2024-03-01 06:30:15"), None).toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val parts = Converters.DateTimeConverter.convert("ts", DateTimeColumnDef(), col("ts"))
    val out = df.select(parts.map { case (sfx, e, _) => e.as(sfx) }: _*).collect()
    assert(out(0).getDouble(0) == 2024.0 && out(0).getDouble(1) == 61.0 &&
      out(0).getDouble(2) == 6 * 3600 + 30 * 60 + 15.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1) && out(1).getDouble(2) == 0.0)
  }

  test("NumericConverter: cast to double with NULL->0.0") {
    val df = Seq(Some(3), None).toDF("x")
    val Seq((_, e, _)) = Converters.NumericConverter.convert("x", NumericColumnDef(), col("x"))
    assert(df.select(e).as[Double].collect().toSeq == Seq(3.0, 0.0))
  }

  test("oneHot: code column to indicator array") {
    val df = Seq(0, 2).toDF("c")
    val out = df.select(Converters.oneHot(col("c"), 3).as("v")).as[Seq[Double]].collect()
    assert(out(0) == Seq(1.0, 0.0, 0.0) && out(1) == Seq(0.0, 0.0, 1.0))
  }

  test("CategoricalCodes: first-appearance codes with NULL forced to 0") {
    val df = Seq((1, "b"), (2, "c"), (3, "b"), (4, null), (5, "a")).toDF("pk", "v")
    val dict = CategoricalCodes.dictionary(df, col("v"), Seq(col("pk")))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    // null -> 0; then first-appearance order b(pk1), c(pk2), a(pk5)
    assert(dict == Map((null: String) -> 0L, "b" -> 1L, "c" -> 2L, "a" -> 3L))
    val enc = CategoricalCodes.encode(df, "v", CategoricalCodes.dictionary(df, col("v"), Seq(col("pk"))), "code")
      .orderBy("pk").select("code").collect().map(_.getLong(0))
    assert(enc.toSeq == Seq(1L, 2L, 1L, 0L, 3L))
  }

  test("CategoricalCodes.guessMapper: finds the normalizer matching declared cardinality") {
    val df = Seq("A", " a", "B", "b").toDF("v")
    // noop: 4; ci: {a,' a',b} = 3; rstrip_ci: 3 (leading space survives);
    // strip_ci: {a, b} = 2 — first mapper in reference order that matches
    assert(CategoricalCodes.guessMapper(df, col("v"), 2) == "strip_ci")
    assert(CategoricalCodes.guessMapper(df, col("v"), 4) == "noop")
    val err = intercept[RuntimeException](CategoricalCodes.guessMapper(df, col("v"), 7))
    assert(err.getMessage.contains("Expected 7 unique values"))
  }

  test("AllSamePruner: constancy is judged over the original column's non-null rows") {
    val df = Seq((Some(5), 1), (None, 2), (Some(5), 3)).toDF("orig", "other")
    val conv = coalesce(col("orig").cast("double"), lit(0.0))
    // converted values are (5.0, 0.0, 5.0) — NOT constant unmasked, but
    // constant over orig's non-null rows -> pruned (reference notna() mask)
    val drop = AllSamePruner.constantColumns(df, Seq(("orig_c", conv, col("orig")),
      ("other_c", col("other").cast("double"), col("other"))))
    assert(drop == Set("orig_c"))
  }

  test("TableConverter: dispatch, naming, all-same pruning, target pop") {
    val df = Seq((1, "2024-01-05 00:00:00", 9.0, "x"), (2, "2025-02-06 00:00:00", 9.0, "y"))
      .toDF("id", "d", "const", "tgt")
      .select(col("id"), col("d").cast("timestamp").as("d"), col("const"), col("tgt"))
    val ts = TableSchema(scala.collection.immutable.ListMap(
      "id" -> NumericColumnDef(key = true),
      "d" -> DateTimeColumnDef(),
      "const" -> NumericColumnDef(),
      "tgt" -> TextColumnDef()))
    val (out, defs) = new TableConverter().convertTable(df, ts, target = Some("tgt"))
    // const pruned (all-same); d_seconds_since_midnight pruned (all 0);
    // target popped; d_year/d_dayofyear/id survive
    assert(out.columns.toSet == Set("id", "d_year", "d_dayofyear"))
    assert(defs.keySet == Set("id", "d_year", "d_dayofyear"))
  }

  test("LegacyDateConverter: year/month/day/ordinal/epoch from %Y-%m-%d strings") {
    val df = Seq("2024-03-01", "not-a-date").toDF("d")
    val parts = Converters.LegacyDateConverter.convert("d", DateColumnDef(), col("d"))
    assert(parts.map(_._1) == Seq("_year", "_month", "_day", "_ordinal", "_timestamp"))
    val out = df.select(parts.map { case (sfx, e, _) => e.as(sfx) }: _*).collect()
    assert(out(0).getDouble(0) == 2024.0 && out(0).getDouble(1) == 3.0 && out(0).getDouble(2) == 1.0)
    // proleptic ordinal of 2024-03-01 (python date.toordinal) = 738946
    assert(out(0).getDouble(3) == 738946.0)
    assert(out(0).getDouble(4) == 1709251200.0)
    assert(out(1).isNullAt(0)) // unparseable -> null through (lenient cast)
  }

  test("clampTimestamp bounds extreme dates") {
    val df = Seq("0001-01-01 00:00:00", "9999-01-01 00:00:00", "2020-06-15 12:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val out = df.select(year(Converters.clampTimestamp(col("ts"))).as("y")).as[Int].collect()
    assert(out.toSeq == Seq(1677, 2262, 2020))
  }
}
