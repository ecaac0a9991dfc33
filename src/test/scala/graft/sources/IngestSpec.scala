package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType, DoubleType}

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("readJsonlQuarantined: clean rows parse, malformed lines quarantine verbatim") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val f = s"$dir/part.jsonl"
    Files.writeString(java.nio.file.Paths.get(f),
      """{"id": 1, "text": "ok one"}
        |{"id": 2, "text": "ok two"}
        |{broken json line
        |{"id": "not-a-number", "text": 3}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val q = Ingest.readJsonlQuarantined(spark, f, schema)
    try {
      val g = q.good.orderBy("id").collect()
      assert(g.length == 2 && g(0).getLong(0) == 1L && g(1).getString(1) == "ok two")
      val b = q.bad.as[String].collect()
      assert(b.length == 2)
      assert(b.exists(_.contains("{broken json line")), "raw line preserved verbatim")
      assert(b.exists(_.contains("not-a-number")), "type-mismatch rows quarantine too")
    } finally q.release() // the handle owns the cache — no global clearCache hammer
    // reserved column collision is rejected up front
    intercept[IllegalArgumentException] {
      Ingest.readJsonlQuarantined(spark, f,
        StructType(Seq(StructField("_corrupt_record", StringType))))
    }
  }

  test("readCsvQuarantined: type mismatches quarantine, clean rows parse") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val f = s"$dir/part.csv"
    Files.writeString(java.nio.file.Paths.get(f),
      """id,text
        |1,hello
        |oops,world
        |2,bye
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val q = Ingest.readCsvQuarantined(spark, f, schema, header = true)
    try {
      assert(q.good.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
      val b = q.bad.as[String].collect()
      assert(b.length == 1 && b.head.contains("oops,world"),
        s"malformed line kept verbatim: ${b.toSeq}")
    } finally q.release()
  }

  test("readEvolved: drifted snapshots align to the target schema") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    // v1 snapshot: no `score` column yet; id written as int
    Seq((1, "a"), (2, "b")).toDF("id", "text")
      .write.parquet(s"$dir/v1")
    // v2 snapshot: gained `score`, id widened to long, extra junk column
    Seq((3L, "c", 0.5, "junk")).toDF("id", "text", "score", "legacy")
      .write.parquet(s"$dir/v2")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("score", DoubleType)))
    val out = Ingest.readEvolved(spark, target, s"$dir/v1", s"$dir/v2")
    assert(out.schema.fieldNames.toSeq == Seq("id", "text", "score"))
    assert(out.schema("id").dataType == LongType)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2), "v1 rows carry NULL score")
    assert(rows(2).getDouble(2) == 0.5)
    assert(!out.columns.contains("legacy"), "junk columns dropped")
  }

  test("viaOrc round-trips data and keeps predicate pushdown on the re-read") {
    val dir = Files.createTempDirectory("graft_orc_spec").toString
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "v")
    src.write.parquet(s"$dir/parquet_src")
    val parquetDf = spark.read.parquet(s"$dir/parquet_src")
    val back = Ingest.viaOrc(parquetDf, s"$dir/orc_copy")
    assert(back.schema == parquetDf.schema)
    assert(back.orderBy("id").collect().toSeq ==
      parquetDf.orderBy("id").collect().toSeq)
    // the ORC scan must push filters like the parquet scan it replaces
    val plan = back.filter($"id" > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"ORC scan lost filter pushdown:\n$plan")
    // in-place overwrite of the input's own source path is rejected
    val e = intercept[IllegalArgumentException] {
      Ingest.viaOrc(parquetDf, s"$dir/parquet_src")
    }
    assert(e.getMessage.contains("source path"))
  }

  test("viaCsv preserves edge whitespace and embedded newlines in quoted text") {
    // Spark's CSV writer trims leading/trailing spaces by default (even
    // inside quotes) and its default reader splits quoted newlines into
    // broken rows — both fidelity traps viaCsv must survive
    val dir = Files.createTempDirectory("graft_csv_ws").toString
    val src = Seq(
      (1L, "  leading and trailing  "),
      (2L, "line one\nline two"),
      (3L, "tab\tinside, and a \"quote\""),
      (4L, "plain")).toDF("id", "text")
    val back = Ingest.viaCsv(src, s"$dir/csv_copy")
    val got = back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = src.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq,
      s"CSV round-trip mutated text:\n got=${got.toSeq}\nwant=${want.toSeq}")
  }

  test("viaCsv bounds file size: a single-partition frame still emits many files") {
    // multiLine=true makes each CSV file single-split on read, so an
    // unbounded writer would serialize the whole re-read through one
    // task; maxRecordsPerFile must split even a coalesced upstream
    val dir = Files.createTempDirectory("graft_csv_bound").toString
    val src = (1L to 1000L).map(i => (i, s"row $i")).toDF("id", "text")
      .coalesce(1)
    val back = Ingest.viaCsv(src, s"$dir/csv_bounded", maxRecordsPerFile = 100L)
    assert(back.count() == 1000L)
    val files = new java.io.File(s"$dir/csv_bounded").listFiles()
      .filter(f => f.getName.endsWith(".csv"))
    assert(files.length >= 10,
      s"expected >=10 bounded files, got ${files.length}")
    intercept[IllegalArgumentException] {
      Ingest.viaCsv(src, s"$dir/csv_bad", maxRecordsPerFile = 0L)
    }
  }
}
