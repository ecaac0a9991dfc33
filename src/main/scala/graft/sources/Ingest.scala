package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion robustness for corpus pipelines: JSONL with corrupt-line
  * quarantine, and schema-drift-tolerant parquet reads. At 100 TB both
  * failure modes are certainties, not edge cases — a crawler emits some
  * malformed JSON every hour, and a year of parquet snapshots never shares
  * one schema. Both readers keep every byte: bad rows are ROUTED, never
  * dropped silently.
  */
object Ingest {

  /** A quarantined read: `good` parsed rows, `bad` raw malformed lines,
    * and the shared cached parse both derive from. Call [[release]] when
    * both sides have been consumed — the cache is pinned until then. */
  final case class QuarantinedJsonl(good: DataFrame, bad: DataFrame,
      parsed: DataFrame) {
    def release(): Unit = { parsed.unpersist(); () }
  }

  /** Read line-delimited JSON against a REQUIRED schema, splitting clean
    * rows from quarantined ones. PERMISSIVE mode parses what it can and
    * captures each malformed line verbatim in the corrupt column; the
    * split is two filters over one cached parse, and the returned handle
    * owns the cache lifecycle (`release()` when done — at scale, write
    * both sides out in one job, then release). Schema inference is
    * deliberately not offered: on a large corpus an inference pass is a
    * full extra scan, and a drifting inferred schema breaks downstream
    * consumers — declare the contract.
    */
  def readJsonlQuarantined(spark: SparkSession, path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_record"): QuarantinedJsonl = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain `$corruptCol`")
    val withCorrupt = schema.add(corruptCol, "string")
    val parsed = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val good = parsed.filter(col(corruptCol).isNull)
      .drop(corruptCol)
    val bad = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    QuarantinedJsonl(good, bad, parsed)
  }

  /** CSV twin of [[readJsonlQuarantined]]: PERMISSIVE parse against a
    * declared schema with malformed lines captured verbatim and routed,
    * never dropped. Same handle-owned cache lifecycle. `header = true`
    * skips a leading header row; multiline fields are deliberately OFF
    * (multiline CSV breaks input splitting — at 100 TB a file must be
    * splittable, so upstream should quote-escape newlines instead). */
  def readCsvQuarantined(spark: SparkSession, path: String,
      schema: StructType, header: Boolean = false,
      corruptCol: String = "_corrupt_record"): QuarantinedJsonl = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain `$corruptCol`")
    val withCorrupt = schema.add(corruptCol, "string")
    val parsed = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", header.toString)
      .option("enforceSchema", "true")
      .csv(path)
      .cache()
    val good = parsed.filter(col(corruptCol).isNull)
      .drop(corruptCol)
    val bad = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    QuarantinedJsonl(good, bad, parsed)
  }

  /** Read a set of parquet paths whose schemas drifted across writes and
    * present them as ONE target schema. Each path is aligned
    * independently — missing columns arrive as NULLs, extra columns are
    * dropped, and physical types are CAST to the target (which
    * `mergeSchema` refuses to do: int32 vs int64 across snapshots is a
    * merge error, not a widening) — then the aligned reads union. Schema
    * discovery touches only parquet footers; the alignment is a
    * projection on each scan, not a rewrite, and the union is plan-level
    * (no shuffle). Column order is the target's. */
  def readEvolved(spark: SparkSession, target: StructType,
      paths: String*): DataFrame = {
    require(paths.nonEmpty, "need at least one path")
    paths.map { p =>
      val df = spark.read.parquet(p)
      val have = df.columns.toSet
      df.select(target.fields.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    }.reduce(_ unionByName _)
  }

  /** Materialize a DataFrame through the ORC columnar format and hand back
    * the re-read — the second Spark-native columnar sink/source beside
    * parquet (some lakes standardize on ORC; an engine claiming source
    * completeness must read and write both). ORC scans support the same
    * predicate/column pushdown as parquet, so a round-tripped table keeps
    * its scan characteristics. Refuses to overwrite a source path of `df`
    * itself (the [[Bucketing.compact]] in-place guard). */
  def viaOrc(df: DataFrame, outPath: String): DataFrame = {
    Sinks.requireNotSourcePath(df, outPath)
    df.write.mode("overwrite").orc(outPath)
    df.sparkSession.read.orc(outPath)
  }

  /** JSONL (line-delimited JSON) sink/source round-trip — the standard
    * LLM-corpus interchange format. The re-read pins the SOURCE schema:
    * bare JSON inference widens types (int → bigint, date → string), so
    * an unpinned roundtrip would silently change the frame's shape. */
  def viaJsonl(df: DataFrame, outPath: String): DataFrame = {
    Sinks.requireNotSourcePath(df, outPath)
    df.write.mode("overwrite").json(outPath)
    df.sparkSession.read.schema(df.schema).json(outPath)
  }

  /** CSV sink/source round-trip with QUOTED free text — the classic
    * fidelity trap (embedded commas, quotes, leading/trailing spaces):
    * header on, source schema pinned on re-read, default quote/escape
    * rules. Spark's CSV WRITER trims leading/trailing whitespace by
    * default (ignoreLeading/TrailingWhiteSpace default TRUE on write,
    * even inside quoted fields) — both are disabled here so edge spaces
    * survive; the reader's write-side counterparts already default to
    * false. Embedded newlines are quoted by the writer but split rows
    * under the reader's default line-mode, so the re-read sets
    * multiLine=true (fidelity over per-line splittability — at 100 TB
    * prefer a splittable format outright; CSV is the interchange path).
    * Remaining format limitation the caller owns: CSV cannot distinguish
    * NULL from the empty string (both serialize to an empty field and
    * read back NULL); the fidelity gate holds because the corpus has no
    * empty texts.
    *
    * Because `multiLine=true` makes each CSV file SINGLE-SPLIT on read
    * (one task per file, however large), the write bounds file size via
    * `maxRecordsPerFile` — a writer that would otherwise emit one huge
    * file (a single-partition upstream, a coalesced frame) produces many
    * bounded files whose re-read parallelizes file-per-task instead of
    * serializing through one reader. */
  def viaCsv(df: DataFrame, outPath: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    Sinks.requireNotSourcePath(df, outPath)
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    df.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .csv(outPath)
    df.sparkSession.read.schema(df.schema).option("header", "true")
      .option("multiLine", "true").csv(outPath)
  }
}
