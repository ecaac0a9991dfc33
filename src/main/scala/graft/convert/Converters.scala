package graft.convert

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Normalizers
import graft.schema._

/** Per-column feature converters — the engine's re-expression of the
  * reference's `SeriesConverter` framework
  * (db_transformer/data/converter/column/series_converter.py:15-20): a
  * vectorized 1→N column transform with output ColumnDefs. Here each
  * converter is a pure Catalyst expression bundle (UDTF-shaped API, no
  * UDFs — everything stays inside whole-stage codegen).
  */
trait ColumnConverter extends Serializable {
  /** @return derived (outputSuffix, expression, outputDef) triples; the
    *         final name is `<col><suffix>` (F19 naming,
    *         pandas_converter.py:40-48). */
  def convert(name: String, cd: ColumnDef, c: Column): Seq[(String, Column, ColumnDef)]
}

object Converters {

  /** F8: date → (year, dayofyear)
    * (data/converter/column/default_datetime_converters.py:13-21). */
  object DateConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = Seq(
      ("_year", year(c).cast("double"), NumericColumnDef()),
      ("_dayofyear", dayofyear(c).cast("double"), NumericColumnDef()))
  }

  /** F9: datetime → (year, dayofyear, seconds-since-midnight), NULL→0 on
    * the seconds term (default_datetime_converters.py:24-47). */
  object DateTimeConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = Seq(
      ("_year", year(c).cast("double"), NumericColumnDef()),
      ("_dayofyear", dayofyear(c).cast("double"), NumericColumnDef()),
      ("_seconds_since_midnight",
        coalesce((hour(c) * 3600 + minute(c) * 60 + second(c)).cast("double"), lit(0.0)),
        NumericColumnDef()))
  }

  /** F10: time-of-day string "HH:mm:ss" → seconds-since-midnight, null-safe
    * (default_datetime_converters.py:50-63). `try_cast` (not `cast`) so a
    * malformed value degrades to NULL→0.0 like the reference's lenient
    * pandas path instead of throwing under Spark 4's default ANSI mode. */
  object TimeConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = Seq(
      ("_seconds_since_midnight",
        coalesce(
          (split(c, ":").getItem(0).try_cast("double") * 3600 +
            split(c, ":").getItem(1).try_cast("double") * 60 +
            split(c, ":").getItem(2).try_cast("double")),
          lit(0.0)),
        NumericColumnDef()))
  }

  /** F11: timestamp → epoch seconds (default_datetime_converters.py:66-73;
    * the reference floor-divides nanoseconds by 1e9 — `unix_timestamp`
    * matches that for non-negative epochs). */
  object TimestampConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = Seq(
      ("_timestamp", unix_timestamp(c).cast("double"), NumericColumnDef()))
  }

  /** F15: numeric used as-is, cast to double; NULL→0.0
    * (data/convertor/columns/num_convertor.py:14-22,
    * heterodata_builder.py:170-172). */
  object NumericConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = Seq(
      ("", coalesce(c.cast("double"), lit(0.0)), NumericColumnDef()))
  }

  /** F13: interval → total nanoseconds (ctu_dataset.py:152-154). The
    * reference calls pandas `.dt.nanoseconds`, which is the sub-microsecond
    * COMPONENT (0-999) — always 0 for database-resolution data, an apparent
    * reference bug; the engine semantic is the useful one: the TOTAL
    * interval in nanoseconds. Computed by field extraction (extract SECOND
    * yields fractional seconds), NOT by a numeric cast — casting a day-time
    * interval to long returns end-field units (seconds for DAY TO SECOND),
    * not internal microseconds. */
  object DurationConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = Seq(
      ("_nanoseconds",
        ((date_part(lit("DAY"), c).cast("double") * 86400.0 +
          date_part(lit("HOUR"), c).cast("double") * 3600.0 +
          date_part(lit("MINUTE"), c).cast("double") * 60.0 +
          date_part(lit("SECOND"), c).cast("double")) * 1e9),
        NumericColumnDef()))
  }

  /** F16: legacy date-segment converter — parses `%Y-%m-%d` strings and
    * extracts (year, month, day, ordinal, epoch) like the reference's older
    * `DateConvertor` (data/convertor/columns/datetime_convertors.py:75-96);
    * ordinal = proleptic-Gregorian day number (datediff from 0001-01-01,
    * 1-based). Kept beside F8's (year, dayofyear) form because the two
    * pipelines disagree in the reference (SURVEY §7.4 risk 7). */
  object LegacyDateConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = {
      val d = to_date(c, "yyyy-MM-dd")
      Seq(
        ("_year", year(d).cast("double"), NumericColumnDef()),
        ("_month", month(d).cast("double"), NumericColumnDef()),
        ("_day", dayofmonth(d).cast("double"), NumericColumnDef()),
        ("_ordinal", (datediff(d, lit("0001-01-01").cast("date")) + 1).cast("double"),
          NumericColumnDef()),
        ("_timestamp", unix_timestamp(d.cast("timestamp")).cast("double"), NumericColumnDef()))
    }
  }

  /** F14: clamp timestamps to the pandas-representable range
    * (ctu_dataset.py:206-213). */
  def clampTimestamp(c: Column): Column =
    least(greatest(c, lit("1677-09-23 00:00:00").cast("timestamp")),
      lit("2262-04-10 00:00:00").cast("timestamp"))

  /** Omit: contributes nothing. */
  object OmitConverter extends ColumnConverter {
    def convert(name: String, cd: ColumnDef, c: Column) = Nil
  }

  /** F18: one-hot over a 0-based code column of known cardinality. */
  def oneHot(code: Column, card: Int): Column =
    transform(sequence(lit(0), lit(card - 1)),
      i => when(code === i, 1.0).otherwise(0.0))
}

/** W4/F17: categorical value → code dictionary and application.
  *
  * Codes follow the reference's contract (cat_converter.py:26-42): distinct
  * values in order of FIRST APPEARANCE (under the engine's documented total
  * order — the PK — where pandas used file order), with NULL forced to
  * code 0 when present.
  */
object CategoricalCodes {

  /** Build the (value, code) dictionary. First-appearance order is computed
    * DISTRIBUTED: `groupBy(value).agg(min(struct(orderCols)))` — a map-side-
    * partial hash aggregate, never a global window over the input (which
    * would collapse to one task at scale). The final ranking of the
    * dictionary itself is also distributed (range-sort + `zipWithIndex`,
    * [[graft.functions.DistributedRank]]) so even a dictionary with raw
    * cardinality in the billions never funnels through one partition. */
  def dictionary(df: DataFrame, valueCol: Column, orderCols: Seq[Column]): DataFrame = {
    val first = df.select(valueCol.as("value"), struct(orderCols: _*).as("__ord"))
      .groupBy(col("value")).agg(min(col("__ord")).as("__first"))
    // NULL (if present) sorts to the front => code 0 (cat_converter.py:33-38);
    // (isNotNull, __first) is a total order — __first is the min PK struct of
    // the value's rows, so it is unique per value.
    graft.functions.DistributedRank
      .withRank(first, Seq(col("value").isNotNull, col("__first")), "__rk")
      .select(col("value"), (col("__rk") - 1).as("code"))
  }

  /** Apply a dictionary: join (broadcast — dictionaries are tiny). */
  def encode(df: DataFrame, valueColName: String, dict: DataFrame,
      outName: String): DataFrame = {
    val d = broadcast(dict.withColumnRenamed("value", valueColName)
      .withColumnRenamed("code", outName))
    df.join(d, df(valueColName) <=> d(valueColName), "left")
      .drop(d(valueColName))
  }

  /** The mapper-guessing loop (cat_converter.py:44-78): try the 12 string
    * normalizers in declaration order until one's NULL-inclusive distinct
    * count equals the declared cardinality; error with the full report
    * otherwise. One aggregation pass computes all 12 candidate counts. */
  def guessMapper(df: DataFrame, c: Column, declaredCard: Int): String = {
    val aggs = Normalizers.orderedNames.map { n =>
      (count_distinct(Normalizers(n)(c)) +
        max(when(c.isNull, 1L).otherwise(0L))).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val counts = Normalizers.orderedNames.map(n => n -> row.getAs[Long](n))
    counts.collectFirst { case (n, cnt) if cnt == declaredCard => n }.getOrElse {
      val report = counts.map { case (n, cnt) => s" ->    $n (cardinality $cnt)" }
      throw new RuntimeException(
        s"Expected $declaredCard unique values, but the following operations on values " +
          "provided the following cardinalities instead:\n" + report.mkString("\n"))
    }
  }
}

/** A10: `skip_if_allsame` — drop a derived feature if all values where the
  * ORIGINAL column is non-null are identical (pandas_converter.py:36-39
  * masks by `series.notna()` before `nunique`). The mask matters: a
  * converter that coalesces NULL→0.0 would otherwise make a
  * constant-except-null column look non-constant. Evaluated for ALL
  * candidate (derivedExpr, originalColumn) pairs in one aggregation pass
  * over the source DataFrame. */
object AllSamePruner {
  /** @param candidates (outputName, derivedExpr, originalCol) triples,
    *                   evaluated against `src` (which still has originals) */
  def constantColumns(src: DataFrame,
      candidates: Seq[(String, Column, Column)]): Set[String] = {
    if (candidates.isEmpty) return Set.empty
    val aggs = candidates.map { case (n, e, orig) =>
      (count_distinct(when(orig.isNotNull, e)) <= 1).as(n)
    }
    val row = src.agg(aggs.head, aggs.tail: _*).collect()(0)
    candidates.map(_._1).filter(n => row.getAs[Boolean](n)).toSet
  }
}

/** Whole-table converter honoring the schema — the reference's
  * `DataFrameConverter` (data/converter/dataframe_converter.py:11-102):
  * dispatches per ColumnDef (first match wins, per_type_converter.py:16-39),
  * names outputs `<col><suffix>` deduplicating collisions with numeric
  * suffixes (converter_list.py:26-43), drops non-schema columns (P2), and
  * optionally pops the target column (P3).
  */
class TableConverter(
    dispatch: PartialFunction[ColumnDef, ColumnConverter] = TableConverter.defaults,
    skipAllSame: Boolean = true) extends Serializable {
  // skipAllSame default matches the reference's skip_if_allsame=True
  // (pandas_converter.py:12-14).

  /** @param keep columns passed through unchanged (e.g. a row-id the graph
    *             layer joins on) — not converted, not pruned, not in the
    *             returned ColumnDefs */
  def convertTable(df: DataFrame, ts: TableSchema,
      target: Option[String] = None,
      keep: Seq[String] = Nil): (DataFrame, Map[String, ColumnDef]) = {
    val used = scala.collection.mutable.Set.empty[String]
    def uniqueName(base: String): String = {
      val n = if (!used.contains(base)) base
      else Iterator.from(2).map(i => s"$base$i").find(!used.contains(_)).get
      used += n
      n
    }
    val planned: Seq[(String, Column, ColumnDef, String)] = ts.columns.toSeq.flatMap {
      case (name, cd) if target.contains(name) => Nil // P3: popped separately
      case (name, cd) =>
        val conv = dispatch.applyOrElse(cd, (_: ColumnDef) => Converters.OmitConverter)
        conv.convert(name, cd, col(name)).map { case (suffix, e, ocd) =>
          (uniqueName(s"$name$suffix"), e, ocd, name)
        }
    }
    val kept =
      if (!skipAllSame) planned
      else {
        // A10 pruning over the SOURCE df (original columns still present for
        // the notna() mask), one aggregation pass for all candidates.
        val drop = AllSamePruner.constantColumns(df,
          planned.map { case (n, e, _, orig) => (n, e, col(orig)) })
        planned.filterNot { case (n, _, _, _) => drop(n) }
      }
    // featureless table => constant filler column, so downstream feature
    // matrices are never zero-width (ctu_dataset.py:175-179)
    val withFiller =
      if (kept.nonEmpty) kept
      else Seq((uniqueName("__filler"), lit(1.0), NumericColumnDef(), ""))
    val out = df.select(
      keep.map(col) ++ withFiller.map { case (n, e, _, _) => e.as(n) }: _*)
    (out, withFiller.map { case (n, _, ocd, _) => n -> ocd }.toMap)
  }
}

object TableConverter {
  /** Default per-type dispatch (wired like heterodata_builder.py:75-120). */
  val defaults: PartialFunction[ColumnDef, ColumnConverter] = {
    case _: NumericColumnDef  => Converters.NumericConverter
    case _: DateColumnDef     => Converters.DateConverter
    case _: DateTimeColumnDef => Converters.DateTimeConverter
    case _: TimeColumnDef     => Converters.TimeConverter
    case _: DurationColumnDef => Converters.DurationConverter
    case _: OmitColumnDef     => Converters.OmitConverter
    // Categorical handled at DataFrame level via CategoricalCodes (needs data)
  }
}
