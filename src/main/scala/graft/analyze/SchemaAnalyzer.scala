package graft.analyze

import scala.collection.immutable.ListMap
import scala.util.matching.Regex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{ParquetCatalog, SetFilter}
import graft.functions.Normalizers
import graft.schema._

/** Pluggable distinct-count strategy — the reference's `DBDistinctCounter`
  * protocol (db_transformer/db/distinct_cnt_retrieval.py:26-29, selection at
  * db/schema_autodetect.py:76-122). Both built-ins are DataFrame plans:
  *  - [[DistinctCounter.DbDistinct]]: NULL-inclusive distinct count, the SQL
  *    `SELECT count(*) FROM (SELECT DISTINCT col FROM t)` — the subquery is
  *    deliberate so NULL counts as a value (distinct_cnt_retrieval.py:48).
  *  - [[DistinctCounter.FetchAllNormalized]]: normalize with one of the 12
  *    string mappers first (distinct_cnt_retrieval.py:132-155).
  */
sealed trait DistinctCounter {
  def expr(c: Column, dt: DataType): Column
}
object DistinctCounter {
  /** NULL-inclusive exact distinct: `count_distinct(c) + (any null ? 1 : 0)`
    * — single-pass, map-side-partial-aggregable, equivalent to
    * `SELECT count(*) FROM (SELECT DISTINCT c)` but cheaper at scale than a
    * subquery-per-column (one multi-agg scan instead of N scans; contrast
    * the reference's per-column roundtrips, schema_autodetect.py:261-310). */
  case object DbDistinct extends DistinctCounter {
    def expr(c: Column, dt: DataType): Column =
      (count_distinct(c) +
        coalesce(max(when(c.isNull, 1L).otherwise(0L)), lit(0L))).cast(LongType)
  }
  /** Distinct count after string normalization (applies to string columns
    * only; others fall back to DbDistinct). */
  final case class FetchAllNormalized(mapper: String) extends DistinctCounter {
    private val f = Normalizers(mapper)
    def expr(c: Column, dt: DataType): Column = dt match {
      case StringType =>
        // coalesce: max over zero rows is NULL, and NULL would poison the
        // sum on an empty table (DbDistinct returns 0 there)
        (count_distinct(f(c)) +
          coalesce(max(when(c.isNull, 1L).otherwise(0L)), lit(0L))).cast(LongType)
      case _ => DbDistinct.expr(c, dt)
    }
  }
  /** Sketch-based variant for the 100 TB path: HLL++ approximate distinct
    * (+ exact null-presence flag). The analyzer only compares the count
    * against RATIO thresholds (0.05 / 0.2 / card 1000), so a small rsd is
    * decision-equivalent except within epsilon of a threshold — trade
    * exactness for a single streaming pass with O(1) state per column. */
  final case class Approx(rsd: Double = 0.01) extends DistinctCounter {
    def expr(c: Column, dt: DataType): Column =
      (approx_count_distinct(c, rsd) +
        coalesce(max(when(c.isNull, 1L).otherwise(0L)), lit(0L))).cast(LongType)
  }

  def apply(name: String): DistinctCounter = name match {
    case "db_distinct" => DbDistinct
    case "approx"      => Approx()
    case s if s.startsWith("fetchall_") => FetchAllNormalized(s.stripPrefix("fetchall_"))
    case other => sys.error(s"Unknown distinct counter '$other'")
  }
}

/** Per-column statistics the heuristics need. */
final case class ColumnStats(nNonNull: Long, distinctInclNull: Long)

/** Statistics-driven semantic schema autodetection — a Spark-native
  * re-expression of the reference's `SchemaAnalyzer`
  * (db_transformer/db/schema_autodetect.py:125-508).
  *
  * Heuristic pipeline per column (schema_autodetect.py:428-484):
  *   1. explicit target type short-circuit;
  *   2. single-column-PK ⇒ Omit(key=true); member of any non-composite FK
  *      ⇒ Omit;
  *   3. physical type determined (DETERMINED_TYPES);
  *   4. all-NULL ⇒ Omit (error if target);
  *   5. integer/string branch on the distinct/nonnull ratio with thresholds
  *      0.05 / 0.2 and max cardinality 1000, plus ID-name regex, common
  *      numeric-name regex and plural-name heuristics.
  *
  * Scale design: the reference issues two SQL roundtrips per column
  * (schema_autodetect.py:261-310); here all per-column stats of a table are
  * collected in ONE aggregation pass over one scan (`statsFor`), so a
  * 1000-column table costs one job, and parquet column pruning limits IO to
  * the columns that actually need stats (int/string/bool only).
  */
class SchemaAnalyzer(
    val catalog: ParquetCatalog,
    val target: Option[(String, String)] = None,
    val targetType: Option[String] = None, // "categorical" | "numeric"
    val omitFilters: SetFilter[(String, String)] = SetFilter[(String, String)](),
    val distinctCounter: DistinctCounter = DistinctCounter.DbDistinct,
    val postGuessSchemaHook: Schema => Schema = identity) {

  import SchemaAnalyzer._

  /** Columns surviving the constructor's include/exclude filter
    * (schema_autodetect.py:238-245). */
  private lazy val notOmitted: Set[(String, String)] =
    omitFilters(catalog.tableColumnPairs().toSet)

  /** One-pass per-table stats for the columns whose heuristics need data
    * (integers, strings, booleans). Cached per analyzer instance, like the
    * reference's lru_caches (schema_autodetect.py:261-310). TrieMap because
    * [[prewarmStats]] fills it from concurrent per-table jobs. */
  private val statsCache = scala.collection.concurrent.TrieMap.empty[String, Map[String, ColumnStats]]

  /** Run every table's stats pass CONCURRENTLY before the sequential guess
    * loop reads them: each per-table aggregate alone cannot fill the
    * cluster through its whole lifetime (planning, scan ramp-up, the final
    * 1-partition reduce), so a 10-table catalog run back-to-back leaves
    * most cores idle most of the time. Submitting the jobs from a small
    * thread pool lets Spark's scheduler interleave them — same results
    * (the cache is keyed per table; `statsFor` is idempotent), wall-clock
    * bounded by the widest table instead of the sum. */
  private def prewarmStats(tables: Seq[String]): Unit = {
    if (tables.sizeIs <= 1) { tables.foreach(statsFor); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(tables.size, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val done = scala.concurrent.Future.sequence(
        tables.map(t => scala.concurrent.Future(statsFor(t))))
      scala.concurrent.Await.result(done, scala.concurrent.duration.Duration.Inf)
      ()
    } finally { pool.shutdown() }
  }

  def statsFor(table: String): Map[String, ColumnStats] = statsCache.getOrElseUpdate(table, {
    val df = catalog.table(table)
    val needy = catalog.columns(table).fields.filter(f => needsStats(f.dataType))
    if (needy.isEmpty) Map.empty
    else {
      val aggs = needy.flatMap { f =>
        Seq(
          count(col(f.name)).as(s"nn_${f.name}"),
          distinctCounter.expr(col(f.name), f.dataType).as(s"dc_${f.name}"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      needy.map { f =>
        f.name -> ColumnStats(
          nNonNull = row.getAs[Long](s"nn_${f.name}"),
          distinctInclNull = Option(row.getAs[Any](s"dc_${f.name}")).fold(0L)(_.asInstanceOf[Long]))
      }.toMap
    }
  })

  /** Guess the ColumnDef for one column
    * (schema_autodetect.py:428-484 `guess_column_type`). */
  def guessColumnType(table: String, column: String): ColumnDef = {
    if (!notOmitted.contains((table, column))) return OmitColumnDef()

    val physical = catalog.columns(table).apply(column).dataType
    val pk = catalog.primaryKey(table)
    val isInPk = pk.contains(column)
    val isTarget = target.contains((table, column))

    // explicit target type short-circuit (:445-452)
    val forced: Option[DetClass] = if (isTarget && targetType.isDefined) {
      targetType.get match {
        case "categorical" => Some(DetCat)
        case "numeric"     => Some(DetNum)
        case other         => sys.error(s"Unknown target type '$other'")
      }
    } else {
      // single-column PK ⇒ pure row identifier (:453-461)
      if (isInPk && pk.length == 1) return OmitColumnDef(key = true)
      // non-composite FK member ⇒ omit (:462-467)
      if (catalog.foreignKeys(table).filter(_.columns.length == 1).exists(_.columns.contains(column)))
        return OmitColumnDef(key = isInPk)
      None
    }

    val cls = forced.getOrElse(doGuessColumnType(table, column, isInPk, mustHaveType = isTarget, physical))
    if (isTarget && cls == DetOmit)
      sys.error(s"Column '$column' in table '$table' cannot be omitted (it is the target).")
    instantiate(table, column, isInPk, cls)
  }

  /** The decision tree (schema_autodetect.py:312-389) — overridable. */
  protected def doGuessColumnType(
      table: String, column: String, inPrimaryKey: Boolean,
      mustHaveType: Boolean, physical: DataType): DetClass = {
    determinedTypes.collectFirst { case (pred, cls) if pred(physical) => cls } match {
      case Some(cls) => cls
      case None =>
        val stats = statsFor(table).get(column)
        val nNonNull = stats.fold(0L)(_.nNonNull)
        if (nNonNull == 0L) {
          if (mustHaveType)
            sys.error(s"Column $column in table $table contains only NULL values, " +
              "but it cannot be omitted as it is the target.")
          return DetOmit
        }
        physical match {
          case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
            val card = stats.get.distinctInclNull
            if (card.toDouble / nNonNull > IgnoreThreshold || card > MaxCardinality) {
              if (!mustHaveType && IdNameRegex.findFirstIn(column).isDefined) DetOmit
              else DetNum
            } else if (CommonNumericNameRegex.findFirstIn(column).isDefined) DetNum
            else if (isPluralName(column)) DetNum
            else DetCat
          case _: StringType =>
            val card = stats.get.distinctInclNull
            if (card.toDouble / nNonNull > IgnoreThreshold || card > MaxCardinality) {
              if (!mustHaveType && IdNameRegex.findFirstIn(column).isDefined) DetOmit
              else DetText
            } else DetCat
          case _ => DetOmit // no decision (:388-389)
        }
    }
  }

  /** Instantiate (schema_autodetect.py:391-426): categorical pulls its
    * NULL-inclusive cardinality from the stats pass. */
  protected def instantiate(table: String, column: String, inPk: Boolean, cls: DetClass): ColumnDef =
    cls match {
      case DetCat =>
        val card = statsFor(table).get(column).map(_.distinctInclNull).getOrElse {
          sys.error(s"Column $table.$column determined categorical but cardinality unavailable")
        }
        CategoricalColumnDef(card.toInt, key = inPk)
      case DetNum      => NumericColumnDef(key = inPk)
      case DetDate     => DateColumnDef(key = inPk)
      case DetDateTime => DateTimeColumnDef(key = inPk)
      case DetDuration => DurationColumnDef(key = inPk)
      case DetTime     => TimeColumnDef(key = inPk)
      case DetText     => TextColumnDef(key = inPk)
      case DetOmit     => OmitColumnDef(key = inPk)
    }

  /** Analyze every table (schema_autodetect.py:486-508), then apply the
    * post-guess hook (the infer → patch layering of SURVEY §1.3). */
  def guessSchema(): Schema = {
    val names = catalog.listTables()
    prewarmStats(names)
    val tables = names.map { t =>
      val cols = ListMap(catalog.columns(t).fieldNames.map(c => c -> guessColumnType(t, c)): _*)
      t -> TableSchema(cols, catalog.foreignKeys(t))
    }
    postGuessSchemaHook(Schema(ListMap(tables: _*)))
  }

  /** Flat DataFrame view of the guessed schema — the engine's introspection
    * query surface. */
  def guessSchemaDF(): DataFrame = {
    val schema = guessSchema()
    val rows = schema.tables.toSeq.flatMap { case (t, ts) =>
      ts.columns.toSeq.map { case (c, cd) =>
        (t, c, cd.typeName, cd.key, cd match {
          case CategoricalColumnDef(card, _) => card.toLong
          case _                             => -1L
        })
      }
    }
    import catalog.spark.implicits._
    rows.toDF("table_name", "column_name", "coldef", "is_key", "cardinality")
  }
}

object SchemaAnalyzer {
  /** Internal decision classes (the reference returns Python classes from
    * `do_guess_column_type`; we use a small enum). */
  sealed trait DetClass
  case object DetCat extends DetClass
  case object DetNum extends DetClass
  case object DetDate extends DetClass
  case object DetDateTime extends DetClass
  case object DetDuration extends DetClass
  case object DetTime extends DetClass
  case object DetText extends DetClass
  case object DetOmit extends DetClass

  /** DETERMINED_TYPES (schema_autodetect.py:136-148) restated over Spark
    * physical types. Strings and integers are NOT determined — they go
    * through the data-driven heuristics. */
  val determinedTypes: Seq[(DataType => Boolean, DetClass)] = Seq(
    ((dt: DataType) => dt.isInstanceOf[BooleanType], DetCat),
    ((dt: DataType) => dt.isInstanceOf[FloatType] || dt.isInstanceOf[DoubleType] ||
      dt.isInstanceOf[DecimalType], DetNum),
    ((dt: DataType) => dt.isInstanceOf[DateType], DetDate),
    ((dt: DataType) => dt.isInstanceOf[TimestampType] || dt.isInstanceOf[TimestampNTZType], DetDateTime),
    ((dt: DataType) => dt.isInstanceOf[DayTimeIntervalType] || dt.isInstanceOf[YearMonthIntervalType],
      DetDuration))

  /** Stats are only gathered where heuristics consume them. Booleans need
    * the cardinality for CategoricalColumnDef instantiation. */
  def needsStats(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _: StringType | _: BooleanType                            => true
    case _                                                         => false
  }

  /** schema_autodetect.py:153-155 */
  val IdNameRegex: Regex =
    ("_id$|^id_|_id_|Id$|Id[^a-z]|[Ii]dentifier|IDENTIFIER|ID[^a-zA-Z]|ID$|" +
      "[guGU]uid[^a-z]|[guGU]uid$|[GU]UID[^a-zA-Z]|[GU]UID$").r

  /** schema_autodetect.py:157-160 (case-insensitive) */
  val CommonNumericNameRegex: Regex =
    ("(?i)balance|amount|size|duration|frequency|count|cnt|votes|score|number|" +
      "age|year|month|day").r

  val GuaranteedThreshold = 0.05 // :162-168 must-be-categorical
  val IgnoreThreshold = 0.2      // :170-174 cannot-be-categorical
  val MaxCardinality = 1000      // :176-180

  /** Plural column name ⇒ probably a count ⇒ numeric
    * (schema_autodetect.py:366-368 uses `inflect.singular_noun`; this is a
    * small hand-rolled English plural test over the final name token). */
  def isPluralName(column: String): Boolean = {
    val token = column.split("[_\\s]").lastOption.getOrElse(column).toLowerCase
    token.length > 2 && token.endsWith("s") &&
      !token.endsWith("ss") && !token.endsWith("us") && !token.endsWith("is")
  }
}
