package graft.schema

import scala.collection.immutable.ListMap

import org.json4s._
import org.json4s.jackson.JsonMethods

/** A foreign-key constraint: `columns` of the owning table reference
  * `refColumns` of `refTable`. Multi-column (composite) keys supported.
  * (reference: db_transformer/schema/schema.py:163-182) */
final case class ForeignKeyDef(
    columns: Seq[String],
    refTable: String,
    refColumns: Seq[String]) {
  require(columns.nonEmpty && columns.length == refColumns.length,
    s"FK arity mismatch: $columns vs $refColumns")
}

/** Schema of one table: ordered column -> semantic ColumnDef, plus the FK
  * constraints the table owns. (schema.py:185-206) */
final case class TableSchema(
    columns: ListMap[String, ColumnDef],
    foreignKeys: Seq[ForeignKeyDef] = Nil) {

  def primaryKey: Seq[String] = columns.collect { case (n, cd) if cd.key => n }.toSeq

  /** Columns that participate in at least one single-column (non-composite)
    * FK — candidates for feature omission
    * (reference: db/schema_autodetect.py:241-254). */
  def nonCompositeFkColumns: Set[String] =
    foreignKeys.filter(_.columns.length == 1).flatMap(_.columns).toSet
}

/** Whole-database schema: ordered table -> TableSchema. Spark catalogs carry
  * no PK/FK constraints, so this travels as a first-class sidecar object
  * beside the DataFrames. (schema.py:209-229) */
final case class Schema(tables: ListMap[String, TableSchema]) {
  def apply(table: String): TableSchema = tables(table)
  def get(table: String): Option[TableSchema] = tables.get(table)
  def tableNames: Seq[String] = tables.keys.toSeq

  /** All edge types `(table, fkIndex, refTable)` derived from FKs — the
    * graph's edge-type universe (reference: data/dataset.py:260-366). */
  def edgeTypes: Seq[(String, ForeignKeyDef)] =
    tables.toSeq.flatMap { case (t, ts) => ts.foreignKeys.map(t -> _) }

  def updated(table: String, ts: TableSchema): Schema = Schema(tables.updated(table, ts))
}

object Schema {
  def empty: Schema = Schema(ListMap.empty)

  // ---------------------------------------------------------------- JSON
  // The reference's schema.json WIRE FORMAT, verbatim (schema.py:79-147,
  // objectpickle.py:66-118; saved/loaded at ctu_dataset.py:345-351):
  //  - per-column objects carry the short `@named_column_def` discriminator
  //    in a "type" field ("cat", "num", "date", "datetime", "duration",
  //    "time", "text", "omit") beside the attrs state ("key", and "card"
  //    for "cat");
  //  - foreign keys are plain {"columns", "ref_table", "ref_columns"};
  //  - the top-level object carries the TypedSerializer marker
  //    `"__type": ["db_transformer.schema.schema", "Schema"]` (table
  //    entries do not — Schema.__getstate__ serializes them "simple").
  // toJson emits exactly that shape (verified against the reference's own
  // serializer output for the CiteSeer schema with its schema_fixer FKs),
  // so a schema written here loads in the reference and vice versa.
  // fromJson additionally accepts this library's pre-round-9 long names
  // ("categorical"/"numeric") so caches written by older versions load.

  /** Reference short name (`@named_column_def`, columns.py:32-85) per
    * ColumnDef; identity for all but the two abbreviated names. */
  private def wireName(cd: ColumnDef): String = cd match {
    case _: CategoricalColumnDef => "cat"
    case _: NumericColumnDef     => "num"
    case other                   => other.typeName
  }

  /** The TypedSerializer class marker the reference writes at top level. */
  private val ReferenceTypeMarker: (String, JValue) = "__type" ->
    JArray(List(JString("db_transformer.schema.schema"), JString("Schema")))

  private def columnDefToJ(cd: ColumnDef): JValue = cd match {
    case CategoricalColumnDef(card, key) =>
      // field order (key, card, type) matches the reference serializer's
      // attrs-state-then-discriminator output — cosmetic, but keeps
      // fixtures diffable against reference-produced files
      JObject("key" -> JBool(key), "card" -> JInt(card), "type" -> JString("cat"))
    case other =>
      JObject("key" -> JBool(other.key), "type" -> JString(wireName(other)))
  }

  private def columnDefFromJ(j: JValue): ColumnDef = {
    val key = (j \ "key") match { case JBool(b) => b; case _ => false }
    (j \ "type") match {
      case JString("cat") | JString("categorical") =>
        val card = (j \ "card") match {
          case JInt(c) => c.toInt
          case other   => sys.error(s"categorical missing card: $other")
        }
        CategoricalColumnDef(card, key)
      case JString("num") | JString("numeric") => NumericColumnDef(key)
      case JString("date")     => DateColumnDef(key)
      case JString("datetime") => DateTimeColumnDef(key)
      case JString("duration") => DurationColumnDef(key)
      case JString("time")     => TimeColumnDef(key)
      case JString("text")     => TextColumnDef(key)
      case JString("omit")     => OmitColumnDef(key)
      case other               => sys.error(s"Unknown ColumnDef type: $other")
    }
  }

  private def fkToJ(fk: ForeignKeyDef): JValue = JObject(
    "columns"     -> JArray(fk.columns.map(JString(_)).toList),
    "ref_table"   -> JString(fk.refTable),
    "ref_columns" -> JArray(fk.refColumns.map(JString(_)).toList))

  private def fkFromJ(j: JValue): ForeignKeyDef = {
    def strs(v: JValue): Seq[String] = v match {
      case JArray(xs) => xs.map { case JString(s) => s; case o => sys.error(s"bad fk col $o") }
      case o          => sys.error(s"bad fk columns $o")
    }
    ForeignKeyDef(strs(j \ "columns"),
      (j \ "ref_table") match { case JString(s) => s; case o => sys.error(s"bad ref_table $o") },
      strs(j \ "ref_columns"))
  }

  def toJson(schema: Schema): String = {
    val obj = JObject(schema.tables.toList.map { case (t, ts) =>
      t -> (JObject(
        "columns" -> JObject(ts.columns.toList.map { case (c, cd) => c -> columnDefToJ(cd) }),
        "foreign_keys" -> JArray(ts.foreignKeys.map(fkToJ).toList)): JValue)
    } :+ ReferenceTypeMarker)
    JsonMethods.compact(JsonMethods.render(obj))
  }

  def fromJson(json: String): Schema = {
    val root = JsonMethods.parse(json) match {
      case JObject(fields) => fields
      case o               => sys.error(s"Schema JSON must be an object, got $o")
    }
    // "__type" is the reference TypedSerializer's class marker, not a table
    Schema(ListMap(root.filterNot(_._1 == "__type").map { case (t, tj) =>
      val cols = (tj \ "columns") match {
        case JObject(cs) => ListMap(cs.map { case (c, cj) => c -> columnDefFromJ(cj) }: _*)
        case o           => sys.error(s"bad columns for $t: $o")
      }
      val fks = (tj \ "foreign_keys") match {
        case JArray(xs) => xs.map(fkFromJ)
        case JNothing   => Nil
        case o          => sys.error(s"bad foreign_keys for $t: $o")
      }
      t -> TableSchema(cols, fks)
    }: _*))
  }
}
