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
  // Discriminated-`type` JSON format mirroring the reference's schema.json
  // (schema.py:79-147; saved/loaded at ctu_dataset.py:345-351).

  private def columnDefToJ(cd: ColumnDef): JValue = cd match {
    case CategoricalColumnDef(card, key) =>
      JObject("type" -> JString("categorical"), "key" -> JBool(key), "card" -> JInt(card))
    case other =>
      JObject("type" -> JString(other.typeName), "key" -> JBool(other.key))
  }

  private def columnDefFromJ(j: JValue): ColumnDef = {
    val key = (j \ "key") match { case JBool(b) => b; case _ => false }
    (j \ "type") match {
      case JString("categorical") =>
        val card = (j \ "card") match {
          case JInt(c) => c.toInt
          case other   => sys.error(s"categorical missing card: $other")
        }
        CategoricalColumnDef(card, key)
      case JString("numeric")  => NumericColumnDef(key)
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
      t -> JObject(
        "columns" -> JObject(ts.columns.toList.map { case (c, cd) => c -> columnDefToJ(cd) }),
        "foreign_keys" -> JArray(ts.foreignKeys.map(fkToJ).toList))
    })
    JsonMethods.compact(JsonMethods.render(obj))
  }

  def fromJson(json: String): Schema = {
    val root = JsonMethods.parse(json) match {
      case JObject(fields) => fields
      case o               => sys.error(s"Schema JSON must be an object, got $o")
    }
    Schema(ListMap(root.map { case (t, tj) =>
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
