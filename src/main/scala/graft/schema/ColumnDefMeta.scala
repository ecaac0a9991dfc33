package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Round-trips [[ColumnDef]]s through `StructField.metadata`, so semantic
  * column types survive inside Catalyst plans and parquet schema metadata
  * (the reference serializes them beside the data as schema.json,
  * db_transformer/schema/schema.py:79-147 — here they ALSO travel on the
  * DataFrame itself).
  */
object ColumnDefMeta {

  val MetaKey = "graft.columndef"

  def toMetadata(cd: ColumnDef, existing: Metadata = Metadata.empty): Metadata = {
    val b = new MetadataBuilder().withMetadata(existing)
    val inner = new MetadataBuilder()
      .putString("type", cd.typeName)
      .putBoolean("key", cd.key)
    cd match {
      case CategoricalColumnDef(card, _) => inner.putLong("card", card.toLong)
      case _                             => ()
    }
    b.putMetadata(MetaKey, inner.build()).build()
  }

  def fromMetadata(m: Metadata): Option[ColumnDef] = {
    if (!m.contains(MetaKey)) return None
    val inner = m.getMetadata(MetaKey)
    val key = inner.contains("key") && inner.getBoolean("key")
    Some(inner.getString("type") match {
      case "categorical" => CategoricalColumnDef(inner.getLong("card").toInt, key)
      case "numeric"     => NumericColumnDef(key)
      case "date"        => DateColumnDef(key)
      case "datetime"    => DateTimeColumnDef(key)
      case "duration"    => DurationColumnDef(key)
      case "time"        => TimeColumnDef(key)
      case "text"        => TextColumnDef(key)
      case "omit"        => OmitColumnDef(key)
      case other         => sys.error(s"Unknown ColumnDef type in metadata: $other")
    })
  }

  /** Attach a TableSchema's ColumnDefs to the matching columns. */
  def attach(df: DataFrame, ts: TableSchema): DataFrame = {
    val cols = df.columns.toSeq.map { c =>
      ts.columns.get(c) match {
        case Some(cd) => col(c).as(c, toMetadata(cd, fieldMeta(df.schema, c)))
        case None     => col(c)
      }
    }
    df.select(cols: _*)
  }

  /** Recover the ColumnDefs carried on a DataFrame's schema. */
  def recover(df: DataFrame): Map[String, ColumnDef] =
    df.schema.fields.flatMap(f => fromMetadata(f.metadata).map(f.name -> _)).toMap

  private def fieldMeta(schema: StructType, name: String): Metadata =
    schema.fields.collectFirst { case f: StructField if f.name == name => f.metadata }
      .getOrElse(Metadata.empty)
}
