package graft.schema

/** Semantic column types ("what the column means to the pipeline", distinct
  * from the physical Spark type).
  *
  * Mirrors the reference's semantic type system
  * (reference: db_transformer/schema/columns.py:21-92): each column of every
  * table is classified into one of eight semantic kinds, each carrying a
  * `key` flag (participation in the table's primary key) and, for
  * categoricals, the NULL-inclusive cardinality observed in the data.
  *
  * In Spark these survive through Catalyst plans by being stored as JSON in
  * `StructField.metadata` (see [[ColumnDefMeta]]).
  */
sealed trait ColumnDef extends Serializable {
  /** True iff the column is part of the table's primary key. */
  def key: Boolean

  /** Stable discriminator used by the JSON serde. */
  def typeName: String
}

/** Enum-like data regardless of physical type; `card` is the NULL-inclusive
  * distinct-value count (reference: db_transformer/schema/columns.py:32-41).
  */
final case class CategoricalColumnDef(card: Int, key: Boolean = false) extends ColumnDef {
  val typeName = "categorical"
}

/** Numeric feature used as-is (columns.py:44-52). */
final case class NumericColumnDef(key: Boolean = false) extends ColumnDef {
  val typeName = "numeric"
}

/** Calendar date (columns.py:55-58). */
final case class DateColumnDef(key: Boolean = false) extends ColumnDef {
  val typeName = "date"
}

/** Timestamp (columns.py:61-64). */
final case class DateTimeColumnDef(key: Boolean = false) extends ColumnDef {
  val typeName = "datetime"
}

/** Interval / duration (columns.py:67-70). */
final case class DurationColumnDef(key: Boolean = false) extends ColumnDef {
  val typeName = "duration"
}

/** Time-of-day (columns.py:73-76). Spark has no TIME type; physically this
  * is a string or seconds-since-midnight integer. */
final case class TimeColumnDef(key: Boolean = false) extends ColumnDef {
  val typeName = "time"
}

/** Free text, to be embedded (columns.py:79-82). */
final case class TextColumnDef(key: Boolean = false) extends ColumnDef {
  val typeName = "text"
}

/** Excluded from ML features: ids, FK columns, all-NULL, unclassifiable
  * (columns.py:85-92). */
final case class OmitColumnDef(key: Boolean = false) extends ColumnDef {
  val typeName = "omit"
}

object ColumnDef {
  /** All discriminator names, in the reference's declaration order. */
  val typeNames: Seq[String] =
    Seq("categorical", "numeric", "date", "datetime", "duration", "time", "text", "omit")
}
