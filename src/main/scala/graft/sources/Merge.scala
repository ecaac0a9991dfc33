package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins upsert (the lakehouse MERGE shape, computed relationally):
  * union the current snapshot with an update batch and keep one row per
  * key — updates beat current on ties, later versions beat earlier where a
  * version column exists. One tagged union + one per-key window (single
  * shuffle on the key); at 100 TB this is the compact-on-read form — pair
  * it with partitioned/bucketed layout ([[Bucketing]]) so the shuffle
  * happens once per merge cycle, and only over affected partitions when
  * the update batch is partition-pruned.
  */
object Merge {

  /** @param current    the existing snapshot
    * @param updates    rows to insert-or-replace (same schema)
    * @param keyCols    identity columns
    * @param versionCol optional ordering column — highest version wins;
    *                   the update batch wins version ties (and everything,
    *                   when None) */
  def upsert(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
      versionCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(current.columns.sameElements(updates.columns),
      s"schemas differ: ${current.columns.toSeq} vs ${updates.columns.toSeq}")
    val tagged = current.withColumn("__src", lit(0))
      .unionAll(updates.withColumn("__src", lit(1)))
    val order = versionCol.map(v => col(v).desc).toSeq :+ col("__src").desc
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }
}
