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
    *                   when None). Duplicate keys WITHIN the update batch
    *                   that still tie after (version, batch) resolve by
    *                   greatest remaining-column content — deterministic
    *                   under any partitioning, instead of
    *                   whichever-row-shuffled-first (only fully-identical
    *                   rows remain tied, where the choice is immaterial).
    *                   Unorderable column types (maps) skip this tiebreak. */
  def upsert(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
      versionCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(current.columns.sameElements(updates.columns),
      s"schemas differ: ${current.columns.toSeq} vs ${updates.columns.toSeq}")
    val tagged = current.withColumn("__src", lit(0))
      .unionAll(updates.withColumn("__src", lit(1)))
    val others = current.columns
      .filterNot(c => keyCols.contains(c) || versionCol.contains(c))
    val contentTiebreak =
      if (others.nonEmpty && others.forall(c =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(current.schema(c).dataType)))
        Seq(struct(others.map(col): _*).desc)
      else Seq.empty
    val order = versionCol.map(v => col(v).desc).toSeq ++
      (col("__src").desc +: contentTiebreak)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Snapshot diff — the data-versioning audit between two versions of a
    * table (what a lakehouse "table history" view computes): every key
    * classified `added` / `removed` / `changed` / `unchanged` by one
    * full-outer join on the key with null-safe struct comparison of the
    * non-key columns. Shuffles only on the key, classification is one
    * codegen expression; at 100 TB this is THE cheap way to answer "what
    * did yesterday's load actually do" without replaying the load.
    *
    * @return one row per key present in either snapshot: (keys…, change) */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"snapshots must share a schema: ${oldDf.columns.toSeq} vs " +
        s"${newDf.columns.toSeq} (align with Ingest.readEvolved first)")
    val others = oldDf.columns.filterNot(keyCols.contains).toSeq
    require(others.nonEmpty, "need at least one non-key column to compare")
    def packed(df: DataFrame, as: String) = df.select(
      keyCols.map(col) :+ struct(others.map(col): _*).as(as): _*)
    packed(oldDf, "__o").join(packed(newDf, "__n"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(col("__o") <=> col("__n"), "unchanged")
          .otherwise("changed").as("change"): _*)
  }
}
