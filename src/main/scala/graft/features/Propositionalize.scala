package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.{CategoricalColumnDef, ForeignKeyDef, NumericColumnDef, Schema}

/** Propositionalization — automatic per-FK aggregate feature synthesis,
  * the engine's restatement of the reference's strongest non-GNN baseline
  * (reference: experiments/getml_xgboost.py:420-449 wires a FastProp
  * feature learner over the BFS-discovered FK data model): for every
  * foreign key and every selected child column, emit the classic
  * aggregate battery per parent key — `count` of children, then
  * `sum/mean/min/max` per numeric column and the `mode` per categorical
  * column — joined back onto the parent table. The one-call "featurize
  * this schema" operator a tabular-ML user reaches for first.
  *
  * Scale shape: the whole numeric battery for one FK is ONE
  * partial-aggregating shuffle on the FK columns (map-side combine makes
  * the shuffled payload one row per child-side key, a few doubles wide,
  * regardless of how many aggregate columns are requested). Each
  * categorical mode adds one (key, category) aggregate plus a top-1
  * window — the [[graft.analyze]] grouped-mode device, deterministic via
  * the (count desc, value asc) total order. The final attach is an
  * equi-join on the parent key; NULL or dangling child FKs match no
  * parent and contribute nothing (the P8 edge-skip semantics). Childless
  * parents keep a 0 count and NULL stats — "no children" stays
  * distinguishable from "children summing to zero".
  *
  * Multi-hop FK paths (the reference runs FastProp over the
  * BFS-discovered data model to `max_depth`, getml_xgboost.py:420): this
  * operator COMPOSES — featurize the innermost table first, then pass
  * the enriched middle table as the next hop's child, and the hop-2
  * battery synthesizes aggregate-of-aggregate features ("mean over
  * orders of the per-order lineitem quantity sum"). Each hop is one more
  * aggregate pass; the registered `fp2_propositionalize_deep` is the
  * worked customer ← orders ← lineitem example.
  */
object Propositionalize {

  /** Aggregate-feature battery for ONE foreign key, attached to `parent`.
    *
    * @param parent      parent table (must contain `fk.refColumns`)
    * @param child       child table (must contain `fk.columns`)
    * @param fk          child→parent key mapping (composite keys supported)
    * @param numericCols child columns for the sum/mean/min/max battery
    * @param catCols     child columns for the per-key mode
    * @param prefix      feature-name prefix, e.g. the child table name:
    *                    `<prefix>_n`, `<prefix>_<col>_sum`, …
    */
  def features(parent: DataFrame, child: DataFrame, fk: ForeignKeyDef,
      numericCols: Seq[String], catCols: Seq[String] = Nil,
      prefix: String = "c"): DataFrame = {
    require(prefix.nonEmpty, "feature prefix must be non-empty")
    require((numericCols ++ catCols).forall(c => !fk.columns.contains(c)),
      "key columns cannot be featurized (they are the group, not the value)")
    val keyCols = fk.columns.map(col)
    val numAggs: Seq[Column] =
      count(lit(1)).as(s"${prefix}_n") +:
        numericCols.flatMap { c =>
          val x = col(c).cast("double")
          Seq(sum(x).as(s"${prefix}_${c}_sum"), avg(x).as(s"${prefix}_${c}_mean"),
            min(x).as(s"${prefix}_${c}_min"), max(x).as(s"${prefix}_${c}_max"))
        }
    val battery = child.groupBy(keyCols: _*).agg(numAggs.head, numAggs.tail: _*)
    // categorical modes are BATCHED: melt the columns to (key, col, value)
    // long form, then ONE grouped count + ONE per-(key, col) top-1 window
    // + ONE pivot back — a wide categorical child table costs a constant
    // number of shuffles, not one groupBy+window+join per column. Columns
    // are melted per VALUE TYPE (the struct array must be uniform), which
    // also preserves each column's native type and its native-order
    // (count desc, value asc) tie-break — string-casting everything would
    // reorder numeric ties ("10" < "2") and change the output type.
    val typeGroups = catCols.groupBy(c => child.schema(c).dataType).values.toSeq
      .sortBy(_.head) // deterministic pass order
    val withModes = typeGroups.foldLeft(battery) { (acc, cols) =>
      val modes =
        if (cols.sizeIs == 1) {
          // a lone column needs no melt: the direct grouped count + top-1
          // window is one exchange cheaper than count+window+pivot
          val c = cols.head
          val counted = child.filter(col(c).isNotNull)
            .groupBy(keyCols :+ col(c): _*).agg(count(lit(1)).as("__c"))
          val w = Window.partitionBy(keyCols: _*).orderBy(col("__c").desc, col(c))
          counted.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .select(keyCols :+ col(c).as(s"${prefix}_${c}_mode"): _*)
        } else {
          val melted = child.select(keyCols :+ explode(array(cols.map(c =>
              struct(lit(c).as("__col"), col(c).as("__val"))): _*)).as("__cv"): _*)
            .select(keyCols ++ Seq(col("__cv.__col").as("__col"),
              col("__cv.__val").as("__val")): _*)
            .filter(col("__val").isNotNull)
          val counted = melted
            .groupBy(keyCols ++ Seq(col("__col"), col("__val")): _*)
            .agg(count(lit(1)).as("__c"))
          val w = Window.partitionBy(keyCols :+ col("__col"): _*)
            .orderBy(col("__c").desc, col("__val"))
          val pivoted = counted.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .groupBy(keyCols: _*)
            .pivot("__col", cols) // bounded: the caller's column list
            .agg(first(col("__val")))
          cols.foldLeft(pivoted)(
            (df, c) => df.withColumnRenamed(c, s"${prefix}_${c}_mode"))
        }
      acc.join(modes, fk.columns, "left")
    }
    // rename child keys to the parent's and attach; childless parents
    // keep count 0 and NULL stats
    val renamed = fk.columns.zip(fk.refColumns).foldLeft(withModes) {
      case (df, (c, r)) => df.withColumnRenamed(c, r)
    }
    parent.join(renamed, fk.refColumns, "left")
      .withColumn(s"${prefix}_n", coalesce(col(s"${prefix}_n"), lit(0L)))
  }

  /** Schema-driven column selection: featurize every non-key
    * [[NumericColumnDef]] and [[CategoricalColumnDef]] column of
    * `childName` that does not participate in the FK — the ColumnDef
    * semantic layer (db_transformer/schema/columns.py:21-92) decides,
    * not the physical Spark types, so id-like integers marked omit/key
    * never leak into the feature set. */
  def featuresFor(schema: Schema, childName: String, parent: DataFrame,
      child: DataFrame, fk: ForeignKeyDef): DataFrame = {
    val ts = schema.tables(childName)
    val numeric = ts.columns.collect {
      case (n, NumericColumnDef(false)) if !fk.columns.contains(n) => n
    }.toSeq
    val cats = ts.columns.collect {
      case (n, CategoricalColumnDef(_, false)) if !fk.columns.contains(n) => n
    }.toSeq
    features(parent, child, fk, numeric, cats, prefix = childName)
  }
}
