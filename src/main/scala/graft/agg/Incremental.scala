package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a grouped aggregate table
  * up to date from delta batches WITHOUT re-scanning the base data
  * (the lakehouse / streaming materialized-view pattern; Spark's own
  * partial-aggregate merge semantics, lifted to a table you persist
  * between batches).
  *
  * The maintained state per group is the decomposable-aggregate tuple
  * (n, sum, min, max) per measure — every commutative monoid Spark's
  * partial aggregation itself uses, so `merge(state(A), state(B)) ==
  * state(A ∪ B)` exactly, including empty-side groups. Averages are a
  * derived column (`sum/n`), never stored. For distinct counts,
  * maintain an HLL sketch column and merge with
  * [[graft.analyze.Sketches]] (hll2) — same pattern, bounded error.
  *
  * 100 TB shape: one batch costs agg(delta) — delta-sized, map-side
  * combined — plus ONE co-partitioned full-outer join against the
  * state on the group key. Bucket the state table by the key
  * (`sources.Bucketing`) and the state side never shuffles; only the
  * (small) delta moves. Deletes/retractions: n and sum subtract
  * cleanly (merge a state whose `n`/`sum_*` columns are negated);
  * min/max do not — recompute only the groups the retraction
  * touches (they're named by the delta).
  */
object Incremental {

  /** Aggregate a batch into maintainable state: one row per key with
    * `n` plus (sum_/min_/max_) per measure. Works for the base load
    * and for every delta batch alike.
    */
  def aggState(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(measures.nonEmpty, "need at least one measure")
    val aggs = count(lit(1)).as("n") +: measures.flatMap { m =>
      Seq(sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two state tables (same keys/measures): full-outer join on
    * the key, then the monoid combine per column — counts and sums
    * add (null = absent = identity), mins/maxes take least/greatest.
    * Associative and commutative, so batches can land in any order.
    */
  def mergeState(state: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val s = state.alias("s")
    val d = delta.alias("d")
    val joinCond = keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
    val keyCols = keys.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k))
    def both(c: String, f: (Column, Column) => Column): Column =
      f(col(s"s.$c"), col(s"d.$c")).as(c)
    val nCol = both("n", (a, b) =>
      coalesce(a, lit(0L)) + coalesce(b, lit(0L)))
    val measureCols = measures.flatMap { m =>
      Seq(
        both(s"sum_$m", (a, b) => when(a.isNull, b).when(b.isNull, a)
          .otherwise(a + b)),
        both(s"min_$m", (a, b) => least(a, b)),
        both(s"max_$m", (a, b) => greatest(a, b)))
    }
    s.join(d, joinCond, "full_outer")
      .select(keyCols ++ (nCol +: measureCols): _*)
  }
}
