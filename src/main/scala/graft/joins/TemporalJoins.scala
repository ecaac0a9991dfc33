package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: backward as-of join
  * and interval range join.
  *
  * Both are expressed as compositions of shuffle-bounded relational
  * operators — a sorted window over a tagged union for as-of, a bucketed
  * equi-join for range containment — never as raw inequality joins, which
  * Catalyst can only plan as broadcast-nested-loop (a cross product at
  * 100 TB). Net-new vs the reference (which has no temporal joins); the
  * as-of shape follows the classic "merge as-of" of time-series stores.
  */
object TemporalJoins {

  /** Backward (inclusive) as-of join: every left row is matched with the
    * single right row having the greatest `rightTs <= leftTs` within the
    * same key; unmatched left rows survive with NULL carried columns
    * (left-outer semantics).
    *
    * Implementation — the merge-as-of shape: union both sides tagged
    * (right=0 before left=1 at equal ts, so "at-or-before" is inclusive),
    * sort per key by (ts, side, tieBreak) in ONE window, and carry the
    * latest right payload forward with `last(ignoreNulls)`. Exactly one
    * shuffle on the key, cost O(n log n) per partition — no inequality
    * join, no per-key fan-out. The payload travels as a single struct so
    * all carried columns come from the SAME right row even when some of
    * its fields are NULL.
    *
    * Ties among right rows at equal (key, ts) resolve to the greatest
    * `tieBreak` value (sorted ascending, last wins) — pass a unique column
    * (e.g. the right row id) for fully deterministic output.
    *
    * @param carry right columns to attach to each left row; must not
    *              collide with left column names (rename beforehand)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      carry: Seq[String], tieBreak: String): DataFrame = {
    require(carry.nonEmpty, "asofJoin needs at least one carried column")
    val payload = struct((tieBreak +: carry).distinct.map(col): _*)
    val rT = right.select(col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__side"), col(tieBreak).as("__tie"), payload.as("__p"))
    val lT = left.select(col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(rT.schema("__tie").dataType).as("__tie"),
      lit(null).cast(rT.schema("__p").dataType).as("__p"),
      struct(left.columns.map(col): _*).as("__row"))
    val rT2 = rT.withColumn("__row", lit(null).cast(lT.schema("__row").dataType))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rT2.unionByName(lT)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*") +: carry.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Interval range join: points join intervals `[lo, hi)` on equal key
    * and containment, returning the matched (point, interval) pairs with
    * both sides' columns.
    *
    * Implemented as a bucketed equi-join: each interval replicates to
    * every covered bucket of width `bucketWidth`, each point maps to its
    * one bucket, the equi-join on (key, bucket) bounds the candidates, and
    * the exact containment predicate restores semantics. Candidate cost is
    * |points| + Σ ⌈interval span / bucketWidth⌉ — never a cross product.
    * Pick `bucketWidth` ≈ the typical interval length so intervals land in
    * ≤ 2 buckets; at 100 TB the (key, bucket) join shuffles like any
    * equi-join and AQE handles residual bucket skew.
    *
    * Ts columns must be non-negative numerics in a shared unit (e.g. unix
    * micros), integral or fractional; magnitudes must stay below 2^53 so
    * the bucket floor-division is exact in double (unix micros ≈ 1.7e15
    * today — comfortably inside).
    */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      pointTs: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // empty/inverted intervals can match nothing (half-open [lo, hi)) —
    // drop them BEFORE bucket expansion: Spark's sequence(a, b) generates
    // DESCENDING values for b < a, which would replicate garbage buckets.
    // The high bucket is floor(hi/b), NOT floor((hi-1)/b): subtracting one
    // "unit" is only sound for integral ts (a point at 100.2 in [0, 100.5)
    // lives in a bucket past floor(99.5/b)); the exact containment filter
    // discards the at-most-one redundant bucket this costs on boundaries
    val ivB = intervals.filter(col(hiCol) > col(loCol)).withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val ptB = points.withColumn("__bucket",
      floor(col(pointTs) / bucketWidth).cast("long"))
    ptB.join(ivB,
        ptB("__bucket") === ivB("__bucket") &&
          ptB(pointKey) === ivB(intervalKey) &&
          ptB(pointTs) >= ivB(loCol) && ptB(pointTs) < ivB(hiCol))
      .drop("__bucket")
  }
}
