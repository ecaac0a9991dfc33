package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) interleave of two long columns — the multi-dimensional
  * clustering key behind data-skipping layouts: sort a table by
  * `z(a, b)` and both `a`-range and `b`-range predicates prune files,
  * where a plain `ORDER BY a, b` only prunes on `a`.
  *
  * Bit i of each input (low `bits` bits, higher bits masked off — callers
  * bucket real values into that range first) lands at output bits `2i`
  * (left) and `2i+1` (right). Native codegen expression: a tight shift/or
  * loop in whole-stage codegen, same class as [[DotProduct]].
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits=$bits must be in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  private def interleave(x: Long, y: Long): Long = {
    val mask = (1L << bits) - 1
    val a = x & mask
    val b = y & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      val mask = (1L << bits) - 1
      s"""
        long $x = $a & ${mask}L;
        long $y = $b & ${mask}L;
        long $z = 0L;
        for (int $i = 0; $i < $bits; $i++) {
          $z |= (($x >> $i) & 1L) << (2 * $i);
          $z |= (($y >> $i) & 1L) << (2 * $i + 1);
        }
        ${ev.value} = $z;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Column entry point; numeric inputs are cast to long here. */
  def z(a: Column, b: Column, bits: Int): Column =
    GraftExprBridge.column(ZOrder2(
      GraftExprBridge.expression(a.cast("long")),
      GraftExprBridge.expression(b.cast("long")),
      bits))

  /** Rewrite a DataFrame into z-order layout: range-repartition then sort
    * within partitions by the interleaved key, so each output file covers a
    * compact rectangle of (a, b) space — min/max file statistics then prune
    * on either column. The pay-once step before writing a table that serves
    * two-dimensional point/range lookups at 100 TB. */
  def clusterBy(df: DataFrame, a: String, b: String, bits: Int,
      numPartitions: Int): DataFrame = {
    val zc = z(col(a), col(b), bits)
    df.withColumn("__z", zc)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
