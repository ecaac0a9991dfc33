package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built Bloom sketch, as a native
  * codegen expression (Spark builds such filters itself for runtime join
  * pruning but exposes no public `might_contain` function — this fills
  * that gap without a black-box UDF). The sketch rides along as bytes and
  * deserializes once per executor; the probe is a branch-free bit test
  * that stays inside WholeStageCodegen.
  *
  * False positives only, never false negatives — a `false` answer is
  * definitive. That asymmetry is the whole prefilter contract: rows the
  * probe rejects can skip an expensive exact join entirely, rows it
  * accepts go on to exact verification (see
  * [[graft.dedup.Dedup.incrementalDedupBloom]]).
  *
  * String probes hash the UTF-8 bytes — bit-compatible with what
  * `DataFrameStatFunctions.bloomFilter` inserts for string columns. */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or bigint input, got ${dt.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case LongType   => bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-level probe against an already-built sketch. */
  def probe(c: Column, bloom: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    GraftExprBridge.column(
      BloomMightContain(GraftExprBridge.expression(c), bos.toByteArray))
  }
}
