package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MlBridgeSpec extends SparkSpec {
  import spark.implicits._

  private val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (2.0, 3.0), (4.0, 1.0))
  private def linDf = pts.map { case (x1, x2) => (Array(x1, x2), 2 * x1 - 3 * x2 + 5) }
    .toDF("feat", "y")

  test("fitLinearDecoderML recovers an exact linear relationship (OLS)") {
    val (w, b) = MlBridge.fitLinearDecoderML(linDf, "feat", "y", regParam = 0.0)
    assert(math.abs(w(0) - 2.0) < 1e-6 && math.abs(w(1) + 3.0) < 1e-6)
    assert(math.abs(b - 5.0) < 1e-6)
  }

  test("MLlib and closed-form paths agree exactly at regParam 0 (OLS)") {
    // at zero regularization both minimize the identical OLS objective —
    // agreement must be coefficient-for-coefficient
    val rnd = new scala.util.Random(11)
    val noisy = (0 until 50).map { _ =>
      val (x1, x2) = (rnd.nextGaussian() * 3, rnd.nextGaussian() * 3)
      (Array(x1, x2), 2 * x1 - 3 * x2 + 5 + rnd.nextGaussian())
    }.toDF("feat", "y")
    val (wc, bc) = Blueprint.fitLinearDecoder(noisy, "feat", "y", dim = 2, lambda = 0.0)
    val (wm, bm) = MlBridge.fitLinearDecoderML(noisy, "feat", "y", regParam = 0.0)
    wc.zip(wm).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, s"$a vs $b") }
    assert(math.abs(bc - bm) < 1e-6, s"bias $bc vs $bm")
    // with regularization the CONVENTIONS differ (MLlib scales the penalty
    // by mean-loss + label std, glmnet-style) — pin the qualitative
    // contract instead: more regParam shrinks weights monotonically
    val norms = Seq(0.0, 1.0, 10.0).map { r =>
      val (w, _) = MlBridge.fitLinearDecoderML(noisy, "feat", "y", regParam = r)
      math.sqrt(w.map(x => x * x).sum)
    }
    assert(norms(0) > norms(1) && norms(1) > norms(2), s"no shrinkage: $norms")
  }

  test("multinomial logistic readout classifies separable clusters via decodeClasses") {
    val rows = Seq(
      (Array(5.0, 0.0), 0.0), (Array(6.0, 1.0), 0.0), (Array(4.0, 0.5), 0.0),
      (Array(0.0, 5.0), 1.0), (Array(1.0, 6.0), 1.0), (Array(0.5, 4.0), 1.0),
      (Array(-5.0, -5.0), 2.0), (Array(-4.0, -6.0), 2.0), (Array(-6.0, -4.0), 2.0))
    val df = rows.toDF("feat", "label")
    val fits = MlBridge.fitLogisticDecoderML(df, "feat", "label", numClasses = 3,
      regParam = 0.01)
    assert(fits.length == 3)
    val preds = Blueprint.decodeClasses(
        df.withColumn("id", monotonically_increasing_id()),
        fits.map(_._1), fits.map(_._2))
      .select("pred").as[Long].collect()
    assert(preds.toSeq == rows.map(_._2.toLong))
  }

  test("withVector produces an MLlib vector column without a UDF") {
    val df = MlBridge.withVector(linDf, "feat")
    assert(df.schema("features").dataType.typeName == "vector")
    // array_to_vector is an expression, not a Scala UDF wrapper
    assert(!df.queryExecution.executedPlan.toString.contains("BatchEvalPython"))
  }
}
