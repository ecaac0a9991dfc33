package graft.pipeline

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bridge from the engine's `array<double>` feature columns to Spark MLlib
  * — the "Spark DataFrame + MLlib for relational GNN training" stack the
  * reference's north star names. Division of labor:
  *
  *  - [[Blueprint.fitLinearDecoder]] / [[Blueprint.fitClassDecoders]]:
  *    closed-form normal equations, exact, one aggregation pass — right
  *    whenever the feature dimension k is small (the k×k driver solve is
  *    free) and the loss is squared error.
  *  - this bridge: MLlib's distributed solvers — right when k is large
  *    (no k×k materialization), when the loss is not squared error
  *    (multinomial logistic), or when the caller wants MLlib's model
  *    objects (persistence, pipelines, summaries).
  *
  * Both paths consume the same (id, feat: array<double>) node frames that
  * [[Blueprint.forward]] produces and emit the same (weights, bias)
  * contract that [[Blueprint.decodeLinear]] / [[Blueprint.decodeClasses]]
  * read, so a fitted model plugs straight back into the DataFrame plan.
  */
object MlBridge {

  /** array<double> feature column → MLlib `VectorUDT` column (codegen'd
    * `array_to_vector`, no UDF). */
  def withVector(df: DataFrame, featCol: String, vecCol: String = "features"): DataFrame =
    df.withColumn(vecCol, array_to_vector(col(featCol)))

  /** Ridge/OLS via MLlib's `LinearRegression` — same (weights, bias)
    * OUTPUT contract as [[Blueprint.fitLinearDecoder]].
    *
    * Penalty convention: `regParam` is passed through with MLlib's own
    * semantics (penalty on the MEAN squared loss, label-std scaled,
    * glmnet-style) — deliberately NOT converted to the closed form's raw
    * `lambda`, because that scaling is an MLlib implementation detail that
    * has shifted across versions. At `regParam = 0` the two paths minimize
    * the identical OLS objective and agree coefficient-for-coefficient
    * (spec-pinned); with regularization, choose ONE path's convention and
    * tune against it.
    *
    * `solver = "normal"` uses distributed WeightedLeastSquares (one pass +
    * Cholesky); MLlib falls back to L-BFGS beyond its dimension limit. */
  def fitLinearDecoderML(df: DataFrame, featCol: String, yCol: String,
      regParam: Double = 0.0): (Array[Double], Double) = {
    val prepared = withVector(
      df.select(col(featCol).as(featCol), col(yCol).cast("double").as("label")), featCol)
    val model = new LinearRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setRegParam(regParam)
      .setElasticNetParam(0.0)      // pure L2 (ridge)
      .setStandardization(false)    // raw-feature ridge, like the closed form
      .setSolver("normal")
      .fit(prepared)
    (model.coefficients.toArray, model.intercept)
  }

  /** Multinomial logistic readout — the loss the closed-form path cannot
    * express. Labels are class INDICES 0..k-1 (e.g. from
    * `CategoricalCodes.encode` / factorize); returns per-class (weights,
    * bias) pluggable into [[Blueprint.decodeClasses]], whose
    * softmax-over-linear-scores IS the multinomial logistic readout. */
  def fitLogisticDecoderML(df: DataFrame, featCol: String, labelCol: String,
      numClasses: Int, regParam: Double = 0.0, maxIter: Int = 100)
      : Seq[(Array[Double], Double)] = {
    val prepared = withVector(
      df.select(col(featCol).as(featCol), col(labelCol).cast("double").as("label")), featCol)
    val model = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setFamily("multinomial")
      .setRegParam(regParam)
      .setElasticNetParam(0.0)
      .setStandardization(false)
      .setMaxIter(maxIter)
      .fit(prepared)
    val cm = model.coefficientMatrix
    val iv = model.interceptVector
    (0 until numClasses).map { c =>
      (Array.tabulate(cm.numCols)(j => cm(c, j)), iv(c))
    }
  }
}
