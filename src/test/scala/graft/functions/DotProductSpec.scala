package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Similarity

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot equals the HOF fold bit-for-bit, including float casts") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.125f))).toDF("a", "b")
    val rows = df.select(
      DotProduct.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("null array -> null; null element -> null (matches zip_with propagation)") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0), Some(1.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(1.0))))).toDF("a", "b")
    val out = df.select(DotProduct.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("participates in whole-stage codegen over a real scan") {
    val df = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(DotProduct.dot(col("embedding"), col("embedding")).as("d"))
    // the "*(n)" prefix marks a WholeStageCodegen stage in the plan string
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [graft_dot"))
    // and it actually computes: self-dot is the squared norm, positive
    val v = df.limit(3).as[Double].collect()
    assert(v.forall(_ > 0.0))
  }
}
