package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  private def nodes = Seq(
    (1L, Array(1.0, 10.0)),
    (2L, Array(2.0, 20.0)),
    (3L, Array(3.0, 30.0))).toDF("id", "feat")

  private def edges = Seq(
    (1L, 100L), (2L, 100L), (3L, 100L),
    (1L, 200L)).toDF("src_id", "dst_id")

  private def collectFeat(aggr: String): Map[Long, Seq[Double]] =
    VectorAgg.propagate(nodes, edges, "id", "feat", aggr)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap

  test("propagate sum/mean/min/max/cat reduce per destination") {
    assert(collectFeat("sum") == Map(100L -> Seq(6.0, 60.0), 200L -> Seq(1.0, 10.0)))
    assert(collectFeat("mean") == Map(100L -> Seq(2.0, 20.0), 200L -> Seq(1.0, 10.0)))
    assert(collectFeat("min") == Map(100L -> Seq(1.0, 10.0), 200L -> Seq(1.0, 10.0)))
    assert(collectFeat("max") == Map(100L -> Seq(3.0, 30.0), 200L -> Seq(1.0, 10.0)))
    val cat = collectFeat("cat")
    assert(cat(100L).sorted == Seq(1.0, 2.0, 3.0, 10.0, 20.0, 30.0).sorted && cat(200L) == Seq(1.0, 10.0))
  }

  test("vector aggregators merge empty partitions and reject ragged input") {
    val df = Seq(Array(1.0, 2.0), Array(3.0)).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(VectorAgg.vecSum(col("v"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("softmaxAggregate: softmax-weighted sum per group, numerically stable") {
    val df = Seq(("g", 1000.0, 1.0), ("g", 1001.0, 3.0), ("h", 0.0, 7.0))
      .toDF("k", "score", "v")
    val out = VectorAgg.softmaxAggregate(df, "k", "score", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val e = math.exp(-1.0)
    assert(math.abs(out("g") - (1.0 * e + 3.0) / (e + 1.0)) < 1e-12)
    assert(out("h") == 7.0)
  }

  test("softmaxAggregateVec: softmax-weighted VECTOR sum per group") {
    val df = Seq(
      ("g", 0.0, Array(1.0, 2.0)), ("g", 0.0, Array(3.0, 4.0)),
      ("h", 5.0, Array(7.0, 8.0)))
      .toDF("k", "score", "vec")
    val out = VectorAgg.softmaxAggregateVec(df, "k", "score", "vec")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    // equal scores -> equal weights 0.5 -> elementwise mean (exact in double)
    assert(out("g") == Seq(2.0, 3.0))
    // singleton group -> weight 1 -> its own vector
    assert(out("h") == Seq(7.0, 8.0))
  }

  test("softmaxAggregateVec is numerically stable under large scores") {
    val df = Seq(("g", 1000.0, Array(1.0)), ("g", 1001.0, Array(3.0)))
      .toDF("k", "score", "vec")
    val out = VectorAgg.softmaxAggregateVec(df, "k", "score", "vec")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    val e = math.exp(-1.0)
    assert(math.abs(out("g").head - (1.0 * e + 3.0) / (e + 1.0)) < 1e-12)
  }

  test("propagateAttention: cross-attention reduce (q=dst, k=v=src)") {
    // zero query vector -> all scores 0 -> uniform weights -> scatter-mean
    val dst = Seq((100L, Array(0.0, 0.0)), (200L, Array(0.0, 0.0))).toDF("id", "feat")
    val out = VectorAgg.propagateAttention(nodes, dst, edges, "id", "feat")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(out == Map(100L -> Seq(2.0, 20.0), 200L -> Seq(1.0, 10.0)))
    // a non-zero query weights the higher-dot message more
    val dst2 = Seq((100L, Array(1.0, 1.0))).toDF("id", "feat")
    val biased = VectorAgg.propagateAttention(nodes, dst2, edges, "id", "feat")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(biased(100L).head > 2.0 && biased(100L).head < 3.0)
  }

  test("meanOf / modeOf imputation stats") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("a", 6.0)).toDF("c", "x")
    assert(VectorAgg.meanOf(df, "x") == 3.0)
    assert(VectorAgg.modeOf(df, "c") == "a")
    // tie -> smallest value wins (deterministic)
    val tie = Seq("b", "a").toDF("c")
    assert(VectorAgg.modeOf(tie, "c") == "a")
  }
}
