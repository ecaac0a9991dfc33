package graft.agg

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(xs: (String, Double)*): DataFrame =
    xs.toDF("k", "v")

  private def sorted(df: DataFrame) =
    df.orderBy("k").collect().toSeq

  test("monoid law: merge(state(A), state(B)) == state(A union B)") {
    val a = rows(("x", 1.0), ("x", 5.0), ("y", -2.0))
    val b = rows(("x", 3.0), ("z", 7.0))
    val merged = Incremental.mergeState(
      Incremental.aggState(a, Seq("k"), Seq("v")),
      Incremental.aggState(b, Seq("k"), Seq("v")),
      Seq("k"), Seq("v"))
    val direct = Incremental.aggState(a.unionAll(b), Seq("k"), Seq("v"))
    assert(sorted(merged) == sorted(direct))
  }

  test("one-sided groups keep identity semantics (state-only y, delta-only z)") {
    val st = Incremental.aggState(rows(("y", 4.0)), Seq("k"), Seq("v"))
    val dl = Incremental.aggState(rows(("z", 9.0)), Seq("k"), Seq("v"))
    val m = Incremental.mergeState(st, dl, Seq("k"), Seq("v"))
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(m.toSeq == Seq(("y", 1L, 4.0, 4.0, 4.0), ("z", 1L, 9.0, 9.0, 9.0)),
      "absent side contributes the monoid identity, not nulls or zeros-as-min")
  }

  test("commutative: merge(a, b) == merge(b, a)") {
    val a = Incremental.aggState(rows(("x", 1.0), ("y", 2.0)), Seq("k"), Seq("v"))
    val b = Incremental.aggState(rows(("x", -1.0), ("w", 0.0)), Seq("k"), Seq("v"))
    assert(sorted(Incremental.mergeState(a, b, Seq("k"), Seq("v"))) ==
      sorted(Incremental.mergeState(b, a, Seq("k"), Seq("v"))))
  }

  test("retraction: a negated-count/sum state subtracts n and sum exactly") {
    val base = Incremental.aggState(
      rows(("x", 1.0), ("x", 5.0), ("x", 3.0)), Seq("k"), Seq("v"))
    val retract = Incremental.aggState(rows(("x", 5.0)), Seq("k"), Seq("v"))
      .select(col("k"), (-col("n")).as("n"),
        (-col("sum_v")).as("sum_v"), col("min_v"), col("max_v"))
    val after = Incremental.mergeState(base, retract, Seq("k"), Seq("v"))
      .select("k", "n", "sum_v").as[(String, Long, Double)].head()
    assert(after == (("x", 2L, 4.0)),
      "n and sum subtract; min/max deliberately not asserted (documented recompute)")
  }

  test("multi-measure and multi-key state carries every column") {
    val df = Seq(("a", 1, 2.0, 10.0), ("a", 1, 4.0, -1.0), ("b", 2, 0.0, 0.0))
      .toDF("k1", "k2", "u", "v")
    val st = Incremental.aggState(df, Seq("k1", "k2"), Seq("u", "v"))
    assert(st.columns.toSeq == Seq("k1", "k2", "n",
      "sum_u", "min_u", "max_u", "sum_v", "min_v", "max_v"))
    val a = st.filter(col("k1") === "a")
      .select("n", "sum_u", "min_u", "max_u", "sum_v", "min_v", "max_v")
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(a == ((2L, 6.0, 2.0, 4.0, 9.0, -1.0, 10.0)))
  }

  test("foreachBatch maintenance: streamed micro-batches converge to the batch recompute") {
    // The ivm pattern live: each micro-batch folds into the maintained
    // state via mergeState inside foreachBatch — the lakehouse
    // "maintain an aggregate table from a stream" loop.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Double)]
    var state: Option[DataFrame] = None
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = Incremental.aggState(batch, Seq("k"), Seq("v"))
        val merged = state match {
          case None => d
          case Some(st) => Incremental.mergeState(st, d, Seq("k"), Seq("v"))
        }
        // pin the merged state so the next batch folds into a stable frame
        state = Some(spark.createDataFrame(merged.collect().toList.asJava,
          merged.schema))
        ()
      }.start()
    try {
      mem.addData(("a", 1.0), ("b", 5.0))
      q.processAllAvailable()
      mem.addData(("a", 3.0), ("c", -2.0))
      q.processAllAvailable()
      mem.addData(("b", 0.0))
      q.processAllAvailable()
      val expect = Incremental.aggState(
        rows(("a", 1.0), ("b", 5.0), ("a", 3.0), ("c", -2.0), ("b", 0.0)),
        Seq("k"), Seq("v"))
      assert(sorted(state.get) == sorted(expect),
        "three maintained micro-batches must equal the one-shot recompute")
    } finally q.stop()
  }

  test("merge plan: state joins delta once, no extra shuffle beyond the key join") {
    val a = Incremental.aggState(rows(("x", 1.0)), Seq("k"), Seq("v"))
    val b = Incremental.aggState(rows(("y", 2.0)), Seq("k"), Seq("v"))
    val plan = Incremental.mergeState(a, b, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter") || plan.contains("full_outer"),
      "the combine must be ONE full-outer join on the group key")
  }
}
