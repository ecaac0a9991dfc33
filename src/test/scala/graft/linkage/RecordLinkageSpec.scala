package graft.linkage

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.linkage.RecordLinkage.FsParams

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala EM step over 2-field gamma vectors — the
    * reference implementation the distributed pass must reproduce. */
  private def emOnce(gs: Seq[(Int, Int)], p: FsParams): FsParams = {
    val ws = gs.map { case (g1, g2) =>
      val num = (if (g1 == 1) p.m(0) else 1 - p.m(0)) *
        (if (g2 == 1) p.m(1) else 1 - p.m(1)) * p.lambda
      val alt = (if (g1 == 1) p.u(0) else 1 - p.u(0)) *
        (if (g2 == 1) p.u(1) else 1 - p.u(1)) * (1 - p.lambda)
      num / (num + alt)
    }
    val sw = ws.sum; val n = gs.size.toDouble
    FsParams(
      Array(ws.zip(gs).map { case (w, g) => w * g._1 }.sum / sw,
        ws.zip(gs).map { case (w, g) => w * g._2 }.sum / sw),
      Array(ws.zip(gs).map { case (w, g) => (1 - w) * g._1 }.sum / (n - sw),
        ws.zip(gs).map { case (w, g) => (1 - w) * g._2 }.sum / (n - sw)),
      sw / n)
  }

  private val init = FsParams(Array(0.9, 0.9), Array(0.1, 0.1), 0.2)

  test("emFit reproduces a by-hand EM step, and two steps compose") {
    val gs = Seq((1, 1), (1, 1), (1, 0), (0, 0), (0, 0), (0, 1), (1, 0), (0, 0))
    val df = gs.toDF("g1", "g2")
    val one = RecordLinkage.emFit(df, Seq("g1", "g2"), iters = 1, init)
    val ref1 = emOnce(gs, init)
    def close(a: Array[Double], b: Array[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-12 }
    assert(close(one.m, ref1.m) && close(one.u, ref1.u) &&
      math.abs(one.lambda - ref1.lambda) < 1e-12)
    val two = RecordLinkage.emFit(df, Seq("g1", "g2"), iters = 2, init)
    val ref2 = emOnce(gs, ref1)
    assert(close(two.m, ref2.m) && close(two.u, ref2.u) &&
      math.abs(two.lambda - ref2.lambda) < 1e-12,
      "iteration 2 must consume iteration 1's parameters")
  }

  test("EM separates planted duplicates: m rises, u falls, posteriors split") {
    // 20 true-duplicate pairs agree on both fields; 180 random pairs
    // agree on a field with probability ~0.1 (deterministic pattern).
    val dups = Seq.fill(20)((1, 1))
    val rest = (0 until 180).map(i => (if (i % 10 == 0) 1 else 0,
      if (i % 9 == 0) 1 else 0))
    val df = (dups ++ rest).toDF("g1", "g2")
    val fit = RecordLinkage.emFit(df, Seq("g1", "g2"), iters = 10, init)
    assert(fit.m.forall(_ > 0.7), s"m should approach the dup agreement rate")
    assert(fit.u.forall(_ < 0.2), s"u should approach the background rate")
    val scored = RecordLinkage.score(df, Seq("g1", "g2"), fit)
    val pBoth = scored.filter(col("g1") === 1 && col("g2") === 1)
      .agg(min("posterior")).head().getDouble(0)
    val pNone = scored.filter(col("g1") === 0 && col("g2") === 0)
      .agg(max("posterior")).head().getDouble(0)
    assert(pBoth > 0.9 && pNone < 0.1,
      "full agreement must score near 1, full disagreement near 0")
  }

  test("score: match_weight is the exact sum of per-field log2 ratios") {
    val p = FsParams(Array(0.8, 0.6), Array(0.2, 0.3), 0.5)
    val got = RecordLinkage.score(Seq((1, 0)).toDF("g1", "g2"),
      Seq("g1", "g2"), p).select("match_weight").head().getDouble(0)
    val expect = math.log(0.8 / 0.2) / math.log(2.0) +
      math.log((1 - 0.6) / (1 - 0.3)) / math.log(2.0)
    assert(math.abs(got - expect) < 1e-12)
  }

  test("empty or degenerate input fails loudly instead of emitting NaN parameters") {
    val df = Seq((1, 1), (1, 1), (1, 1)).toDF("g1", "g2")
    val empty = intercept[IllegalArgumentException] {
      RecordLinkage.emFit(df.filter(col("g1") === 0), Seq("g1", "g2"), 1, init)
    }
    assert(empty.getMessage.contains("empty pair set"))
  }
}
