package graft.analyze

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  // 1..100 in two columns: quantile_cont(p) over 1..n = 1 + p*(n-1)
  private def df = (1 to 100).map(i => (i.toDouble, (i * 2).toDouble)).toDF("x", "y")

  test("exact matches the linear-interpolation definition") {
    val out = Quantiles.exact(df, Seq("x", "y"), Seq(0.0, 0.25, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("x", 0.0)) == 1.0)
    assert(out(("x", 0.25)) == 1 + 0.25 * 99)   // 25.75
    assert(out(("x", 0.5)) == 50.5)
    assert(out(("x", 1.0)) == 100.0)
    assert(out(("y", 0.5)) == 101.0)
  }

  test("approx tracks exact within coarse rank error") {
    val exact = Quantiles.exact(df, Seq("x"), Seq(0.5)).collect().head.getDouble(2)
    val approx = Quantiles.approx(df, Seq("x"), Seq(0.5)).collect().head.getDouble(2)
    assert(math.abs(exact - approx) <= 1.0) // GK returns an actual element near the median
  }

  test("long-form output is (col, p, q) per column x percentile") {
    val out = Quantiles.exact(df, Seq("x", "y"), Seq(0.1, 0.9))
    assert(out.columns.toSeq == Seq("col", "p", "q"))
    assert(out.count() == 4)
  }

  test("equalFrequencyBins: even counts, ordered disjoint ranges, nulls excluded") {
    val data = ((1 to 100).map(_.toDouble) :+ Double.NaN).dropRight(1)
    val withNull = data.map(Option(_)) :+ (None: Option[Double])
    val out = Quantiles.equalFrequencyBins(withNull.toDF("x"), "x", 4)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(out.map(_._2).sum == 100) // the NULL row is excluded
    out.foreach { case (_, n, lo, hi) => assert(n == 25 && lo <= hi) }
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._4 < b._3, "disjoint ordered ranges")
      case _ =>
    }
  }

  test("hostile column names and tiny percentile literals survive") {
    // Column-based aggregates (no expr-string interpolation): a backtick in
    // the name and a 1e-4 percentile must both work.
    val weird = (1 to 100).map(_.toDouble).toDF("a`b")
    val out = Quantiles.exact(weird, Seq("a`b"), Seq(1e-4, 0.5))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(out(0.5) == 50.5)
    assert(math.abs(out(1e-4) - (1 + 1e-4 * 99)) < 1e-9)
  }

  test("winsorize clamps to rounded percentile bounds, passes the middle through") {
    // values 1..100: p10 = 10.9, p90 = 90.1 (interpolated, already 4-dec)
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val w = Quantiles.winsorize(df, "v", 0.10, 0.90)
    val rows = w.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.forall { case (_, _, lo, hi) => lo == 10.9 && hi == 90.1 })
    assert(rows.filter(_._1 <= 10).forall(_._2 == 10.9), "low tail clamped")
    assert(rows.filter(_._1 >= 91).forall(_._2 == 90.1), "high tail clamped")
    assert(rows.filter(r => r._1 > 10.9 && r._1 < 90.1).forall(r => r._2 == r._1),
      "mid-range values untouched")
    intercept[IllegalArgumentException] { Quantiles.winsorize(df, "v", 0.9, 0.1) }
  }

  test("psiDrift: identical populations score ~0, shifted ones score high") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val same = Quantiles.psiDrift(ref, ref, "v", 4).collect()
    assert(same.length == 4)
    assert(math.abs(same.map(_.getDouble(3)).sum) < 1e-9, "self-PSI ~ 0")
    assert(same.forall(r => r.getLong(1) == r.getLong(2)))
    // current population concentrated in the top quartile -> large PSI
    val cur = (751 to 1000).map(_.toDouble).toDF("v")
    val drift = Quantiles.psiDrift(ref, cur, "v", 4).collect()
    assert(drift.map(_.getDouble(3)).sum > 0.2, "shifted population must alarm")
    // empty current bins survive via the literal spine + smoothing
    assert(drift.count(_.getLong(2) == 0L) == 3)
    intercept[IllegalArgumentException] { Quantiles.psiDrift(ref, cur, "v", 1) }
  }

  test("madOutliers flags the planted spikes and nothing else") {
    // g1: 100 values near 50 plus two spikes; g2: clean uniform — median
    // and MAD ignore the spikes, so the threshold stays tight
    val g1 = (1 to 100).map(i => ("g1", 50.0 + (i % 5))) ++
      Seq(("g1", 5000.0), ("g1", -4000.0))
    val g2 = (1 to 50).map(i => ("g2", i.toDouble))
    val out = Quantiles.madOutliers((g1 ++ g2).toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
    assert(out(0).getLong(1) == 102L)
    assert(out(0).getLong(2) == 2L, "exactly the two planted spikes")
    assert(out(0).getDouble(3) > 49 && out(0).getDouble(3) < 55,
      "median unmoved by the spikes")
    assert(out(1).getLong(2) == 0L, "uniform data has no 3-sigma outliers")
    // mean/stddev would have been dragged: the spike is < 3 classic sigmas
    val (mean, n) = (g1.map(_._2).sum / g1.length, g1.length)
    val sd = math.sqrt(g1.map(x => math.pow(x._2 - mean, 2)).sum / n)
    assert(5000.0 - mean < 8 * sd && sd > 600,
      "classic z-score scale is inflated by the spikes (sanity of the fixture)")
    intercept[IllegalArgumentException] {
      Quantiles.madOutliers(g2.toDF("g", "v"), "g", "v", k = 0)
    }
  }
}
