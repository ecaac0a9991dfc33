package graft.analyze

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("welchTTest matches the hand-computed statistic") {
    // group A: 1,2,3 (mean 2, var 1); group B: 4,6 (mean 5, var 2)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 6.0),
      ("c", 99.0)) // other groups must be ignored
      .toDF("g", "x")
    val r = Stats.welchTTest(df, "g", "x", "a", "b").collect()(0)
    assert(r.getLong(r.fieldIndex("n1")) == 3L)
    assert(r.getLong(r.fieldIndex("n2")) == 2L)
    assert(r.getDouble(r.fieldIndex("mean1")) == 2.0)
    assert(r.getDouble(r.fieldIndex("mean2")) == 5.0)
    // se = 1/3 + 2/2 = 4/3; t = -3/sqrt(4/3); df = (4/3)^2/((1/3)^2/2 + 1^2/1)
    val t = -3.0 / math.sqrt(4.0 / 3.0)
    val dfW = math.pow(4.0 / 3.0, 2) / ((1.0 / 9.0) / 2.0 + 1.0)
    assert(math.abs(r.getDouble(r.fieldIndex("t_stat")) - t) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("df")) - dfW) < 1e-6)
  }

  test("chiSquareIndependence: zero on an exactly independent table, hand value otherwise") {
    // perfectly independent 2x2: counts proportional to row*col margins
    val indep = Seq.fill(4)(("x", "u")) ++ Seq.fill(4)(("x", "v")) ++
      Seq.fill(2)(("y", "u")) ++ Seq.fill(2)(("y", "v"))
    val r0 = Stats.chiSquareIndependence(indep.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(r0.getLong(r0.fieldIndex("n_cells")) == 4L)
    assert(r0.getLong(r0.fieldIndex("dof")) == 1L)
    assert(r0.getDouble(r0.fieldIndex("chi2")) == 0.0)
    // classic 2x2: cells (10,20 / 30,40); chi2 = 100/21*... hand: n=100,
    // e11=12, e12=18, e21=28, e22=42 -> sum((o-e)^2/e) = 4/12+4/18+4/28+4/42
    val dep = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(40)(("y", "v"))
    val r1 = Stats.chiSquareIndependence(dep.toDF("a", "b"), "a", "b")
      .collect()(0)
    val expected = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    assert(math.abs(r1.getDouble(r1.fieldIndex("chi2")) - expected) < 1e-6)
  }

  test("chiSquareIndependence: a never-observed cell still contributes its expected count") {
    // sparse 2x2: (x,v) never occurs. Full grid: t=10, ra=(x:4, y:6),
    // cb=(u:7, v:3); e(x,u)=2.8 e(x,v)=1.2 e(y,u)=4.2 e(y,v)=1.8;
    // chi2 = (4-2.8)²/2.8 + (0-1.2)²/1.2 + (3-4.2)²/4.2 + (3-1.8)²/1.8
    // — the (0−e)²/e = 1.2 term is what the observed-cells-only form
    // silently dropped (ADVICE r13), with dof still claiming the grid.
    val sparse = Seq.fill(4)(("x", "u")) ++
      Seq.fill(3)(("y", "u")) ++ Seq.fill(3)(("y", "v"))
    val r = Stats.chiSquareIndependence(sparse.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_cells")) == 4L, "full ka*kb grid")
    assert(r.getLong(r.fieldIndex("dof")) == 1L)
    val expected = math.pow(4 - 2.8, 2) / 2.8 + math.pow(0 - 1.2, 2) / 1.2 +
      math.pow(3 - 4.2, 2) / 4.2 + math.pow(3 - 1.8, 2) / 1.8
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) - expected) < 1e-6)
  }

  test("welchTTest fails loudly on an absent or single-row group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0)).toDF("g", "x")
    // absent group (the typo case): no silent zero-row result
    val eAbsent = intercept[IllegalArgumentException] {
      Stats.welchTTest(df, "g", "x", "a", "zzz")
    }
    assert(eAbsent.getMessage.contains("zzz"))
    // single-row group: sample variance undefined
    val eSingle = intercept[IllegalArgumentException] {
      Stats.welchTTest(df, "g", "x", "a", "b")
    }
    assert(eSingle.getMessage.contains("'b'"))
  }

  test("covarianceMatrix is complete-case: null rows drop from n AND the sums") {
    // same points as above plus a row with a null in x1 — the null row
    // must not deflate the means (n counted it while the sums skipped it)
    val pts: Seq[(Double, Option[Double])] = Seq((0.0, Some(0.0)),
      (1.0, Some(1.2)), (2.0, Some(1.8)), (3.0, Some(3.1)),
      (4.0, Some(4.0)), (5.0, Some(4.9)), (99.0, None))
    val df = pts.toDF("x0", "x1")
    val (n, m, cov) = Stats.covarianceMatrix(df, Seq("x0", "x1"))
    assert(n == 6.0, s"null row excluded from n, got $n")
    assert(math.abs(m(0) - 2.5) < 1e-12, "mean over complete rows only")
    val clean = pts.collect { case (a, Some(b)) => (a, b) }
    val mx = clean.map(_._1).sum / 6; val my = clean.map(_._2).sum / 6
    val cxy = clean.map { case (a, b) => (a - mx) * (b - my) }.sum / 6
    assert(math.abs(cov(0)(1) - cxy) < 1e-9)
  }

  test("benford: exact digit extraction, ratios, and non-positive exclusion") {
    import org.apache.spark.sql.functions.col
    // leading digits: 1 (x3), 2 (x1), 9 (x1); zero and negative excluded
    val df = Seq(123L, 1L, 19999L, 2L, 9L, 0L, -5L).toDF("v")
    val rows = Stats.benford(df, col("v")).collect()
    val byDigit = rows.map(r => r.getInt(0) -> r).toMap
    assert(byDigit.keySet == Set(1, 2, 9))
    assert(byDigit(1).getLong(1) == 3L)
    assert(byDigit(1).getDouble(2) == 0.6)
    assert(math.abs(byDigit(1).getDouble(3) - math.log10(2.0)) < 1e-6)
    assert(math.abs(byDigit(9).getDouble(3) - math.log10(10.0 / 9)) < 1e-6)
  }

  test("covarianceMatrix + topComponent recover a planted dominant direction") {
    // points along (1, 1)/sqrt(2) with small orthogonal noise: the top
    // component must align with the diagonal and carry most variance
    val pts = Seq((0.0, 0.0), (1.0, 1.2), (2.0, 1.8), (3.0, 3.1),
      (4.0, 4.0), (5.0, 4.9))
    val df = pts.toDF("x0", "x1")
    val (n, m, cov) = Stats.covarianceMatrix(df, Seq("x0", "x1"))
    assert(n == 6.0)
    assert(math.abs(m(0) - 2.5) < 1e-12)
    assert(cov(0)(1) == cov(1)(0))
    val (lambda, v) = Stats.topComponent(cov, iters = 20)
    assert(v(0) > 0) // sign fixed
    assert(math.abs(v(0) - v(1)) < 0.05, s"diagonal direction, got ${v.toSeq}")
    assert(math.abs(v(0) * v(0) + v(1) * v(1) - 1.0) < 1e-12) // unit norm
    // Rayleigh eigenvalue ~ total variance along the diagonal
    assert(lambda > cov(0)(0), "dominant eigenvalue exceeds marginal variance")
    // hand check on a diagonal matrix: top component is the larger axis
    val (l2, v2) = Stats.topComponent(Array(Array(4.0, 0.0), Array(0.0, 1.0)),
      iters = 30)
    assert(math.abs(l2 - 4.0) < 1e-9)
    assert(math.abs(math.abs(v2(0)) - 1.0) < 1e-9)
    intercept[IllegalArgumentException] { Stats.topComponent(cov, iters = 0) }
  }

  test("cuped: hand-computed theta/variances; perfect covariate removes ALL variance") {
    import spark.implicits._
    // y = 2x exactly -> theta = 2, var_cuped = 0, reduction 100%
    val perfect = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0))
      .toDF("x", "y")
    val p = Stats.cuped(perfect, "x", "y").head()
    assert(p.getLong(0) == 4L)
    assert(p.getDouble(p.fieldIndex("theta")) == 2.0)
    assert(p.getDouble(p.fieldIndex("var_cuped")) == 0.0)
    assert(p.getDouble(p.fieldIndex("reduction_pct")) == 100.0)
    // hand case: x=(0,2), y=(1,3): cov=1, var_x=1 -> theta=1;
    // var_y=1, var_cuped = 1 - 1/1 = 0 (y = x + 1 is also exact)
    val h = Stats.cuped(Seq((0.0, 1.0), (2.0, 3.0)).toDF("x", "y"), "x", "y").head()
    assert(h.getDouble(h.fieldIndex("theta")) == 1.0)
    // independent covariate: x constant-ish pattern orthogonal to y ->
    // theta ~ 0 and no reduction
    val ind = Seq((1.0, 5.0), (2.0, 5.0), (1.0, 9.0), (2.0, 9.0)).toDF("x", "y")
    val i = Stats.cuped(ind, "x", "y").head()
    assert(i.getDouble(i.fieldIndex("theta")) == 0.0)
    assert(i.getDouble(i.fieldIndex("var_y")) ==
      i.getDouble(i.fieldIndex("var_cuped")))
    assert(i.getDouble(i.fieldIndex("reduction_pct")) == 0.0)
  }

  test("ksTest: identical samples give D=0; disjoint supports give D=1; hand case checks") {
    import spark.implicits._
    val same = (1 to 20).flatMap(i => Seq(("a", i % 5), ("b", i % 5)))
      .toDF("g", "v")
    val s0 = Stats.ksTest(same, "g", "v", "a", "b").head()
    assert(s0.getDouble(s0.fieldIndex("d_stat")) == 0.0)
    val disjoint = (Seq.fill(4)(("a", 1)) ++ Seq.fill(6)(("b", 9)))
      .toDF("g", "v")
    val s1 = Stats.ksTest(disjoint, "g", "v", "a", "b").head()
    assert(s1.getDouble(s1.fieldIndex("d_stat")) == 1.0)
    // hand case: a = {1,2}, b = {2,3}: gaps at v=1: |1/2-0|=0.5,
    // v=2: |1-1/2|=0.5, v=3: 0 -> D = 0.5
    val h = Stats.ksTest(Seq(("a", 1), ("a", 2), ("b", 2), ("b", 3))
      .toDF("g", "v"), "g", "v", "a", "b").head()
    assert(h.getLong(0) == 2L && h.getLong(1) == 2L)
    assert(h.getDouble(h.fieldIndex("d_stat")) == 0.5)
    assert(math.abs(h.getDouble(h.fieldIndex("lambda")) - 0.5 * math.sqrt(1.0)) < 1e-12)
    // absent group fails loudly
    val e = intercept[IllegalArgumentException] {
      Stats.ksTest(same, "g", "v", "a", "zz")
    }
    assert(e.getMessage.contains("has no rows"))
  }

  test("cuped: adjustment never increases variance (reduction >= 0 on real data)") {
    import spark.implicits._
    val df = (1 to 500).map { k =>
      val x = (k % 37).toDouble
      (x, 3.0 * x + (k % 11).toDouble)
    }.toDF("x", "y")
    val r = Stats.cuped(df, "x", "y").head()
    assert(r.getDouble(r.fieldIndex("var_cuped")) <=
      r.getDouble(r.fieldIndex("var_y")))
    assert(r.getDouble(r.fieldIndex("reduction_pct")) > 50.0,
      "a strongly predictive covariate must remove most of the variance")
  }
}
