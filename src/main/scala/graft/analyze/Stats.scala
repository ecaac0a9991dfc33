package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inferential statistics over distributed data — the audit tests a
  * pipeline runs before trusting a data change (did the new crawl shift
  * quality scores? are two categorical columns independent? what single
  * direction explains the feature variance?). Every statistic reduces to
  * power sums / contingency counts gathered in ONE aggregation pass with
  * map-side partial aggregation, so at 100 TB each test costs one scan;
  * the closing arithmetic is driver- or single-row-side and restates in
  * SQL term for term ([[Moments]]' exact-power-sum device throughout:
  * integer-valued inputs keep every sum exact, all rounding happens in
  * one final step).
  */
object Stats {

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013, WSDM:
    * "Improving the sensitivity of online controlled experiments by
    * utilizing pre-experiment data"): adjust a per-unit metric y by its
    * pre-period covariate x — θ = cov(x,y)/var(x), ŷ = y − θ(x − x̄) —
    * the standard trick for shrinking A/B-test variance without bias.
    * ONE aggregation pass over the units (five power sums + n); the
    * population-variance convention (÷n) is used consistently in θ and
    * both reported variances, so the reduction ratio is exact. Output:
    * one row (n_units, theta, var_y, var_cuped, reduction_pct). */
  def cuped(units: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val s = units.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
    s.select(col("n").cast("bigint").as("n_units"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
         (col("sxx") - col("sx") * col("sx") / col("n"))).as("theta"),
        ((col("syy") - col("sy") * col("sy") / col("n")) / col("n")).as("var_y"),
        col("sxx"), col("sx"), col("sy"), col("syy"), col("sxy"), col("n"))
      .select(col("n_units"), col("theta"), col("var_y"),
        // var(y − θx) = var_y − 2θ·cov + θ²·var_x collapses to
        // var_y − cov²/var_x; spelled from the same sums so the
        // arithmetic is restatable term for term
        (col("var_y") -
          (col("sxy") - col("sx") * col("sy") / col("n")) *
          (col("sxy") - col("sx") * col("sy") / col("n")) /
          ((col("sxx") - col("sx") * col("sx") / col("n")) * col("n")))
          .as("var_cuped"))
      .select(col("n_units"), round(col("theta"), 6).as("theta"),
        round(col("var_y"), 4).as("var_y"),
        round(col("var_cuped"), 4).as("var_cuped"),
        round((lit(1.0) - col("var_cuped") / col("var_y")) * 100.0, 4)
          .as("reduction_pct"))
  }

  /** Two-sample Kolmogorov–Smirnov test: D = sup_x |F̂₁(x) − F̂₂(x)|
    * between the empirical CDFs of `groupCol == g1` and `== g2` rows.
    * ONE groupBy(value) pass collapses the data to its DISTINCT values
    * (per-group counts), cumulative sums over that bounded frame give
    * both ECDFs, and D is their max absolute gap — the supremum over a
    * step function is attained at a jump, so checking the distinct
    * values is exact, not an approximation. Also reports the scaled
    * statistic λ = D·√(n₁n₂/(n₁+n₂)) (the asymptotic-p input). The
    * single-partition window runs over distinct VALUES (bounded), never
    * the rows. Output: one row (n1, n2, d_stat, lambda).
    */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
      g1: String, g2: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(valueCol).rowsBetween(Long.MinValue, 0)
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val cells = df.filter(col(groupCol).isin(g1, g2))
      .groupBy(col(valueCol))
      .agg(sum(when(col(groupCol) === g1, 1L).otherwise(0L)).as("__c1"),
        sum(when(col(groupCol) === g2, 1L).otherwise(0L)).as("__c2"))
    // fail loudly on an absent group — an all-zero ECDF side would
    // otherwise report a plausible-looking D of 1.0 (the welch guard)
    val tot = cells.agg(sum("__c1"), sum("__c2")).collect()(0)
    Seq(g1 -> 0, g2 -> 1).foreach { case (gv, i) =>
      require(!tot.isNullAt(i) && tot.getLong(i) >= 1,
        s"ksTest: group '$gv' has no rows in '$groupCol'")
    }
    val withE = cells
      .withColumn("__n1", sum(col("__c1")).over(all))
      .withColumn("__n2", sum(col("__c2")).over(all))
      .withColumn("__gap", abs(
        sum(col("__c1")).over(w).cast("double") / col("__n1") -
        sum(col("__c2")).over(w).cast("double") / col("__n2")))
    withE.agg(
        max(col("__n1")).cast("bigint").as("n1"),
        max(col("__n2")).cast("bigint").as("n2"),
        max(col("__gap")).as("__d"))
      .select(col("n1"), col("n2"), round(col("__d"), 6).as("d_stat"),
        round(col("__d") * sqrt(col("n1") * col("n2") /
          (col("n1") + col("n2")).cast("double")), 6).as("lambda"))
  }

  /** Welch's two-sample t-test (unequal variances) between the rows of
    * `groupCol == g1` and `groupCol == g2`. One grouped aggregation pass;
    * sample variance from exact sums as `(Σx² − (Σx)²/n) / (n−1)`, the
    * t statistic `(m1−m2)/√(v1/n1 + v2/n2)`, and the Welch–Satterthwaite
    * degrees of freedom. Output columns: n1, n2, mean1, mean2, t_stat,
    * df (one row, rounded to 6). */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      g1: String, g2: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val g = df.filter(col(groupCol).isin(g1, g2))
      .groupBy(col(groupCol).as("__g"))
      .agg(count(x).as("__n"), sum(x).as("__s1"), sum(x * x).as("__s2"))
    // Fail loudly on an absent/degenerate group: the crossJoin below would
    // silently drop the result row, so a typo in g1/g2 looked like a
    // successful zero-row run (ADVICE r13). The validation pass aggregates
    // to at most two rows — bounded at any corpus size.
    val seen = g.collect().map(r =>
      r.get(0).toString -> r.getLong(r.fieldIndex("__n"))).toMap
    Seq(g1, g2).foreach { gv =>
      val n = seen.getOrElse(gv, 0L)
      require(n >= 2, s"welchTTest: group '$gv' has $n non-null rows in " +
        s"'$groupCol' (need >= 2 for a sample variance)")
    }
    def side(gv: String, suffix: String) = g.filter(col("__g") === gv)
      .select(col("__n").as(s"n$suffix"), col("__s1").as(s"s1$suffix"),
        col("__s2").as(s"s2$suffix"))
    val j = side(g1, "1").crossJoin(side(g2, "2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val m1 = col("s11") / n1; val m2 = col("s12") / n2
    val v1 = (col("s21") - col("s11") * col("s11") / n1) / (n1 - lit(1.0))
    val v2 = (col("s22") - col("s12") * col("s12") / n2) / (n2 - lit(1.0))
    val se1 = v1 / n1; val se2 = v2 / n2
    val tStat = (m1 - m2) / sqrt(se1 + se2)
    val dfW = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (n1 - lit(1.0)) + se2 * se2 / (n2 - lit(1.0)))
    j.select(col("n1"), col("n2"), round(m1, 6).as("mean1"),
      round(m2, 6).as("mean2"), round(tStat, 6).as("t_stat"),
      round(dfW, 6).as("df"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns: one groupBy(a, b) count (cardinality-bounded shuffle), the
    * marginals re-aggregated FROM the cells (no second scan), expected
    * counts `row·col/total`, and `χ² = Σ (obs−exp)²/exp` over the FULL
    * ka×kb grid — a (a,b) combination never observed still contributes
    * its expected count (the `(0−e)²/e = e` term Pearson's statistic
    * requires; without it sparse tables understate χ² while
    * dof=(ka−1)(kb−1) still assumes the complete grid — ADVICE r13). The
    * grid is the crossJoin of the two marginal frames (cardinality², not
    * data-sized) left-joined against the observed cells. Output: one
    * row (n_cells = ka·kb, dof, chi2 rounded to 6). */
  def chiSquareIndependence(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val ra = cells.groupBy("__a").agg(sum(col("__o")).as("__ra"))
    val cb = cells.groupBy("__b").agg(sum(col("__o")).as("__cb"))
    val full = ra.crossJoin(cb).join(cells, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val tot = cells.agg(sum(col("__o")).as("__t"),
      countDistinct(col("__a")).as("__ka"),
      countDistinct(col("__b")).as("__kb"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__t").cast("double")
    full.crossJoin(broadcast(tot))
      .select(((col("__o").cast("double") - e) * (col("__o").cast("double") - e) / e)
        .as("__cell"), col("__ka"), col("__kb"))
      .groupBy(col("__ka"), col("__kb"))
      .agg(count(lit(1)).as("n_cells"), round(sum(col("__cell")), 6).as("chi2"))
      .select(col("n_cells"),
        ((col("__ka") - 1) * (col("__kb") - 1)).as("dof"), col("chi2"))
  }

  /** Benford first-digit audit — the fabricated-data / unit-mixing smell
    * test: observed first-significant-digit frequencies against Benford's
    * law `P(d) = log10(1 + 1/d)`. `intCol` must be an exact INTEGER
    * column (cents, counts): integer→string is exact on every engine
    * where float formatting is not, so the digit extraction restates
    * verbatim. Rows whose leading character is not 1-9 (zero, negative)
    * are excluded. One grouped count + a 1-row total. */
  def benford(df: DataFrame, intCol: Column): DataFrame = {
    val digit = substring(intCol.cast("string"), 1, 1).cast("int")
    val counts = df.select(digit.as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = counts.agg(sum(col("n_obs")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("__t").cast("double"), 6)
          .as("obs_ratio"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("exp_ratio"))
      .orderBy("digit")
  }

  /** The d×d covariance matrix (population) of the numeric columns from
    * ONE aggregation pass over raw power sums: `cov(i,j) = Σxᵢxⱼ/n −
    * mᵢ·mⱼ`. Returns (n, means, cov) driver-side — d is the FEATURE
    * count (small); the data never moves beyond d(d+3)/2 running sums.
    *
    * COMPLETE-CASE: rows where ANY input column is null are excluded up
    * front, so `n` counts exactly the rows the sums cover (mixing
    * count(*) with null-skipping sums silently deflated every mean and
    * covariance on nullable inputs — ADVICE r13). Pairwise-deletion
    * covariance is deliberately not offered: it can produce non-PSD
    * matrices, which would break [[topComponent]]'s power iteration. */
  def covarianceMatrix(df: DataFrame,
      cols: Seq[String]): (Double, Array[Double], Array[Array[Double]]) = {
    val d = cols.length
    require(d >= 1, "need at least one column")
    val complete = df.filter(cols.map(c => col(c).isNotNull).reduce(_ && _))
    val x = (i: Int) => col(cols(i)).cast("double")
    val sums = Seq(count(lit(1)).cast("double").as("n")) ++
      (0 until d).map(i => sum(x(i)).as(s"s_$i")) ++
      (for (i <- 0 until d; j <- i until d)
        yield sum(x(i) * x(j)).as(s"p_${i}_$j"))
    val r = complete.agg(sums.head, sums.tail: _*).head()
    def g(name: String) = r.getDouble(r.fieldIndex(name))
    val n = g("n")
    require(n >= 2, "need at least two rows")
    val m = Array.tabulate(d)(i => g(s"s_$i") / n)
    val cov = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      cov(i)(j) = g(s"p_${i}_$j") / n - m(i) * m(j)
      cov(j)(i) = cov(i)(j)
    }
    (n, m, cov)
  }

  /** Top principal component by `iters` fixed power-iteration steps from
    * the deterministic start v₀ = (1, …, 1)/√d — matrix·vector products
    * on the driver-side d×d covariance, normalized each step; returns
    * (eigenvalue by Rayleigh quotient, component with its first
    * coordinate forced non-negative so the sign is well-defined). A
    * FIXED iteration count (not a convergence test) keeps the recurrence
    * restatable in SQL. */
  def topComponent(cov: Array[Array[Double]],
      iters: Int): (Double, Array[Double]) = {
    val d = cov.length
    require(iters >= 1, "need at least one iteration")
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(c => c * c).sum)
      require(norm > 0, "covariance annihilated the iterate")
      v = w.map(_ / norm)
    }
    val av = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val lambda = (0 until d).map(i => v(i) * av(i)).sum
    val sign = if (v(0) < 0) -1.0 else 1.0
    (lambda, v.map(_ * sign))
  }
}
