package graft.linkage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (Fellegi &
  * Sunter 1969, JASA; the model behind Splink-style ER engines) trained
  * by EM over BLOCKED candidate pairs:
  *
  *   - each pair carries a comparison vector γ of 0/1 field-agreement
  *     indicators (exact integer comparisons — engine-portable);
  *   - the model is per-field m = P(γ_f = 1 | match), u = P(γ_f = 1 |
  *     non-match) and the match prevalence λ;
  *   - [[emFit]] runs a FIXED number of EM iterations, each exactly ONE
  *     distributed aggregation pass: the E-step posterior is a row-local
  *     expression of the current parameters (entering the plan as
  *     literals), and the M-step needs only Σw, Σw·γ_f, Σ(1−w)·γ_f, N —
  *     2F+2 sums with map-side combine;
  *   - [[score]] applies FROZEN (rounded) parameters to every pair:
  *     posterior + the classic log2 match weight, scan-speed.
  *
  * 100 TB shape: candidate generation is the caller's blocking join
  * (never all-pairs — same discipline as the dedup family, auditable
  * with the dq7-style recall probe); EM cost is iterations × one pass
  * over pairs; parameters live on the driver (2F+1 doubles). The fixed
  * iteration count (not a convergence test) keeps the whole training
  * trajectory restatable in SQL.
  */
object RecordLinkage {

  final case class FsParams(m: Array[Double], u: Array[Double], lambda: Double)

  /** Per-pair posterior P(match | γ) as a row-local column of the given
    * parameters. Product accumulates in field order (pinned for
    * engine-parity restatement): λ·Π(γ?m:(1−m)) over that plus
    * (1−λ)·Π(γ?u:(1−u)). */
  private def posterior(gammaCols: Seq[String], p: FsParams): Column = {
    val num = gammaCols.zipWithIndex.map { case (g, f) =>
      when(col(g) === 1, lit(p.m(f))).otherwise(lit(1.0 - p.m(f)))
    }.reduce(_ * _) * lit(p.lambda)
    val alt = gammaCols.zipWithIndex.map { case (g, f) =>
      when(col(g) === 1, lit(p.u(f))).otherwise(lit(1.0 - p.u(f)))
    }.reduce(_ * _) * lit(1.0 - p.lambda)
    num / (num + alt)
  }

  /** Fixed-iteration EM for the Fellegi–Sunter parameters over pairs
    * carrying 0/1 `gammaCols`. Update order pinned: m_f = Σwγ_f/Σw,
    * u_f = Σ(1−w)γ_f/(N−Σw), λ = Σw/N. */
  def emFit(pairs: DataFrame, gammaCols: Seq[String], iters: Int,
      init: FsParams): FsParams = {
    require(gammaCols.nonEmpty, "need at least one comparison field")
    require(iters >= 1, "need at least one EM iteration")
    var p = init
    (1 to iters).foreach { _ =>
      val w = posterior(gammaCols, p)
      val sums =
        Seq(sum(w).as("sw"), count(lit(1)).cast("double").as("n")) ++
        gammaCols.zipWithIndex.map { case (g, f) =>
          sum(w * col(g).cast("double")).as(s"swg_$f") } ++
        gammaCols.zipWithIndex.map { case (g, f) =>
          sum((lit(1.0) - w) * col(g).cast("double")).as(s"svg_$f") }
      val r = pairs.agg(sums.head, sums.tail: _*).collect()(0)
      require(!r.isNullAt(r.fieldIndex("sw")), "cannot fit on an empty pair set")
      def g(n: String) = r.getDouble(r.fieldIndex(n))
      val sw = g("sw"); val n = g("n")
      require(sw > 0 && sw < n,
        "EM degenerated: every pair classified one way — check blocking/gammas")
      p = FsParams(
        gammaCols.indices.map(f => g(s"swg_$f") / sw).toArray,
        gammaCols.indices.map(f => g(s"svg_$f") / (n - sw)).toArray,
        sw / n)
    }
    p
  }

  /** Score pairs with frozen parameters: the posterior and the classic
    * Fellegi–Sunter log2 match weight Σ log2(m/u or (1−m)/(1−u)).
    * Freeze (round) the fitted parameters first so two engines score
    * bit-identical values. */
  def score(pairs: DataFrame, gammaCols: Seq[String], p: FsParams): DataFrame = {
    val weight = gammaCols.zipWithIndex.map { case (g, f) =>
      when(col(g) === 1, lit(math.log(p.m(f) / p.u(f)) / math.log(2.0)))
        .otherwise(lit(math.log((1.0 - p.m(f)) / (1.0 - p.u(f))) / math.log(2.0)))
    }.reduce(_ + _)
    pairs.withColumn("posterior", posterior(gammaCols, p))
      .withColumn("match_weight", weight)
  }
}
