package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction (Vovk et al. 2005; Lei et al. 2018,
  * JASA): distribution-free prediction intervals with finite-sample
  * coverage ≥ 1 − α, from any point predictor. The split recipe:
  *
  *   1. fit the predictor on the TRAIN split;
  *   2. score the CALIBRATION split's absolute residuals;
  *   3. q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration residual
  *      (the finite-sample-corrected order statistic);
  *   4. predict ŷ ± q̂ everywhere — coverage is guaranteed by
  *      exchangeability alone, no distributional assumptions.
  *
  * Scale shape: the quantile is ONE order statistic — a count
  * aggregate + a rank selection over the calibration split, never a
  * sort of the full data (TakeOrdered on a single value); splits come
  * from the portable md5 coin so train/calibration membership is
  * deterministic and engine-reproducible.
  */
object Conformal {

  /** The finite-sample conformal quantile of `|residualCol|`: the
    * ⌈(n+1)(1−α)⌉-th smallest value (1-based). The selection goes
    * through [[graft.functions.DistributedRank.withRank]] (range-sort
    * + zipWithIndex) and ONE row comes back — never rank-many rows to
    * the driver and no single-partition window. Errors out if the
    * calibration set is too small for the requested α (rank > n). */
  def quantile(cal: DataFrame, residualCol: String, alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val res = cal.select(abs(col(residualCol)).as("__r"))
    val ranked = graft.functions.DistributedRank.withRank(
      res, Seq(col("__r")), "__rank")
    val n = ranked.count()
    require(n > 0, "empty calibration set")
    val rank = math.ceil((n + 1) * (1 - alpha)).toLong
    require(rank <= n,
      s"calibration set too small: need rank $rank of $n — lower alpha or add data")
    ranked.filter(col("__rank") === rank).collect()(0).getDouble(0)
  }
}
