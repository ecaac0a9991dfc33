package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass Poisson bootstrap (Chamandy et al. 2012, "Estimating
  * uncertainty for massive data streams" — the standard trick for
  * bootstrapping data too large to resample by index): replicate b
  * reweights every row by an independent Poisson(1) draw, so B
  * bootstrap replicates of a mean are 2B running sums in ONE
  * distributed aggregation pass — no resampled copies, no shuffle
  * beyond the single agg, B columns instead of B× the data.
  *
  * Every draw is the portable md5 16-bit coin of (key, seed,
  * replicate) pushed through a PINNED cumulative-Poisson(1) CASE
  * ladder (literals to 10 dp), so weights — and therefore every
  * replicate mean — are engine-reproducible.
  */
object Bootstrap {

  private val cumPoisson1 = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508)

  /** Poisson(1) weight for `keyCol` in replicate `rep`: u = the md5
    * 16-bit coin of (key, seed, rep), inverted through the pinned
    * cumulative ladder. */
  def poissonWeight(keyCol: Column, rep: Int, seed: String): Column = {
    val coin = conv(substring(md5(concat(keyCol.cast("string"),
      lit(s":$seed:$rep"))), 1, 4), 16, 10).cast("double")
    val u = (coin + 0.5) / 65536.0
    cumPoisson1.zipWithIndex.foldRight(lit(cumPoisson1.size): Column) {
      case ((thr, k), elseCol) => when(u < thr, lit(k)).otherwise(elseCol)
    }
  }

  /** B bootstrap replicate means of `valCol` in one aggregation pass:
    * returns the B means in replicate order (driver-side — B doubles,
    * not data). */
  def replicateMeans(df: DataFrame, valCol: String, keyCol: String,
      b: Int, seed: String): Seq[Double] = {
    require(b >= 2, "need at least 2 replicates")
    val x = col(valCol).cast("double")
    val sums = (0 until b).flatMap { r =>
      val w = poissonWeight(col(keyCol), r, seed).cast("double")
      Seq(sum(w * x).as(s"sx_$r"), sum(w).as(s"sw_$r"))
    }
    val row = df.agg(sums.head, sums.tail: _*).collect()(0)
    (0 until b).map { r =>
      val sw = row.getDouble(row.fieldIndex(s"sw_$r"))
      require(sw > 0, s"replicate $r drew all-zero weights — input too small to bootstrap")
      row.getDouble(row.fieldIndex(s"sx_$r")) / sw
    }
  }

  /** Percentile-bootstrap confidence interval for the mean: the
    * (floor(α/2·(B−1))+1)-th and (ceil((1−α/2)·(B−1))+1)-th order
    * statistics of the B replicate means (1-based, a pinned
    * convention both engines can restate). Returns one row:
    * (n_replicates, ci_lo, ci_hi). */
  def meanCi(df: DataFrame, valCol: String, keyCol: String, b: Int,
      seed: String, alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val means = replicateMeans(df, valCol, keyCol, b, seed).sorted
    val kLo = math.floor(alpha / 2 * (b - 1)).toInt
    val kHi = math.ceil((1 - alpha / 2) * (b - 1)).toInt
    df.sparkSession.range(1).select(
      lit(b).as("n_replicates"),
      lit(means(kLo)).as("ci_lo"),
      lit(means(kHi)).as("ci_hi"))
  }
}
