package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Higher-moment statistical profile — mean, population variance,
  * skewness (g1) and excess kurtosis (g2) from ONE aggregation pass over
  * raw power sums. Spark's builtin `skewness`/`kurtosis` merge per-
  * partition moment states in partition order (not reproducible across
  * engines or partitionings at the rounding boundary); here Σx..Σx⁴ are
  * exact integers for integer-valued features, so every derived statistic
  * is bit-identical on any engine that evaluates the same expression
  * tree — the [[graft.features.Features.scaleFeatures]] device extended
  * to third and fourth moments.
  */
object Moments {

  /** One-row profile (n, mean, var_pop, skewness, kurtosis_excess),
    * values rounded to 6 decimals. Requires a non-constant column. */
  def profile(df: DataFrame, c: String): DataFrame = {
    val x = col(c).cast("double")
    val r = df.agg(count(x).as("n"), sum(x).as("s1"), sum(x * x).as("s2"),
      sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4")).head()
    require(r.getLong(0) >= 2 && !r.isNullAt(1),
      s"profile: `$c` needs at least two non-NULL values")
    val n = r.getLong(0).toDouble
    val (s1, s2, s3, s4) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val m1 = s1 / n
    val mp2 = s2 / n - m1 * m1
    require(mp2 > 0, s"constant column `$c` has no moment profile")
    val mp3 = s3 / n - 3 * m1 * (s2 / n) + 2 * m1 * m1 * m1
    val mp4 = s4 / n - 4 * m1 * (s3 / n) + 6 * m1 * m1 * (s2 / n) -
      3 * m1 * m1 * m1 * m1
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    import df.sparkSession.implicits._
    Seq((r.getLong(0), r6(m1), r6(mp2),
      r6(mp3 / math.pow(mp2, 1.5)), r6(mp4 / (mp2 * mp2) - 3)))
      .toDF("n", "mean", "var_pop", "skewness", "kurtosis_excess")
  }
}
