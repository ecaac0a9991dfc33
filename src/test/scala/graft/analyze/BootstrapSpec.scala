package graft.analyze

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonWeight: draws live in 0..8 and average ~1 (it IS Poisson(1))") {
    val df = (1L to 10000L).toDF("k")
      .select(Bootstrap.poissonWeight(col("k"), rep = 0, seed = "t").as("w"))
    val stats = df.agg(min("w"), max("w"), avg("w")).head()
    assert(stats.getInt(0) >= 0 && stats.getInt(1) <= 8)
    assert(math.abs(stats.getDouble(2) - 1.0) < 0.05,
      s"mean weight ${stats.getDouble(2)} should be ~1")
    // replicates are independent coins: rep 1 differs from rep 0
    val w2 = (1L to 10000L).toDF("k")
      .select(Bootstrap.poissonWeight(col("k"), rep = 1, seed = "t").as("w"))
    assert(df.collect().map(_.getInt(0)).toSeq !=
      w2.collect().map(_.getInt(0)).toSeq)
  }

  test("replicateMeans: deterministic, replicate-varying, near the true mean") {
    val df = (1L to 2000L).map(i => (i, (i % 100).toDouble)).toDF("k", "v")
    val a = Bootstrap.replicateMeans(df, "v", "k", b = 16, seed = "s")
    val b = Bootstrap.replicateMeans(df, "v", "k", b = 16, seed = "s")
    assert(a == b, "same seed, same replicate means")
    assert(a.distinct.size > 1, "replicates must actually vary")
    val truth = (1L to 2000L).map(i => (i % 100).toDouble).sum / 2000.0
    assert(a.forall(m => math.abs(m - truth) < 5.0),
      "every replicate mean stays near the population mean")
  }

  test("meanCi: a constant column gives a zero-width interval at the constant") {
    val df = (1L to 500L).map(i => (i, 42.0)).toDF("k", "v")
    val ci = Bootstrap.meanCi(df, "v", "k", b = 16, seed = "s").head()
    assert(ci.getInt(0) == 16)
    assert(ci.getDouble(1) == 42.0 && ci.getDouble(2) == 42.0)
  }

  test("meanCi: interval is ordered, covers the truth, and narrows with n") {
    def ci(n: Long) = {
      val df = (1L to n).map(i => (i, (i % 100).toDouble)).toDF("k", "v")
      val r = Bootstrap.meanCi(df, "v", "k", b = 32, seed = "s").head()
      (r.getDouble(1), r.getDouble(2))
    }
    val (lo1, hi1) = ci(400)
    val (lo2, hi2) = ci(6400)
    assert(lo1 <= hi1 && lo2 <= hi2)
    val truth = 49.5 // mean of 0..99 over a multiple of 100 rows
    assert(lo2 < truth && truth < hi2, "the 16x interval should cover the truth")
    assert(hi2 - lo2 < hi1 - lo1, "width must shrink as n grows (~1/sqrt(n))")
  }
}
