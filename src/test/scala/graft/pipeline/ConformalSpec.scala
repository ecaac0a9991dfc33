package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("quantile is the ceil((n+1)(1-alpha))-th smallest absolute residual") {
    // residuals 1..10 (as ±): n=10, alpha=0.25 -> rank ceil(11*0.75)=9
    val cal = (1 to 10).map(i => if (i % 2 == 0) i.toDouble else -i.toDouble)
      .toDF("resid")
    assert(Conformal.quantile(cal, "resid", alpha = 0.25) == 9.0)
    // alpha=0.5 -> rank ceil(11*0.5)=6
    assert(Conformal.quantile(cal, "resid", alpha = 0.5) == 6.0)
  }

  test("ties at the rank boundary still select the order-statistic value") {
    val cal = Seq(1.0, 2.0, 2.0, 2.0, 5.0).toDF("resid")
    // n=5, alpha=0.2 -> rank ceil(6*0.8)=5 -> value 5.0
    assert(Conformal.quantile(cal, "resid", alpha = 0.2) == 5.0)
    // alpha=0.4 -> rank ceil(6*0.6)=4 -> one of the tied 2.0s
    assert(Conformal.quantile(cal, "resid", alpha = 0.4) == 2.0)
  }

  test("finite-sample coverage holds on exchangeable data") {
    // y = 3*x + deterministic pseudo-noise; split by row index parity
    val rows = (1 to 4000).map { i =>
      val noise = ((i * 2654435761L) % 1000) / 500.0 - 1.0 // in [-1, 1)
      (i, 3.0 * (i % 50) + noise, (i % 50).toDouble)
    }
    val df = rows.toDF("id", "y", "x")
    val cal = df.filter(col("id") % 2 === 0)
      .select((col("y") - col("x") * 3.0).as("resid"))
    val q = Conformal.quantile(cal, "resid", alpha = 0.1)
    val test = df.filter(col("id") % 2 === 1)
    val cov = test.select(
        (abs(col("y") - col("x") * 3.0) <= q).cast("int").as("in"))
      .agg(avg(col("in"))).head().getDouble(0)
    assert(cov >= 0.88, s"coverage $cov must be near/above 1 - alpha = 0.9")
  }

  test("a calibration set too small for alpha fails loudly") {
    val cal = Seq(1.0, 2.0, 3.0).toDF("resid")
    val e = intercept[IllegalArgumentException] {
      Conformal.quantile(cal, "resid", alpha = 0.1) // rank ceil(4*0.9)=4 > 3
    }
    assert(e.getMessage.contains("calibration set too small"))
    intercept[IllegalArgumentException] {
      Conformal.quantile(cal.filter(col("resid") < 0), "resid", alpha = 0.5)
    }
  }
}
