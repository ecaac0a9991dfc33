package graft.analyze

import graft.SparkSpec

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: closed forms on a symmetric and a skewed distribution") {
    // symmetric {1..5}: mean 3, var_pop 2, skew 0, kurtosis_excess -1.3
    val sym = (1 to 5).map(_.toDouble).toDF("x")
    val s = Moments.profile(sym, "x").head()
    assert(s.getLong(0) == 5L && s.getDouble(1) == 3.0 && s.getDouble(2) == 2.0)
    assert(s.getDouble(3) == 0.0)
    assert(s.getDouble(4) == -1.3)
    // right-skewed {0,0,0,4}: mean 1, var 3, skew must be positive
    val skewed = Seq(0.0, 0.0, 0.0, 4.0).toDF("x")
    val k = Moments.profile(skewed, "x").head()
    assert(k.getDouble(1) == 1.0 && k.getDouble(2) == 3.0)
    assert(k.getDouble(3) > 1.0, "one-sided outlier means strong positive skew")
    // degenerate inputs fail fast
    intercept[IllegalArgumentException] {
      Moments.profile(Seq(7.0, 7.0).toDF("x"), "x")
    }
    intercept[IllegalArgumentException] {
      Moments.profile(Seq(1.0).toDF("x"), "x")
    }
  }
}
