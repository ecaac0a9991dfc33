package graft.analyze

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier reproduces the textbook product-limit values") {
    // Classic worked example: deaths at t=1 (2 of 10), t=3 (1 of 7),
    // censored at t=2 (1), t=3 (1); 5 survive past t=4 (censored).
    // S(1) = 1 - 2/10 = 0.8
    // S(3) = 0.8 * (1 - 1/7)  (at t=3: 10-2-1=7 at risk, 1 death)
    val subjects =
      Seq.fill(2)((1, 1)) ++ Seq((2, 0)) ++ Seq((3, 1), (3, 0)) ++
        Seq.fill(5)((4, 0))
    val km = Survival.kaplanMeier(subjects.toDF("dur", "e"), "dur", "e")
      .orderBy("t").collect()
    val byT = km.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(byT(1L) == ((10L, 2L, 0L, 0.8)))
    assert(byT(2L)._1 == 8L && byT(2L)._2 == 0L && byT(2L)._3 == 1L)
    assert(math.abs(byT(2L)._4 - 0.8) < 1e-12,
      "a censor-only time point must not reduce survival")
    assert(byT(3L)._1 == 7L)
    assert(math.abs(byT(3L)._4 - 0.8 * (1.0 - 1.0 / 7.0)) < 1e-12)
    assert(byT(4L) == ((5L, 0L, 5L, byT(4L)._4)) &&
      math.abs(byT(4L)._4 - byT(3L)._4) < 1e-12)
  }

  test("risk sets telescope: n_at_risk(t) = subjects with duration >= t") {
    val subjects = Seq((0, 1), (0, 0), (1, 1), (2, 0), (2, 1), (5, 0))
    val km = Survival.kaplanMeier(subjects.toDF("dur", "e"), "dur", "e")
      .orderBy("t").collect()
    val risks = km.map(r => r.getLong(0) -> r.getLong(1)).toMap
    subjects.map(_._1).distinct.foreach { t =>
      assert(risks(t.toLong) == subjects.count(_._1 >= t),
        s"risk set at t=$t")
    }
  }

  test("everyone dying at the last time point drives survival to exactly 0") {
    val subjects = Seq((1, 1), (2, 1), (2, 1))
    val km = Survival.kaplanMeier(subjects.toDF("dur", "e"), "dur", "e")
      .orderBy("t").collect()
    assert(km.last.getDouble(4) == 0.0, "factor 0 must yield exact 0, not exp(-inf) noise")
    assert(km.head.getDouble(4) > 0.0)
  }

  test("no-censoring survival equals the empirical tail fraction") {
    val subjects = Seq((1, 1), (1, 1), (2, 1), (3, 1))
    val km = Survival.kaplanMeier(subjects.toDF("dur", "e"), "dur", "e")
      .orderBy("t").collect()
    val s = km.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(s(1L) - 0.5) < 1e-12)   // 2 of 4 survive past 1
    assert(math.abs(s(2L) - 0.25) < 1e-12)  // 1 of 4 survives past 2
    assert(s(3L) == 0.0)
  }
}
