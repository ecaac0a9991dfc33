package graft.analyze

import java.sql.Date

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  test("a period-2 alternating series has acf(1) = -1 and acf(2) = +1") {
    val s = (0 until 20).map(i => (day(i), if (i % 2 == 0) 10L else 20L))
      .toDF("d", "x")
    val got = TimeSeries.acf(s, "d", "x", 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 19L, -1.0), (2L, 18L, 1.0)))
  }

  test("acf matches a hand-computed Pearson at lag 1") {
    // series 1,2,4,8,16: lag-1 pairs (1,2),(2,4),(4,8),(8,16)
    val s = Seq(1L, 2L, 4L, 8L, 16L).zipWithIndex
      .map { case (x, i) => (day(i), x) }.toDF("d", "x")
    val got = TimeSeries.acf(s, "d", "x", 1)
      .as[(Long, Long, Double)].head()
    // xa=(1,2,4,8) xb=(2,4,8,16): n=4 sxy=170 sx=15 sy=30
    // num = 4*170-15*30 = 230; va = 4*85-225 = 115; vb = 4*340-900 = 460
    val want = BigDecimal(230.0 / (math.sqrt(115.0) * math.sqrt(460.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == (1L, 4L, want))
  }

  test("seasonalProfile: dow 0 is Sunday and stats are exact") {
    // 2024-01-07 is a Sunday; two Sundays (7, 14) and one Monday (8)
    val s = Seq((Date.valueOf("2024-01-07"), 10L),
      (Date.valueOf("2024-01-14"), 30L),
      (Date.valueOf("2024-01-08"), 5L)).toDF("d", "x")
    val got = TimeSeries.seasonalProfile(s, "d", "x")
      .as[(Int, Long, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, 2L, 20.0, 10L, 30L), (1, 1L, 5.0, 5L, 5L)))
  }

  test("gap days drop their pairs instead of imputing") {
    // days 0,1,2,4 — lag 1 pairs: (0,1),(1,2) only; lag 2: (0,2),(2,4)
    val s = Seq(0, 1, 2, 4).map(i => (day(i), (i + 1).toLong)).toDF("d", "x")
    val n = TimeSeries.acf(s, "d", "x", 2)
      .select("lag", "n_pairs").as[(Long, Long)].collect().toMap
    assert(n == Map(1L -> 2L, 2L -> 2L))
  }
}
