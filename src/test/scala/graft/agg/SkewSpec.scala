package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the plain aggregation on a hot key") {
    val df = (Seq.fill(1000)(("hot", 2.0)) ++ Seq(("cold", 5.0), ("cold", 7.0)))
      .toDF("k", "v")
    val out = Skew.saltedSumCount(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out("hot") == ((2000.0, 1000L)))
    assert(out("cold") == ((12.0, 2L)))
  }

  test("saltedAggregate splits phase 1 across buckets") {
    val df = Seq.fill(100)(("k", 1.0)).toDF("k", "v")
    val phase1Groups = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(4)))
      .groupBy("k", "__salt").count().count()
    assert(phase1Groups > 1) // the hot key really is split
    val merged = Skew.saltedAggregate(df, Seq("k"), 4,
      partials = Seq(max(col("v")).as("__m")),
      merges = Seq(max(col("__m")).as("max_v")))
      .collect()(0)
    assert(merged.getString(0) == "k" && merged.getDouble(1) == 1.0)
  }

  test("saltedJoin output equals the plain inner join") {
    val left = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("dangling", 3))).toDF("k", "lv")
    val right = Seq(("hot", 10), ("a", 20), ("unmatched", 30)).toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, "k", buckets = 4)
    val plain = left.join(right, Seq("k"), "inner")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum(col("lv") * col("rv"))).collect()(0).getLong(0) ==
      plain.agg(sum(col("lv") * col("rv"))).collect()(0).getLong(0))
  }

  test("approx distinct counter is decision-equivalent on test columns") {
    import graft.analyze.DistinctCounter
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
    val exact = df.agg(DistinctCounter.DbDistinct.expr(col("o_orderpriority"), null)).collect()(0).getLong(0)
    val approx = df.agg(DistinctCounter.Approx().expr(col("o_orderpriority"), null)).collect()(0).getLong(0)
    assert(exact == 5L && math.abs(approx - exact) <= 1)
  }

  test("keyProfile: hand-computed stats on a known distribution") {
    import spark.implicits._
    // key a: 4 rows, b: 2, c: 2 -> n=8, 3 keys, max 4
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c")).toDF("k")
    val r = Skew.keyProfile(df, "k").collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 3L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.5) // max_share
    // counts (4,2,2): mean 8/3, sd sqrt(4/3); entropy -(1/2 ln 1/2 + 2*(1/4 ln 1/4))
    val cv = math.sqrt(4.0 / 3) / (8.0 / 3)
    assert(math.abs(r.getDouble(4) - cv) < 1e-3)
    val h = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert(math.abs(r.getDouble(5) - h) < 1e-3)
    // uniform keys maximize entropy at ln(n_keys)
    val uni = (1 to 100).map(i => s"k$i").toDF("k")
    val ru = Skew.keyProfile(uni, "k").collect().head
    assert(math.abs(ru.getDouble(5) - math.log(100)) < 1e-3)
  }
}
