package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  test("withRank equals window row_number on random data, any partitioning") {
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 6) {
      val n = 1 + rnd.nextInt(60)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(10), rnd.nextDouble()))
      val df = rows.toDF("id", "grp", "v").repartition(1 + rnd.nextInt(5))
      // total order: (grp asc, v desc, id) — id breaks all remaining ties
      val got = DistributedRank
        .withRank(df, Seq(col("grp"), col("v").desc, col("id")), "r")
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val want = rows.sortBy { case (id, g, v) => (g, -v, id) }
        .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
      assert(got == want, s"trial $trial (n=$n)")
    }
  }

  test("topK equals the first k of the full ranking, rank values preserved") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val n = 5 + rnd.nextInt(50)
      val k = 1 + rnd.nextInt(n)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(100).toLong))
      val df = rows.toDF("id", "cnt").repartition(1 + rnd.nextInt(4))
      val got = DistributedRank
        .topK(df, Seq(col("cnt").desc, col("id")), "r", k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
      val want = rows.sortBy { case (id, c) => (-c, id) }.take(k)
        .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
      assert(got.toSeq == want, s"trial $trial (n=$n, k=$k)")
    }
  }

  test("withRank refuses frames above maxRows; topK's pre-cut keeps it bounded") {
    val df = (1L to 100L).toDF("id")
    intercept[IllegalArgumentException] {
      DistributedRank.withRank(df, Seq(col("id")), "r", maxRows = 50L)
    }
    // raising the bound at the call site is the documented escape hatch
    assert(DistributedRank.withRank(df, Seq(col("id")), "r", maxRows = 100L)
      .count() == 100L)
    // topK pre-cuts to partitions×k before ranking: its withRank input is
    // bounded however large the frame, so a tight maxRows via the default
    // path still succeeds (8 partitions × k=3 = 24 ranked rows here)
    val wide = (1L to 10000L).toDF("id").repartition(8)
    val top = DistributedRank.topK(wide, Seq(col("id")), "r", k = 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(top == Seq(1L, 2L, 3L))
  }

  test("rank output survives downstream joins (checkpointed, not recomputed)") {
    val df = (1L to 20L).map(i => (i, 21L - i)).toDF("id", "v")
    val ranked = DistributedRank.withRank(df, Seq(col("v"), col("id")), "r")
    val joined = ranked.as("a").join(ranked.as("b"), col("a.r") === col("b.r"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(joined.length == 20 && joined.forall { case (a, b) => a == b })
  }
}
