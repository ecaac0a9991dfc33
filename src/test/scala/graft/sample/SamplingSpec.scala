package graft.sample

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("capNeighbors bounds fan-in per destination and keeps all small groups") {
    val edges = ((1L to 100L).map(s => (s, 7L)) ++ Seq((1L, 8L), (2L, 8L)))
      .toDF("src_id", "dst_id")
    val capped = Sampling.capNeighbors(edges, k = 10)
    val byDst = capped.groupBy("dst_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDst(7L) == 10L)   // hot node capped
    assert(byDst(8L) == 2L)    // small group untouched
    // deterministic per seed
    val again = Sampling.capNeighbors(edges, k = 10)
      .orderBy("dst_id", "src_id").collect().toSeq
    assert(Sampling.capNeighbors(edges, k = 10)
      .orderBy("dst_id", "src_id").collect().toSeq == again)
  }

  test("withSplitMasks: masks are complementary and roughly proportional") {
    val nodes = (1L to 1000L).toDF("id")
    val masked = Sampling.withSplitMasks(nodes, valFraction = 0.3)
    val counts = masked.agg(
      sum(when(col("train_mask"), 1).otherwise(0)).as("tr"),
      sum(when(col("val_mask"), 1).otherwise(0)).as("va"),
      sum(when(col("train_mask") === col("val_mask"), 1).otherwise(0)).as("overlap"))
      .collect()(0)
    assert(counts.getLong(0) + counts.getLong(1) == 1000L)
    assert(counts.getLong(2) == 0L) // masks never agree (complementary)
    assert(counts.getLong(1) > 200L && counts.getLong(1) < 400L)
  }
}
