package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference interleave (the textbook definition). */
  private def ref(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | (((x & mask) >> i) & 1L) << (2 * i) | (((y & mask) >> i) & 1L) << (2 * i + 1)
    }
  }

  test("matches the reference interleave, including out-of-range masking") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      (5L, 9L), (1024L, 1L), (123456L, 654321L))
    val out = pairs.toDF("a", "b")
      .select(ZOrder.z(col("a"), col("b"), 10).as("z"))
      .collect().map(_.getLong(0))
    pairs.zip(out).foreach { case ((a, b), z) =>
      assert(z == ref(a, b, 10), s"($a, $b)")
    }
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path through a literal-only projection the
    // optimizer constant-folds (ConstantFolding calls eval)
    val z = spark.range(1)
      .select(ZOrder.z(lit(77L), lit(33L), 8).as("z")).head().getLong(0)
    assert(z == ref(77L, 33L, 8))
  }

  test("z-order locality: each bucket covers a bounded rectangle") {
    // 32x32 grid, 4 buckets from the top 2 z-bits: each bucket must span
    // exactly one 16x16 quadrant — the file-skipping property
    val grid = (for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val spans = grid
      .groupBy(shiftright(ZOrder.z(col("a"), col("b"), 5), 8).as("bucket"))
      .agg(min("a").as("la"), max("a").as("ha"), min("b").as("lb"), max("b").as("hb"))
      .collect()
    assert(spans.length == 4)
    spans.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) == 15) // a-span: one half, not the full range
      assert(r.getLong(4) - r.getLong(3) == 15)
    }
  }

  test("clusterBy yields partitions with disjoint, ordered z-ranges") {
    val grid = (for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val parts = ZOrder.clusterBy(grid, "a", "b", 6, numPartitions = 8)
      .select(ZOrder.z(col("a"), col("b"), 6).as("z"))
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    parts.foreach(p => assert(p == p.sorted, "sorted within partition"))
    val ranges = parts.map(p => (p.head, p.last)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "disjoint ranges")
      case _ =>
    }
  }

  test("nulls propagate; bits out of range rejected") {
    val out = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(ZOrder.z(col("a"), col("b"), 4)).collect()
    assert(out.head.isNullAt(0))
    intercept[IllegalArgumentException] { ZOrder2(null, null, 0) }
    intercept[IllegalArgumentException] { ZOrder2(null, null, 32) }
  }
}
