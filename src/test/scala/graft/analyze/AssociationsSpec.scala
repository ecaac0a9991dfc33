package graft.analyze

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  // 5 baskets: (1,2) together 3×, (1,3) together 2×, 3 alone once
  private def baskets = Seq(
    (10L, 1L), (10L, 2L),
    (20L, 1L), (20L, 2L), (20L, 3L),
    (30L, 1L), (30L, 2L),
    (40L, 1L), (40L, 3L),
    (50L, 3L)).toDF("b", "i")

  test("pair counts, support, confidence, and lift are exact") {
    val rows = Associations.frequentPairs(baskets, "b", "i", minCount = 2)
      .orderBy("item_a", "item_b")
      .select("item_a", "item_b", "pair_n", "n_a", "n_b", "n_baskets",
        "support", "conf_ab", "conf_ba", "lift")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // items: 1 in 4 baskets, 2 in 3, 3 in 3; pairs: (1,2)=3, (1,3)=2, (2,3)=1
    assert(rows == Seq(
      (1L, 2L, 3L, 4L, 3L, 5L, 0.6, 0.75, 1.0, 1.25),
      (1L, 3L, 2L, 4L, 3L, 5L, 0.4, 0.5, 0.6667, 0.8333)))
  }

  test("the a-priori prune never loses a frequent pair (brute-force equivalence)") {
    // 30 baskets of 2-5 items from a 12-item universe, deterministically
    val dense = (1 to 30).flatMap { b =>
      (0 until 2 + b % 4).map(j => (b.toLong, ((b * 7 + j * 5) % 12).toLong))
    }.toDF("b", "i")
    for (minCount <- Seq(2L, 4L, 7L)) {
      val pruned = Associations.frequentPairs(dense, "b", "i", minCount)
        .select("item_a", "item_b", "pair_n")
      // no item prune: generate every co-occurring pair, then threshold
      val li = dense.distinct()
      val all = li.as("a").join(li.as("b"),
          col("a.b") === col("b.b") && col("a.i") < col("b.i"))
        .groupBy(col("a.i").as("item_a"), col("b.i").as("item_b"))
        .agg(count(lit(1)).as("pair_n"))
        .filter(col("pair_n") >= minCount)
      assert(pruned.exceptAll(all).isEmpty && all.exceptAll(pruned).isEmpty,
        s"minCount=$minCount")
    }
  }

  test("duplicate (basket, item) memberships do not inflate counts") {
    val doubled = baskets.unionAll(baskets)
    val a = Associations.frequentPairs(baskets, "b", "i", 2)
      .select("item_a", "item_b", "pair_n")
    val b = Associations.frequentPairs(doubled, "b", "i", 2)
      .select("item_a", "item_b", "pair_n")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("minCount below any pair count yields no rows, not an error") {
    assert(Associations.frequentPairs(baskets, "b", "i", 100).isEmpty)
  }

  test("NULL baskets and NULL items pair with nothing (self-join-semantics parity)") {
    // the r14 __b-keyed self-join dropped NULL baskets via the equi-join;
    // the r15 basket-collect drops them via an explicit filter — pin that
    // they agree, and that NULL items never survive the frequent-item join
    val withNulls = Seq(
      (Option(10L), Option(1L)), (Option(10L), Option(2L)),
      (Option.empty[Long], Option(1L)), (Option.empty[Long], Option(2L)),
      (Option(20L), Option(1L)), (Option(20L), Option(2L)),
      (Option(30L), Option.empty[Long])
    ).toDF("b", "i")
    val got = Associations.frequentPairs(withNulls, "b", "i", 2)
      .select("item_a", "item_b", "pair_n")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L)))
  }
}
