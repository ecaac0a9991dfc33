package graft

import org.apache.spark.sql.functions._

/** The r14 co-purchase edge build (groupBy-collect + per-order pair
  * expansion, [[QueriesAnalytics.coPurchasePairs]]) must produce EXACTLY
  * the edge set of the r13 shape it replaced (distinct → order-keyed
  * self-join → distinct) — the optimization claim is "2 exchanges
  * instead of 4 at an identical result", so the identity is what gets
  * pinned, on real data and on crafted edge cases. */
class CoPurchaseSpec extends SparkSpec {

  private def oldBuild(li: org.apache.spark.sql.DataFrame) = {
    val d = li.distinct()
    d.as("a").join(d.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  test("coPurchasePairs equals the distinct+self-join build on sf0.001 lineitem") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val neu = QueriesAnalytics.coPurchasePairs(li)
    val old = oldBuild(li)
    assert(neu.count() === old.count())
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty)
  }

  test("coPurchasePairs: duplicate memberships, singleton orders, shared pairs") {
    import spark.implicits._
    // order 1: parts {3,1,3} (dup membership) -> edge (1,3)
    // order 2: part {5} (singleton) -> no edges
    // order 3: parts {1,3,7} -> edges (1,3),(1,7),(3,7); (1,3) shared with order 1
    val li = Seq((1L, 3L), (1L, 1L), (1L, 3L), (2L, 5L),
      (3L, 1L), (3L, 3L), (3L, 7L)).toDF("l_orderkey", "l_partkey")
    val got = QueriesAnalytics.coPurchasePairs(li)
      .orderBy("u", "v").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L), (1L, 7L), (3L, 7L)))
    val old = oldBuild(li).orderBy("u", "v").as[(Long, Long)].collect().toSeq
    assert(got === old)
  }
}
