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

  test("coPurchasePairs: NULL l_orderkey rows pair with nothing (oracle equi-join semantics)") {
    import spark.implicits._
    // two NULL-order rows: the old self-join (and the SQL oracle) drops them;
    // a bare groupBy would have paired 11 with 13 through the NULL group
    val li = Seq((Some(1L), 3L), (Some(1L), 7L), (None, 11L), (None, 13L))
      .toDF("l_orderkey", "l_partkey")
    val got = QueriesAnalytics.coPurchasePairs(li)
      .orderBy("u", "v").as[(Long, Long)].collect().toSeq
    assert(got === Seq((3L, 7L)))
    val old = oldBuild(li).orderBy("u", "v").as[(Long, Long)].collect().toSeq
    assert(got === old)
  }

  test("coPurchasePairs: a giant basket streams pairs without one O(basket²) cell") {
    import spark.implicits._
    // 1500 distinct parts in ONE order -> 1500*1499/2 = 1_124_250 pairs.
    // The two-level explode keeps per-row state O(basket); this both checks
    // the count algebra and exercises the path the r14 single-array
    // expansion would have materialized as one 1.1M-struct cell.
    val n = 1500
    val li = (1 to n).map(p => (1L, p.toLong)).toDF("l_orderkey", "l_partkey")
    val e = QueriesAnalytics.coPurchasePairs(li)
    assert(e.count() === n.toLong * (n - 1) / 2)
    import org.apache.spark.sql.functions._
    val chk = e.agg(sum(col("u")).as("su"), sum(col("v")).as("sv"),
      min(col("u")).as("mu"), max(col("v")).as("mv")).collect()(0)
    // Σu over all pairs u<v: u appears (n-u) times; Σv: v appears (v-1) times
    val su = (1 to n).map(u => u.toLong * (n - u)).sum
    val sv = (1 to n).map(v => v.toLong * (v - 1)).sum
    assert(chk.getLong(0) === su && chk.getLong(1) === sv)
    assert(chk.getLong(2) === 1L && chk.getLong(3) === n.toLong)
  }
}
