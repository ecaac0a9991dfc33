package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("k-core peels stars, keeps cliques, cascades chains") {
    // K4 on {1,2,3,4} + a pendant chain 4-5-6 + star center 7 -> leaves 8,9
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L), (5L, 6L),                                         // chain
      (7L, 8L), (7L, 9L))                                         // star
      .toDF("u", "v")
    // 3-core: only the K4 survives (chain+star peel away, CASCADING:
    // removing 6 drops 5's degree, then 5 drops, then 4 keeps core degree)
    val core3 = KCore.vertices(edges, "u", "v", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3.keySet == Set(1L, 2L, 3L, 4L))
    assert(core3.values.forall(_ == 3L), "inside K4 every degree is 3")
    // 2-core: still just the K4 (chain endpoints have degree 1 and cascade)
    assert(KCore.vertices(edges, "u", "v", k = 2)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // 1-core: everything with at least one edge
    assert(KCore.vertices(edges, "u", "v", k = 1).count() == 9)
    // 5-core: nothing
    assert(KCore.vertices(edges, "u", "v", k = 5).isEmpty)
    intercept[IllegalArgumentException] { KCore.vertices(edges, "u", "v", 0) }
  }

  test("truncatedPeel: each round is one peel pass; enough rounds reproduce the fixpoint") {
    // K4 + chain 4-5-6 + star 7->{8,9}
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (7L, 8L), (7L, 9L))
      .toDF("u", "v")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    // degrees are computed once per round from the round's INCOMING edge
    // set: 5 (degree 2), 6, 7, 8, 9 all drop in round 1; 4 survives it
    // (incoming degree 4), so round 1 already leaves the K4
    val r1 = KCore.truncatedPeel(edges, "u", "v", k = 3, rounds = 1)
    assert(ids(r1) == Set(1L, 2L, 3L, 4L), "round 1 removes every degree<3 vertex")
    // every truncation is a superset of the fixpoint, shrinking to it
    val fix = ids(KCore.vertices(edges, "u", "v", k = 3))
    (1 to 4).foreach { r =>
      val tr = ids(KCore.truncatedPeel(edges, "u", "v", k = 3, rounds = r))
      assert(fix.subsetOf(tr), s"rounds=$r must keep the whole core")
    }
    assert(ids(KCore.truncatedPeel(edges, "u", "v", k = 3, rounds = 4)) == fix)
    // genuine truncation: k=2 on the chain peels one endpoint per round,
    // so rounds=1 is a STRICT superset of the fixpoint
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val t1 = ids(KCore.truncatedPeel(chain, "u", "v", k = 2, rounds = 1))
    assert(t1 == Set(2L, 3L), "rounds=1 keeps the middle of the chain")
    assert(ids(KCore.truncatedPeel(chain, "u", "v", k = 2, rounds = 2)).isEmpty,
      "round 2 cascades the rest away")
    intercept[IllegalArgumentException] {
      KCore.truncatedPeel(chain, "u", "v", k = 2, rounds = 0)
    }
  }

  test("k-core output is repartition-independent") {
    val edges = (1L to 30L).flatMap(i => Seq((i, i % 30 + 1), (i, (i + 2) % 30 + 1)))
      .toDF("u", "v")
    val a = KCore.vertices(edges, "u", "v", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = KCore.vertices(edges.repartition(7), "u", "v", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
