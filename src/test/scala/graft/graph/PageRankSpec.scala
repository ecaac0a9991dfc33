package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(vs: Seq[Long], es: Seq[(Long, Long)], iters: Int = 30) =
    PageRank.run(vs.toDF("id"), "id", es.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle converges to the uniform distribution") {
    val r = ranksOf(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(r(1L) - 0.5) < 1e-9)
    assert(math.abs(r(2L) - 0.5) < 1e-9)
  }

  test("a sink pulled by two sources outranks them; total mass is 1") {
    val r = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L)))
    assert(r(3L) > r(1L) && r(3L) > r(2L))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(math.abs(r(1L) - r(2L)) < 1e-12) // symmetric sources tie exactly
  }

  test("dangling-node mass is redistributed: ranks still sum to 1") {
    // 3 -> nothing: without redistribution total mass decays each round
    val r = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(3L) > r(2L)) // downstream of the chain accumulates
  }

  test("matches the closed form for a directed chain endpoint") {
    // 1 -> 2 with damping d, n=2, dangling 2 redistributes:
    // fixed point satisfies r1 = (1-d)/2 + d*r2/2 ; r2 = (1-d)/2 + d*(r1 + r2/2)
    val d = 0.85
    val r = ranksOf(Seq(1L, 2L), Seq((1L, 2L)), iters = 60)
    val r1 = r(1L); val r2 = r(2L)
    assert(math.abs(r1 - ((1 - d) / 2 + d * r2 / 2)) < 1e-9)
    assert(math.abs(r2 - ((1 - d) / 2 + d * (r1 + r2 / 2))) < 1e-9)
  }

  test("validate=true rejects edges whose endpoints are not vertices") {
    val vs = Seq(1L, 2L).toDF("id")
    val bad = Seq((1L, 99L)).toDF("src", "dst") // 99 leaks mass silently
    val e = intercept[IllegalArgumentException] {
      PageRank.run(vs, "id", bad, iters = 1, validate = true)
    }
    assert(e.getMessage.contains("rank mass"))
    // the same graph with validation off still runs (documented leak)
    assert(PageRank.run(vs, "id", bad, iters = 1).count() == 2)
  }

  test("runWeighted: uniform weights reduce to run(); heavy edges pull rank") {
    val vs = (1L to 3L).toDF("id")
    val es = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    // uniform weights: identical to the unweighted operator HERE because
    // this graph's out-degrees (1 and 2) make every fraction exactly
    // representable — rank*(w/3w) vs rank/3 would differ by an ulp
    val uw = PageRank.runWeighted(vs, "id",
        es.map { case (a, b) => (a, b, 7.0) }.toDF("src", "dst", "w"),
        "w", iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = PageRank.run(vs, "id", es.toDF("src", "dst"), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uw == plain, "equal weights must reduce to uniform splitting")
    // a degree-3 vertex: numerically equal within an ulp-scale tolerance
    val vs4 = (1L to 4L).toDF("id")
    val es4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
    val uw4 = PageRank.runWeighted(vs4, "id",
        es4.map { case (a, b) => (a, b, 5.0) }.toDF("src", "dst", "w"),
        "w", iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain4 = PageRank.run(vs4, "id", es4.toDF("src", "dst"), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uw4.forall { case (k, v) => math.abs(v - plain4(k)) < 1e-12 })
    // weight 9:1 from vertex 1 pulls vertex 2 above vertex 3
    val wd = PageRank.runWeighted(vs, "id",
        Seq((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
          .toDF("src", "dst", "w"),
        "w", iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wd(2L) > wd(3L) + 0.1, s"heavy edge must dominate: $wd")
    assert(math.abs(wd.values.sum - 1.0) < 1e-9, "mass conserved")
    // non-positive weights are rejected, not silently mass-leaked
    intercept[IllegalArgumentException] {
      PageRank.runWeighted(vs, "id",
        Seq((1L, 2L, 0.0)).toDF("src", "dst", "w"), "w", iters = 1)
    }
  }
}
