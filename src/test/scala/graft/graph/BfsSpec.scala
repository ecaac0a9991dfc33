package graft.graph

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4-5 with a chord 1-3, plus a disconnected edge 8-9
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (8L, 9L))
    .toDF("u", "v")

  private def run(source: Long, depth: Int): Map[Long, Int] =
    Bfs.levels(edges, "u", "v", source, depth)
      .as[(Long, Int)].collect().toMap

  test("levels are shortest-path distances; the chord shortcuts 3") {
    assert(run(1L, 10) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("edges are undirected: BFS from the far end walks back") {
    assert(run(5L, 10) == Map(5L -> 0, 4L -> 1, 3L -> 2, 2L -> 3, 1L -> 3))
  }

  test("disconnected vertices never appear") {
    assert(!run(1L, 10).contains(8L) && !run(1L, 10).contains(9L))
    assert(run(8L, 10) == Map(8L -> 0, 9L -> 1))
  }

  test("maxDepth caps the walk; depth 0 is just the source") {
    assert(run(1L, 1) == Map(1L -> 0, 2L -> 1, 3L -> 1))
    assert(run(1L, 0) == Map(1L -> 0))
  }

  test("a vertex reachable two ways keeps the SHORTER distance") {
    // 1-2, 2-3, 1-3: vertex 3 is reached at depth 1, not re-labeled at 2
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val got = Bfs.levels(tri, "u", "v", 1L, 5).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }
}
