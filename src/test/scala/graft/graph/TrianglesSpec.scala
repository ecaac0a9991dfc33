package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def tri(es: Seq[(Long, Long)]): Long =
    Triangles.count(es.toDF("u", "v"), "u", "v").collect().head.getLong(0)

  test("closed-form counts: K3, K4, square, star, path") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == 1)            // K3
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))) == 4) // K4
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) == 0)  // C4, no chord
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) == 0)  // star
    assert(tri(Seq((1L, 2L), (2L, 3L))) == 0)                      // path
  }

  test("orientation-independent: reversed input edges count the same") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    // K4 minus nothing on {1,2,3,4}? edges: 12,23,13,34,14,24 = K4 -> 4
    assert(tri(es) == 4)
    assert(tri(es.map { case (a, b) => (b, a) }) == 4)
  }

  test("hub graph: triangles through a high-degree center") {
    // center 0 connected to 1..10; rim edges (1,2) and (3,4) close 2 triangles
    val es = (1L to 10L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L))
    assert(tri(es) == 2)
  }

  test("globalClusteringCoefficient: closed forms on triangle and star") {
    import spark.implicits._
    // K3: 1 triangle, 3 wedges -> coefficient 1.0
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val c3 = Triangles.globalClusteringCoefficient(k3, "u", "v").head()
    assert(c3.getLong(0) == 1L && c3.getLong(1) == 3L && c3.getDouble(2) == 1.0)
    // star on 4 leaves: 0 triangles, C(4,2)=6 wedges -> 0.0
    val star = (1L to 4L).map(i => (0L, i)).toDF("u", "v")
    val cs = Triangles.globalClusteringCoefficient(star, "u", "v").head()
    assert(cs.getLong(0) == 0L && cs.getLong(1) == 6L && cs.getDouble(2) == 0.0)
  }
}
