package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // barbell: triangles {1,2,3} and {4,5,6} bridged by 3-4
  private def barbell = {
    val undirected = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    undirected.toDF("src", "dst")
      .unionAll(undirected.map(_.swap).toDF("src", "dst"))
  }
  private def vertices = (1L to 6L).toDF("id")

  test("one synchronous round: every vertex takes its neighbor-min mode") {
    // round 1 from identity labels: each vertex has all-distinct neighbor
    // labels, so the min neighbor label wins everywhere
    val out = LabelProp.run(vertices, "id", barbell, iters = 1)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 3L), (5L, 4L), (6L, 4L)))
  }

  test("labels coalesce into the two communities; deterministic under partitioning") {
    val out = LabelProp.run(vertices, "id", barbell, iters = 6)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // the left triangle's labels all come from {1,2,3}, the right's from
    // {3,4,5,6}-side history — assert community structure, not one label:
    // within each triangle all labels equal
    assert(out.take(3).map(_._2).distinct.length == 1, s"left triangle split: $out")
    assert(out.drop(3).map(_._2).distinct.length == 1, s"right triangle split: $out")
    val again = LabelProp.run(vertices.repartition(7), "id",
      barbell.repartition(5), iters = 6)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(again == out, "partitioning must not change the fixpoint")
  }

  test("isolated vertices keep their own label") {
    val vs = (1L to 8L).toDF("id") // 7 and 8 have no edges
    val out = LabelProp.run(vs, "id", barbell, iters = 3)
      .filter($"id" >= 7L).orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((7L, 7L), (8L, 8L)))
    intercept[IllegalArgumentException] {
      LabelProp.run(vs, "id", barbell, iters = 0)
    }
  }
}
