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

  /** The estimator's defining identity: estimate = exact count of the
    * coin-kept subgraph × (256/thr)³, with the kept set re-derived
    * independently here (same md5 string the operator hashes). */
  test("approxCount: estimate = exact-on-sample x scale, coin portable") {
    import java.security.MessageDigest
    def coin(u: Long, v: Long): String = MessageDigest.getInstance("MD5")
      .digest(s"tc:$u:$v".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(2)
    // a dense-ish graph so some edges survive any threshold: K8
    val es = for {
      a <- 1L to 8L; b <- (a + 1) to 8L
    } yield (a, b)
    for (thr <- Seq("20", "80", "c0")) {
      val kept = es.filter { case (u, v) => coin(u, v) < thr }
      val exactOnSample =
        if (kept.isEmpty) 0L
        else Triangles.count(kept.toDF("u", "v"), "u", "v").head().getLong(0)
      val t = Integer.parseInt(thr, 16)
      val expected = exactOnSample * math.pow(256.0 / t, 3)
      val row = Triangles.approxCount(es.toDF("u", "v"), "u", "v", thr).head()
      assert(row.getDouble(0) == expected, s"thr=$thr")
      assert(row.getLong(1) == kept.size.toLong, s"thr=$thr sampled_edges")
    }
  }

  test("approxCount: deterministic under repartition and row order") {
    val es = (for { a <- 1L to 10L; b <- (a + 1) to 10L } yield (a, b))
    val df = es.toDF("u", "v")
    val a = Triangles.approxCount(df, "u", "v", "55").head()
    val b = Triangles.approxCount(
      df.repartition(7).sortWithinPartitions("v"), "u", "v", "55").head()
    assert(a == b)
    // shuffled input ROWS (not flipped endpoints - the coin is on (u,v) as given)
    val c = Triangles.approxCount(
      scala.util.Random.shuffle(es).toDF("u", "v"), "u", "v", "55").head()
    assert(a == c)
  }

  test("approxCount: rejects malformed or zero thresholds") {
    val df = Seq((1L, 2L)).toDF("u", "v")
    intercept[IllegalArgumentException](Triangles.approxCount(df, "u", "v", "GG"))
    intercept[IllegalArgumentException](Triangles.approxCount(df, "u", "v", "0"))
    intercept[IllegalArgumentException](Triangles.approxCount(df, "u", "v", "00"))
  }

  /** Vertex-sampled estimator: identity against an independently
    * re-derived induced subgraph, and pushed ≡ unpushed — filtering
    * vertices BEFORE building edges (the scan-pushdown scale shape)
    * gives the same estimate as handing the full edge list to the
    * operator's defensive endpoint re-filter. */
  test("approxCountInduced: estimate identity and pushed = unpushed") {
    import java.security.MessageDigest
    def coin(x: Long, thr: String): Boolean = MessageDigest.getInstance("MD5")
      .digest(s"tcv:$x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(2) < thr
    val es = for { a <- 1L to 12L; b <- (a + 1) to 12L } yield (a, b) // K12
    for (thr <- Seq("40", "80", "c0")) {
      val keptV = (1L to 12L).filter(coin(_, thr)).toSet
      val induced = es.filter { case (u, v) => keptV(u) && keptV(v) }
      val exactOnSample =
        if (induced.isEmpty) 0L
        else Triangles.count(induced.toDF("u", "v"), "u", "v").head().getLong(0)
      val t = Integer.parseInt(thr, 16)
      val expected = exactOnSample * math.pow(256.0 / t, 3)
      val unpushed = Triangles.approxCountInduced(es.toDF("u", "v"), "u", "v", thr).head()
      assert(unpushed.getDouble(0) == expected, s"thr=$thr")
      assert(unpushed.getLong(1) == induced.size.toLong, s"thr=$thr edges")
      // pushed form: caller pre-filters with the exposed coin predicate
      val pre = es.toDF("u", "v")
        .filter(Triangles.vertexCoin(org.apache.spark.sql.functions.col("u"), thr) &&
          Triangles.vertexCoin(org.apache.spark.sql.functions.col("v"), thr))
      assert(Triangles.approxCountInduced(pre, "u", "v", thr).head() == unpushed,
        s"thr=$thr pushed vs unpushed")
    }
  }
}
