package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list, degree-oriented: every
  * edge is directed from its lower-(degree, id) endpoint to the higher one,
  * and triangles = Σ over oriented edges (s,t) of |N⁺(s) ∩ N⁺(t)| — the
  * node-iterator++ adjacency-intersection form. Each triangle is counted
  * exactly once, and — the scale property — per-node out-degrees under
  * degree orientation are O(√m), so every per-edge intersection does
  * bounded work even on hub-heavy graphs where id-orientation explodes (a
  * hub that is globally popular becomes a SINK, not a source). Three hash
  * joins + one aggregate; ranks are (degree, id) structs compared
  * lexicographically — no global row-numbering bottleneck.
  */
object Triangles {

  /** @param edges one row per unordered edge; endpoints must differ
    *              (self-loops would count spurious triangles — drop them
    *              upstream) and each pair must appear once in either
    *              direction (deduplicate upstream).
    * @return single row (triangles) */
  def count(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // e feeds two branches (degrees + orientation) and o feeds three join
    // legs — materialize each once (eager localCheckpoint, the same device
    // as PageRank/connectedComponents; blocks free on GC) instead of
    // re-deriving the upstream per branch
    val e = graft.util.Checkpoints.eager(
      edges.select(col(srcCol).as("a"), col(dstCol).as("b")))
    val deg = e.select(col("a").as("x")).unionAll(e.select(col("b").as("x")))
      .groupBy(col("x")).agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    val withD = e
      .join(deg.select(col("x").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("d").as("db")), "b")
    def rank(d: String, id: String) =
      struct(col(d).as("d"), col(id).as("x"))
    val o = withD.select(
      when(rank("da", "a") < rank("db", "b"),
        struct(col("a").as("s"), col("b").as("t")))
      .otherwise(
        struct(col("b").as("s"), col("a").as("t")))
      .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      .transform(graft.util.Checkpoints.eager)
    // node-iterator++: triangles = Σ over oriented edges (s,t) of
    // |N⁺(s) ∩ N⁺(t)|. The per-node out-neighbor lists are O(√m) long
    // under degree orientation, so each edge does bounded work and NO
    // wedge set is ever materialized or shuffled (the wedge-join form
    // moves Σ outdeg² rows — 25M on the sf0.1 co-purchase graph — where
    // this moves |E| rows once and intersects in-place, codegen'd).
    val adj = o.groupBy(col("s")).agg(collect_list(col("t")).as("nbrs"))
    o.join(adj.select(col("s"), col("nbrs").as("ns")), "s")
      .join(adj.select(col("s").as("t"), col("nbrs").as("nt")), Seq("t"), "left")
      .select(when(col("nt").isNull, lit(0)) // sinks have no out-list; size(NULL) = -1
        .otherwise(size(array_intersect(col("ns"), col("nt")))).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("triangles")) // empty graph: 0, not NULL
  }

  /** Global clustering coefficient `3·triangles / wedges` — the one-number
    * "how cliquey is this graph" summary (wedges = Σ d(d−1)/2 over vertex
    * degrees). Same input contract as [[count]]: each undirected edge once
    * in either orientation, no self-loops. The degree pass is one
    * aggregation over 2|E| rows; d(d−1) is even, so the wedge count stays
    * an exact integer. Output: one row (triangles, wedges, global_coeff). */
  def globalClusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // materialize the (possibly expensive) upstream edge derivation ONCE —
    // both the triangle count and the degree pass read it, and without
    // this the tc2 co-purchase self-join executed twice per call
    val e = graft.util.Checkpoints.eager(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v")))
    val tri = count(e, "u", "v")
    val deg = e.select(col("u").as("__x"))
      .unionAll(e.select(col("v").as("__x")))
      .groupBy(col("__x")).agg(org.apache.spark.sql.functions.count(lit(1)).as("__d"))
    val wed = deg.agg(coalesce((sum(col("__d") * (col("__d") - 1)) / 2)
      .cast("bigint"), lit(0L)).as("wedges"))
    tri.crossJoin(wed)
      .select(col("triangles"), col("wedges"),
        round(lit(3.0) * col("triangles") / col("wedges"), 6).as("global_coeff"))
  }

  /** Doulion approximate triangle count (Tsourakakis et al., KDD 2009):
    * keep each edge with an independent coin of probability
    * `thr/256`, count triangles EXACTLY on the sparsified graph with
    * [[count]], scale by `(256/thr)³` — an unbiased estimator whose
    * wedge work shrinks by ~p³. This is the 100 TB path past exact
    * counting's inherent Σ outdeg² growth (the r12 sf3 sweep measured
    * tc1/tc2 at ~5.5× for 3× data — structural, not a plan defect):
    * at p = 1/4 the intersection work drops ~64×, and concentration
    * (Doulion thm. 1) tightens as the true count grows, which is
    * exactly the 100 TB regime.
    *
    * The coin is the portable md5 device (`md5("tc:" u ":" v)` first
    * two hex chars < thr — the hashSample/w6 convention, namespaced so
    * it is independent of any other sampler's draw on the same keys):
    * a pure function of the canonical edge, so the sample — hence the
    * estimate — is identical across engines, partitionings and runs,
    * and the whole estimator is SQL-restatable. Same input contract as
    * [[count]] (each undirected edge once, canonically oriented —
    * the coin hashes (src, dst) AS GIVEN, so a flipped duplicate
    * would draw a different coin; no self-loops).
    *
    * @param thresholdHex 2 lowercase hex chars; keep prob = thr/256
    * @return single row (est_triangles: double, sampled_edges: long) */
  def approxCount(edges: DataFrame, srcCol: String, dstCol: String,
      thresholdHex: String): DataFrame = {
    require(thresholdHex.matches("[0-9a-f]{2}"),
      s"threshold '$thresholdHex' must be exactly 2 lowercase hex chars")
    val thr = Integer.parseInt(thresholdHex, 16)
    require(thr > 0, "zero keep probability estimates nothing")
    val scale = math.pow(256.0 / thr, 3)
    val kept = edges.filter(
      substring(md5(concat(lit("tc:"), col(srcCol).cast("string"),
        lit(":"), col(dstCol).cast("string"))), 1, 2) < lit(thresholdHex))
    val m = kept.agg(org.apache.spark.sql.functions.count(lit(1)).as("sampled_edges"))
    count(kept, srcCol, dstCol)
      .select((col("triangles") * lit(scale)).as("est_triangles"))
      .crossJoin(m)
  }

  /** The vertex coin of [[approxCountInduced]], exposed so callers can
    * push it BELOW whatever join derives their edge list — the md5
    * device on the vertex id, `tcv:`-namespaced (independent of
    * [[approxCount]]'s edge coin and every other sampler's draw on the
    * same ids). */
  def vertexCoin(idCol: org.apache.spark.sql.Column,
      thresholdHex: String): org.apache.spark.sql.Column =
    substring(md5(concat(lit("tcv:"), idCol.cast("string"))), 1, 2) <
      lit(thresholdHex)

  /** Vertex-sampled approximate triangle count (the colorful-counting
    * family, Pagh & Tsourakakis 2012, simple-coin form): keep each
    * VERTEX with probability `thr/256`, count exactly on the induced
    * subgraph, scale by `(256/thr)³` (a triangle survives iff all three
    * vertices do). Where [[approxCount]]'s edge coin only sparsifies
    * the counting phase, the vertex coin pushes BELOW the join that
    * derives the edges — for tc1's co-purchase graph the coin filters
    * the lineitem SCAN, so the pair self-join itself shrinks ~p² (the
    * phase the r12 sf3 measurements showed dominates: edge-coin tc3 ran
    * only 2.0× faster than exact at 30× because the edge derivation is
    * untouched). Estimator variance is higher than edge-sampling at
    * equal p (survival is p³ vs p per edge) — the classic tradeoff;
    * both are unbiased.
    *
    * Defensively re-filters BOTH endpoints, so semantics hold whether
    * or not the caller pre-filtered — pre-filtering at the scan (via
    * [[vertexCoin]], as tc4 does) is the scale win, and then the
    * re-filter passes everything and costs one codegen'd predicate.
    *
    * @return single row (est_triangles: double, sampled_edges: long) */
  def approxCountInduced(edges: DataFrame, srcCol: String, dstCol: String,
      thresholdHex: String): DataFrame = {
    require(thresholdHex.matches("[0-9a-f]{2}"),
      s"threshold '$thresholdHex' must be exactly 2 lowercase hex chars")
    val thr = Integer.parseInt(thresholdHex, 16)
    require(thr > 0, "zero keep probability estimates nothing")
    val scale = math.pow(256.0 / thr, 3)
    val kept = edges.filter(
      vertexCoin(col(srcCol), thresholdHex) &&
        vertexCoin(col(dstCol), thresholdHex))
    val m = kept.agg(org.apache.spark.sql.functions.count(lit(1)).as("sampled_edges"))
    count(kept, srcCol, dstCol)
      .select((col("triangles") * lit(scale)).as("est_triangles"))
      .crossJoin(m)
  }
}
