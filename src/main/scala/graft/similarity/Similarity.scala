package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity primitives + approximate-nearest-neighbor search over
  * an embedding column (`array<float>`), a first-class training-data-
  * pipeline operator (no counterpart in the reference — its only vector use
  * is GloVe text embeddings, ctu_dataset.py:43-52).
  *
  * Dot products use a deterministic left-fold (`aggregate` higher-order
  * function) over explicit double casts, so the result is bit-identical to
  * any engine that folds the list sequentially — which makes the cosine
  * oracle-comparable against DuckDB.
  */
object Similarity {

  /** Deterministic sequential-fold dot product of two array columns —
    * a native codegen Catalyst expression ([[graft.functions.DotProduct]]:
    * tight primitive loop, no per-element lambda dispatch or intermediate
    * zipped array). [[dotHof]] is the pure-builtin equivalent; both fold
    * left-to-right, so results are bit-identical. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  /** Higher-order-function form of [[dot]] (kept for cross-checking the
    * native expression and for environments that forbid custom
    * expressions). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** A constant vector as ONE `Literal` node (backed by a single
    * `ArrayData` the generated code merely references), never
    * `array(xs.map(lit): _*)` — a `CreateArray` of d literals codegens
    * d element stores + a `GenericArrayData` construction PER SITE, and a
    * codebook/centroid spine holds hundreds of such sites, which is
    * exactly how the PQ/IVF scoring projection blew past janino's 64 KB
    * method limit and silently fell back to interpreted mode. */
  def litVec(xs: Array[Double]): Column = typedLit(xs)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalize a vector column given its precomputed norm column.
    * Pair-wise loops should normalize each side ONCE and use [[dot]] as the
    * cosine: 1 array-fold per pair instead of 3 (dot + two norms) — the
    * difference between O(pairs·dim) and O(3·pairs·dim) in the hot loop,
    * and norms are computed O(n) not O(pairs). */
  def unit(vec: Column, nrm: Column): Column =
    transform(vec, x => x.cast("double") / nrm)

  /** Deterministic ±1 Johnson–Lindenstrauss sign for entry (i, j) of the
    * seeded projection matrix — parity of the first md5 nibble of
    * `"seed:i:j"` (the portable-coin device), identical in any engine
    * with md5: even nibble (0,2,4,6,8,a,c,e) → +1. */
  def jlSign(seed: String, i: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$i:$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random projection: replaces `vecCol` with the
    * outDim-vector `y_j = (Σ_i sign(i,j)·x_i)·√outDim⁻¹`, signs baked as
    * plan literals (the d5 plane-literal device — Achlioptas 2001 showed
    * ±1 entries suffice for the JL guarantee). ONE codegen projection,
    * no shuffle, no UDF: at 100 TB the reduction runs at scan speed, so
    * ANN candidate generation can work in the reduced space (outDim-cost
    * dot products) and verify survivors in the original — rp1 measures
    * exactly that recall on real data. */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      seed: String = "rp"): DataFrame =
    df.withColumn(vecCol, jlProjection(col(vecCol), inDim, outDim, seed))

  /** The projection as a column expression — callers that need BOTH the
    * original and the reduced vector in one pass (the rp1 distortion
    * audit) select it beside the source column. */
  def jlProjection(vec: Column, inDim: Int, outDim: Int,
      seed: String = "rp"): Column = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"need 1 <= outDim <= inDim, got $inDim -> $outDim")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      (0 until inDim).map(i =>
        element_at(vec, i + 1).cast("double") * lit(jlSign(seed, i, j)))
        .reduce(_ + _) * lit(scale)
    }: _*)
  }

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * The query side is broadcast (it is the small side by construction);
    * the corpus streams partition-parallel, so at 100 TB this is one
    * map-side pass over the corpus + a per-query-key top-k shuffle.
    *
    * @param queries  (idCol, vecCol) rows to search for
    * @param corpus   (idCol, vecCol) rows to search in
    * @param k        neighbors per query
    * @return (query_id, neighbor_id, cos) — excludes self-matches,
    *         ties broken by neighbor id for determinism
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, roundDigits: Int = -1): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val rawCos = cosine(col("__qv"), col("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", if (roundDigits >= 0) round(rawCos, roundDigits) else rawCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** Cosine range search: ALL corpus neighbors above a similarity
    * threshold per query — the radius twin of [[bruteForceTopK]] (dedup
    * sweeps and contamination checks want "everything closer than τ", not
    * a fixed k). Same broadcast-queries shape: the corpus scan stays
    * partitioned, each task filters against the broadcast query block, and
    * no window is needed at all — the threshold IS the cut, so the output
    * never sorts. Zero-norm vectors (cosine undefined) are excluded from
    * both sides rather than surfacing as NaN (the int8TopK device). */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, minCos: Double, roundDigits: Int = -1): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"minCos must be in (-1, 1], got $minCos (at -1 or below, " +
        "every pair passes and the result is a cross product)")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .filter(dot(col("__qv"), col("__qv")) > 0)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .filter(dot(col("__cv"), col("__cv")) > 0)
    val rawCos = cosine(col("__qv"), col("__cv"))
    val cos = if (roundDigits >= 0) round(rawCos, roundDigits) else rawCos
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cos)
      .filter(col("cos") >= minCos)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** Maximal-marginal-relevance re-rank of an ANN shortlist: greedily pick
    * `m` results maximizing `λ·relevance − (1−λ)·max-similarity-to-picked`
    * — the diversification pass between retrieval and consumption (dedup
    * of near-identical hits). Greedy selection is inherently sequential
    * PER QUERY but embarrassingly parallel ACROSS queries, and the input
    * is a top-k shortlist (k rows per query, bounded by construction), so
    * this runs as `mapGroups` over the candidate groups — the same
    * bounded-per-group batch shape as `Multimodal.decodeBatched`, chosen
    * over an expression-level nested fold whose codegen grows O(m·k·dim).
    *
    * @param candidates (query_id, neighbor_id, cos) shortlist, e.g. from
    *                   [[bruteForceTopK]] with a widened k
    * @param corpus     (idCol, vecCol) to resolve neighbor vectors
    * @param m          results to keep per query
    * @param lambda     relevance weight in [0, 1]; 1 ⇒ plain top-k order
    * @return (query_id, neighbor_id, cos, rank) — rank is selection order,
    *         ties broken by (cos desc, neighbor id) for determinism
    */
  def mmrRerank(candidates: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, lambda: Double): DataFrame = {
    require(m >= 1, s"need m >= 1, got $m")
    require(lambda >= 0 && lambda <= 1, s"lambda $lambda must be in [0, 1]")
    val sp = candidates.sparkSession
    import sp.implicits._
    val withVec = candidates
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__v")), "neighbor_id")
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("cos").cast("double"), col("__v"))
      .as[(Long, Long, Double, Seq[Double])]
    withVec.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.toArray.sortBy(c => (-c._3, c._2))
        val vecs = cands.map(_._4.toArray)
        val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
        val used = new Array[Boolean](cands.length)
        // Running max cosine against the picked set, refreshed with only the
        // newest pick each round: O(m·k·dim) total instead of O(m²·k·dim).
        val maxDiv = new Array[Double](cands.length)
        def cosine(a: Array[Double], b: Array[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
          dot / math.sqrt(na * nb)
        }
        while (picked.length < math.min(m, cands.length)) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cands.length) {
            if (!used(i)) {
              val s = lambda * cands(i)._3 - (1 - lambda) * maxDiv(i)
              if (s > bestScore) { bestScore = s; best = i } // candidates pre-sorted: ties keep the earlier (higher cos, lower id)
              else if (best == -1) best = i // NaN score (zero-norm vector → NaN cos) never wins a comparison; keep the first unused so selection can't dereference -1
            }
            i += 1
          }
          used(best) = true
          picked += ((qid, cands(best)._2, cands(best)._3, picked.length + 1))
          var j = 0
          while (j < cands.length) {
            if (!used(j)) {
              val d = cosine(vecs(j), vecs(best))
              if (d > maxDiv(j)) maxDiv(j) = d // NaN divergence compares false → treated as 0, matching the old max-over-set behavior on valid pairs
            }
            j += 1
          }
        }
        picked.iterator
      }
      .toDF("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplanes for LSH: plane p, component i
    * derives from a splitmix64-style integer mix of (seed, p, i), mapped to
    * [-1, 1). Generated driver-side as literals — h×dim doubles, trivially
    * broadcastable. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      var z = seed + 0x9e3779b97f4a7c15L * (p.toLong * 65537L + i + 1L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }

  /** Random-hyperplane LSH signature: bit p = sign(v · plane_p), packed into
    * a long. Cosine-similar vectors collide with high probability. */
  /** The nPlanes that holds expected LSH bucket occupancy near
    * `targetBucketSize` as the corpus grows: 2^nPlanes buckets ⇒
    * `ceil(log2(n / target))`, clamped to [1, 63]. The REGISTERED
    * benchmark queries fix nPlanes so their hash-defined outputs stay
    * stable round-over-round — but in-bucket candidate pairs grow
    * ~n²/2^nPlanes, so a fixed nPlanes at 10× the data means ~100× the
    * pair work (measured: d5 ran 36× at the r10 sf1 sweep). A production
    * pipeline derives nPlanes from the corpus count with this helper and
    * the pair work stays ~n·target/2. */
  def nPlanesFor(corpusSize: Long, targetBucketSize: Int = 16): Int = {
    require(corpusSize >= 1, s"corpusSize must be >= 1, got $corpusSize")
    require(targetBucketSize >= 1, s"targetBucketSize must be >= 1, got $targetBucketSize")
    val raw = math.ceil(
      math.log(corpusSize.toDouble / targetBucketSize) / math.log(2.0)).toInt
    math.max(1, math.min(63, raw))
  }

  def lshSignature(vecCol: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    require(nPlanes >= 0 && nPlanes <= 63, "signature packs into one long")
    val planes = hyperplanes(nPlanes, dim, seed)
    // nPlanes = 0 degenerates to the constant signature (one bucket =
    // exhaustive search) — the oracle-anchor parameter for lshTopK
    planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = litVec(plane)
      when(dot(vecCol, planeCol) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.foldLeft(lit(0L))(_ + _)
  }

  /** LSH-bucketed ANN (the scale path): vectors sharing an exact nPlanes-bit
    * signature land in one bucket; search within buckets only. Recall is
    * tunable via nPlanes (fewer planes → bigger buckets → higher recall,
    * more compute). A full multiprobe/IVF variant can layer on the same
    * bucket column.
    *
    * @return (query_id, neighbor_id, cos) top-k within each query's bucket
    */
  def lshTopK(data: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int, dim: Int, seed: Long = 42L): DataFrame = {
    val sig = data.select(col(idCol), col(vecCol),
        lshSignature(col(vecCol), nPlanes, dim, seed).as("__bucket"),
        norm(col(vecCol)).as("__n"))
      .select(col(idCol), col("__bucket"), unit(col(vecCol), col("__n")).as("__u"))
    val l = sig.select(col("__bucket"), col(idCol).as("query_id"), col("__u").as("__qv"))
    val r = sig.select(col("__bucket"), col(idCol).as("neighbor_id"), col("__u").as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    l.join(r, "__bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("__qv"), col("__cv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** F21: softmax over an array column (exp-normalize, numerically stable)
    * and argmax position (0-based), matching
    * `torch.softmax(x, dim=1)` / `argmax` (nn/models/transformer.py:113). */
  def softmaxArray(c: Column): Column = {
    val mx = array_max(c)
    val exps = transform(c, x => exp(x.cast("double") - mx))
    val s = aggregate(exps, lit(0.0), (acc, v) => acc + v)
    transform(exps, x => x / s)
  }

  def argmaxArray(c: Column): Column = array_position(c, array_max(c)) - 1
}
