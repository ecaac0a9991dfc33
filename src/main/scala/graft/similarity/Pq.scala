package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.agg.VectorAgg

/** Product quantization (PQ) approximate nearest neighbor — the
  * memory-compression scale path beside [[Ivf]] (cell pruning) and
  * [[Similarity.lshTopK]] (bucketing): split each vector into `m`
  * subspaces, k-means each subspace to `ksub` codes, and store every
  * corpus vector as `m` small ints (e.g. 8 bytes/vector at m=8 instead of
  * 256 for a float64[32]) — the difference between an embedding index
  * that fits executor memory at 100 TB corpus scale and one that doesn't.
  *
  * Search is asymmetric distance computation (ADC): per query, one
  * `m × ksub` lookup table of subspace dot products (pure literal-array
  * expressions — computed inside codegen, never shuffled), then every
  * corpus code scores with `m` array lookups. A shortlist of `refine`
  * candidates re-ranks with EXACT cosine on the original vectors, so
  * reported scores are true cosines (PQ error only affects which
  * candidates make the shortlist). Compose with [[Ivf]] cells to prune
  * before scoring (IVF-PQ) when a full compressed scan is still too much.
  *
  * Training runs ONE aggregation pass per Lloyd iteration covering all m
  * subspaces (explode to (subspace, subvector), argmin-assign against the
  * current literal codebooks, per-(subspace, code) vector mean) — never a
  * pass per subspace.
  */
object Pq {

  /** `books(j)(c)` = centroid c of subspace j, each of length dim/m. */
  final case class Codebooks(dim: Int, m: Int, ksub: Int,
      books: Array[Array[Array[Double]]]) {
    val subDim: Int = dim / m
  }

  private def subVec(vecCol: Column, j: Int, subDim: Int): Column =
    slice(vecCol.cast("array<double>"), j * subDim + 1, subDim)

  /** PQ here serves cosine search, so codebooks, codes and lookup tables
    * all live in UNIT-vector space — training and encoding normalize at
    * entry (idempotent for already-unit input). Mixing spaces (train raw,
    * encode unit) would collapse assignments to near-constant codes. */
  private def unitized(data: DataFrame, idCol: String, vecCol: String): DataFrame =
    data.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol),
        Similarity.unit(col("__v"), Similarity.norm(col("__v"))).as(vecCol))

  /** Nearest-code id (0-based) of a subvector within one subspace's
    * codebook: argmin of |c|² − 2·v·c, one native dot per code. */
  private def codeExpr(sub: Column, book: Array[Array[Double]]): Column = {
    val scores = book.map { c =>
      val normSq = c.map(x => x * x).sum
      lit(normSq) - lit(2.0) * Similarity.dot(sub, Similarity.litVec(c))
    }
    val arr = array(scores: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** Deterministic Lloyd per subspace, all subspaces per pass. Init picks
    * `ksub` evenly-id-spaced rows (as [[Ivf.trainCentroids]]) and slices
    * them into every subspace's initial codes; empty codes persist. */
  def trainCodebooks(data: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, iters: Int = 3): Codebooks = {
    require(dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val subDim = dim / m
    val unit = unitized(data, idCol, vecCol)
    val n = unit.count()
    // Fewer rows than codes would silently yield a short codebook while
    // Codebooks.ksub still reported the requested value — fail loudly.
    require(n >= ksub, s"corpus has $n rows but ksub=$ksub codes requested")
    val step = math.max(1L, n / ksub)
    val withId = graft.graph.RelGraph.withRowId(
      unit.select(col(idCol), col(vecCol)), Seq(idCol))
    val seeds: Array[Array[Double]] = withId
      .filter(col(graft.graph.RelGraph.RowId) % step === 0)
      .orderBy(col(graft.graph.RelGraph.RowId)).limit(ksub)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => seeds.map(_.slice(j * subDim, (j + 1) * subDim)))
    (1 to iters).foreach { _ =>
      // one pass: explode to (subspace, subvector), assign, mean per code.
      // The assignment is DATA-driven, not code-driven: the codebooks ride
      // along as one nested literal indexed by j, scored with higher-order
      // functions whose generated code is constant-size. Unrolling the
      // m·ksub argmin dots into expressions (the first-cut shape) grew the
      // generated method past janino's 64 KB limit at realistic m/ksub and
      // silently dropped the whole pass to interpreted mode — worse than
      // the HOF lambda dispatch this trades it for, and training touches a
      // bounded sample anyway. The SEARCH paths keep the unrolled codegen
      // (their per-query LUT is m·ksub wide, compiled fine, and hot).
      val booksLit = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
      val normsLit = typedLit(books.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
      val subs = unit.select(explode(array((0 until m).map { j =>
        struct(lit(j).as("j"), subVec(col(vecCol), j, subDim).as("v"))
      }: _*)).as("s"))
        .select(col("s.j").as("__j"), col("s.v").as("__sv"))
      val scores = zip_with(
        element_at(booksLit, col("__j") + 1),
        element_at(normsLit, col("__j") + 1),
        (c, ns) => ns - lit(2.0) * Similarity.dot(col("__sv"), c))
      val assigned = subs.withColumn("__c",
        (array_position(scores, array_min(scores)) - 1).cast("int"))
      val means = assigned.groupBy(col("__j"), col("__c"))
        .agg(VectorAgg.vecMean(col("__sv")).as("mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
      books = Array.tabulate(m)(j =>
        books(j).zipWithIndex.map { case (old, c) => means.getOrElse((j, c), old) })
    }
    Codebooks(dim, m, ksub, books)
  }

  /** Corpus compression: `m` int codes per vector (unit-normalized at
    * entry, matching the trained space). */
  def encode(data: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    data.withColumn("__pq_u",
        Similarity.unit(col(vecCol).cast("array<double>"),
          Similarity.norm(col(vecCol).cast("array<double>"))))
      .withColumn("codes", encodeExpr(col("__pq_u"), cb))
      .drop("__pq_u")

  /** [[encode]] for input ALREADY in unit space (the internal search
    * paths, which unitize exactly once) — skips the redundant per-row
    * norm + rescale a second normalization would cost in the corpus scan. */
  private def encodeUnit(unitData: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    unitData.withColumn("codes", encodeExpr(col(vecCol), cb))

  private def encodeExpr(unitVec: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { j =>
      codeExpr(subVec(unitVec, j, cb.subDim), cb.books(j))
    }: _*)

  // --- shared ADC machinery (single definition: pqTopK and ivfPqTopK
  // --- must never drift on LUT indexing, tie-breaking or rounding) ---

  /** Per-query LUT: m × ksub subspace dots, MATERIALIZED as a column on
    * the tiny query side before the broadcast join — the join itself then
    * evaluates only m array lookups per (query, code) pair. Leaving the
    * dot expressions inline would recompute the whole table per corpus
    * row (m·ksub dots × |corpus| — measured 20 s vs 5 s at sf0.1). */
  private def adcLutCol(qv: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { j =>
      array(cb.books(j).map(c =>
        Similarity.dot(subVec(qv, j, cb.subDim), Similarity.litVec(c))): _*)
    }: _*)

  private def adcApprox(lut: Column, codes: Column, cb: Codebooks): Column =
    (0 until cb.m).map { j =>
      element_at(element_at(lut, j + 1), element_at(codes, j + 1) + 1)
    }.reduce(_ + _)

  /** ADC shortlist (top `refine` by approximate dot) then exact-cosine
    * re-rank to top `k`; ties break by neighbor id at both stages. */
  private def shortlistAndRerank(pairs: DataFrame, cb: Codebooks, k: Int,
      refine: Int, roundDigits: Int): DataFrame = {
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("__a").desc, col("neighbor_id"))
    val shortlist = pairs
      .withColumn("__a", adcApprox(col("__lut"), col("codes"), cb))
      .withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= refine)
    val rawCos = Similarity.dot(col("__qv"), col("__cv")) // unit vectors
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    shortlist
      .withColumn("cos", if (roundDigits >= 0) round(rawCos, roundDigits) else rawCos)
      .withColumn("__rk", row_number().over(wExact))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** Top-k cosine neighbors via ADC shortlist + exact re-rank. Inputs are
    * normalized once so subspace dot sums approximate cosine. `refine` is
    * the shortlist size (≥ k); ties break by neighbor id at both stages. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cb: Codebooks, refine: Int,
      roundDigits: Int = -1): DataFrame = {
    require(refine >= k, s"refine=$refine must be >= k=$k")
    val corpusCoded = encodeUnit(unitized(corpus, idCol, vecCol), vecCol, cb)
      .select(col(idCol).as("neighbor_id"), col("codes"), col(vecCol).as("__cv"))
    val q = unitized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__lut", adcLutCol(col("__qv"), cb))
    val pairs = broadcast(q).join(corpusCoded,
      col("query_id") =!= col("neighbor_id"))
    shortlistAndRerank(pairs, cb, k, refine, roundDigits)
  }

  /** IVF-PQ: [[Ivf]] cells bound the SCAN (each query touches only its
    * `nProbe` nearest cells), PQ codes bound the MEMORY (m ints per corpus
    * vector), exact re-rank keeps reported scores true — the composition a
    * trillion-vector index actually runs. Train `cents` on the SAME
    * unit-normalized vectors PQ uses (pass the corpus through a
    * normalize-once projection to [[Ivf.trainCentroids]], or accept
    * slightly skewed cells). `nProbe = nCells` with unbounded `refine`
    * degenerates to exact brute force (the correctness anchor). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: Array[Array[Double]], cb: Codebooks,
      nProbe: Int, refine: Int, roundDigits: Int = -1): DataFrame = {
    require(nProbe >= 1 && nProbe <= cents.length)
    require(refine >= k, s"refine=$refine must be >= k=$k")
    val corpusU = unitized(corpus, idCol, vecCol)
    val celled = Ivf.withCell(encodeUnit(corpusU, vecCol, cb), vecCol, cents)
      .select(col("__cell"), col(idCol).as("neighbor_id"), col("codes"),
        col(vecCol).as("__cv"))
    // probe list (nProbe nearest cells, shared definition with Ivf) + ADC
    // LUT, both materialized on the tiny query side before the broadcast
    val probes = unitized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__lut", adcLutCol(col("__qv"), cb))
      .withColumn("__probe",
        explode(Ivf.probeCellsExpr(col("__qv"), cents, nProbe)))
    val pairs = broadcast(probes)
      .join(celled, col("__probe") === col("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
    shortlistAndRerank(pairs, cb, k, refine, roundDigits)
  }
}
