package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.VectorAgg
import graft.analyze.{Behavior, DistinctCounter, Olap, Quantiles}
import graft.functions.ZOrder
import graft.catalog.{ConstraintRegistry, ParquetCatalog}
import graft.convert.{CategoricalCodes, Converters, TableConverter}
import graft.dedup.Dedup
import graft.features.Features
import graft.functions.Normalizers
import graft.graph.RelGraph
import graft.joins.TemporalJoins
import graft.multimodal.Multimodal
import graft.sample.{BfsSampler, Sampling}
import graft.schema._
import graft.similarity.{Ivf, Quantize, Similarity}
import graft.streaming.EventStream
import graft.text.TextAnalysis


/** Registry domain: dedup + similarity search (training-data pipeline). See [[SparkEntry]] for the contract. */
private[graft] object QueriesDedup {
  import QBase._

  // Dedup (training-data pipeline)
  // ====================================================================

  private[graft] val qExactDedup = Q("d1_exact_dedup_groups",
    (s, d) => Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
      .orderBy("keep_id"),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents
      GROUP BY lower(trim(text)) ORDER BY keep_id"""))

  /** Exact n-gram Jaccard with n=3: unigram jaccard is degenerate on a
    * 31-word vocabulary (74% of ALL pairs exceed 0.5 — a quadratic OUTPUT),
    * while shared 3-gram shingles only occur for genuinely duplicated text,
    * so the inverted-index join stays selective at any scale. */
  private[graft] val qNgramJaccard = Q("d3_ngram_jaccard",
    (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT id1, id2, round(inter::DOUBLE / (z1.sz + z2.sz - inter), 4) AS jaccard
      FROM pairs JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
      WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 0.5
      ORDER BY id1, id2"""))

  /** Near-dup clustering: the d3 pair set collapsed into connected
    * components, every document mapped to its canonical (minimum-id)
    * representative — iterative min-label propagation on the Spark side,
    * a recursive transitive-closure CTE on the DuckDB side; identical pair
    * input (d3's oracle already hash-matches) ⇒ identical clusters. */
  /** Shared CTE chain deriving (doc_id, rep, n_chars) clusters from the d3
    * pair pipeline — the d6 oracle selects it directly; d8 windows over it. */
  private[graft] val dupClusterCte =
    """t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
      jp AS (SELECT id1, id2 FROM cand
        JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
        WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 0.5),
      e AS (SELECT id1 AS a, id2 AS b FROM jp UNION SELECT id2, id1 FROM jp),
      reach AS (SELECT a, b FROM e
        UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
      rep AS (SELECT a AS doc_id, min(b) AS mn FROM reach GROUP BY a),
      cl AS (SELECT d.doc_id, least(coalesce(mn, d.doc_id), d.doc_id) AS rep, d.n_chars
        FROM documents d LEFT JOIN rep USING (doc_id))"""

  private[graft] val qDupClusters = Q("d6_dup_clusters",
    (s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      Dedup.dupClusters(docs, "doc_id", pairs).orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $dupClusterCte
      SELECT doc_id, rep FROM cl ORDER BY doc_id"""))

  /** Dedup-pipeline completion: which document SURVIVES each near-dup
    * cluster — highest n_chars wins, ties to the lowest id (a quality
    * policy, distinct from d6's structural min-id label). */
  private[graft] val qCanonical = Q("d8_canonical_pick",
    (s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      Dedup.canonicalPick(Dedup.dupClusters(docs, "doc_id", pairs),
          docs, "doc_id", "n_chars")
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE $dupClusterCte,
      rk AS (SELECT rep AS cluster_id, doc_id, n_chars,
          row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, doc_id) AS rn,
          count(*) OVER (PARTITION BY rep) AS n_members
        FROM cl)
      SELECT cluster_id, doc_id AS keep_id, n_chars AS keep_quality, n_members
      FROM rk WHERE rn = 1 ORDER BY cluster_id"""))

  /** MinHash+LSH and SimHash pipelines are hash-function-defined — no SQL
    * oracle can reproduce them; the driver applies the rows-only check and
    * the ScalaTest specs assert recall/precision on planted duplicates. */
  private[graft] val qMinhash = Q("d2_minhash_neardups",
    (s, d) => Dedup.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    None)

  /** Degenerate-parameter MinHash anchor (the sim4/sim7 device applied to
    * LSH banding): at threshold 1.0 a pair survives the verify only with
    * IDENTICAL shingle sets, and identical sets yield identical minhash
    * signatures, so EVERY band collides — candidate recall is exactly 1 by
    * construction, no probabilistic argument needed. The full pipeline
    * (shingle → signature → band → bucket-join → verify) therefore computes
    * precisely the exact-Jaccard self-join at threshold 1.0, which the d3
    * CTE restates in SQL. The big rows-only `d2` stays the scale exercise
    * at the working threshold. */
  private[graft] val qMinhashAnchor = Q("d2b_minhash_exact_anchor",
    (s, d) => Dedup.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, threshold = 1.0)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT id1, id2, round(inter::DOUBLE / (z1.sz + z2.sz - inter), 4) AS jaccard
      FROM pairs JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
      WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 1.0
      ORDER BY id1, id2"""))

  private[graft] val qSimhash = Q("d4_simhash_neardups",
    (s, d) => Dedup.simhashNearDups(t(s, d, "documents"), "doc_id", "text",
        maxDistance = 10)
      .orderBy("id1", "id2"),
    None)

  /** The 128-bit scale path at the same maxDistance: full-recall banding
    * keeps chunks ≥ 11 bits (vs 5-6 for 64-bit at d=10), so the bucket
    * join stays selective — the variant to reach for at large d. */
  private[graft] val qSimhash128 = Q("d4b_simhash128_neardups",
    (s, d) => Dedup.simhashNearDups128(t(s, d, "documents"), "doc_id", "text",
        maxDistance = 10)
      .orderBy("id1", "id2"),
    None)

  /** Portable-hash MinHash anchor at the WORKING threshold: the whole
    * pipeline — shingle → k md5-minima signature → 2-row band keys →
    * bucket self-join → exact-Jaccard verify — restated in SQL, because
    * h_i(s) = substr(md5(i ':' s), 1, 16) is computable by any engine and
    * fixed-width hex minima order identically as strings. Complements d2b:
    * that anchor pins the pipeline at the degenerate threshold (recall 1
    * by construction); this one checks the PROBABILISTIC banding itself —
    * DuckDB independently computes which pairs collide in a band. */
  private[graft] val qMinhashPortable = Q("d2c_minhash_portable",
    (s, d) => Dedup.minhashNearDupsPortable(t(s, d, "documents"), "doc_id", "text",
        k = 8, bands = 4, shingleN = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      mh AS (SELECT doc_id, i, min(substr(md5(i::VARCHAR || ':' || sh), 1, 16)) AS mh
        FROM inv CROSS JOIN range(8) r(i) GROUP BY doc_id, i),
      band AS (SELECT doc_id, (i // 2)::INTEGER AS b, string_agg(mh, '|' ORDER BY i) AS key
        FROM mh GROUP BY doc_id, (i // 2)::INTEGER),
      cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
        FROM band a JOIN band c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id),
      inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS inter
        FROM inv x JOIN inv y ON x.sh = y.sh
        JOIN cand ON cand.id1 = x.doc_id AND cand.id2 = y.doc_id
        GROUP BY x.doc_id, y.doc_id)
      SELECT id1, id2, round(inter::DOUBLE / (z1.sz + z2.sz - inter), 4) AS jaccard
      FROM inter JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
      WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 0.5
      ORDER BY id1, id2"""))

  /** Portable SimHash signatures as 64-char bit strings: every vote —
    * md5 hex digit decode, bit extract, majority, tie→0 — recomputed
    * independently by the oracle. Pins the signature math that d4/d4b's
    * hash-defined (xxhash64) variants can only spec-test. */
  private[graft] val qSimhashPortable = Q("d4c_simhash_portable",
    (s, d) => Dedup.simhashPortable(t(s, d, "documents"), "doc_id", "text")
      .select(col("doc_id"), lpad(bin(col("simhash")), 64, "0").as("sig64"))
      .orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents WHERE text IS NOT NULL),
      th AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
      v AS (SELECT doc_id, b,
          sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - b // 4, 1)) - 1)
                >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th CROSS JOIN range(64) r(b) GROUP BY doc_id, b)
      SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC) AS sig64
      FROM v GROUP BY doc_id ORDER BY doc_id"""))

  /** Pigeonhole-banding FULL-RECALL proof on real data: the engine's
    * banded chunk join (5 chunks at d=4) vs the oracle's brute-force
    * all-pairs Hamming join over the same portable signatures — equal
    * output means the banding missed nothing, turning the pigeonhole
    * recall argument into a checked fact. The oracle's O(n²) scan is the
    * gate-SF restatement; the engine side stays the banded scale shape. */
  private[graft] val qSimhashPortablePairs = Q("d4d_simhash_portable_pairs",
    (s, d) => Dedup.simhashPortableNearDups(t(s, d, "documents"), "doc_id", "text",
        maxDistance = 4)
      .select(col("id1"), col("id2"), col("hamming").cast("bigint").as("hamming"))
      .orderBy("id1", "id2"),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents WHERE text IS NOT NULL),
      th AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
      v AS (SELECT doc_id, b,
          sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - b // 4, 1)) - 1)
                >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th CROSS JOIN range(64) r(b) GROUP BY doc_id, b),
      sig AS (SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC) AS sig64
        FROM v GROUP BY doc_id)
      SELECT a.doc_id AS id1, c.doc_id AS id2,
        (SELECT count(*) FROM range(64) r(p)
          WHERE substr(a.sig64, (p+1)::INTEGER, 1) <> substr(c.sig64, (p+1)::INTEGER, 1))::BIGINT AS hamming
      FROM sig a JOIN sig c ON a.doc_id < c.doc_id
      WHERE (SELECT count(*) FROM range(64) r(p)
          WHERE substr(a.sig64, (p+1)::INTEGER, 1) <> substr(c.sig64, (p+1)::INTEGER, 1)) <= 4
      ORDER BY id1, id2"""))

  /** The hyperplanes as SQL literals — the device that moved d5/d5c/sim2
    * from rows-only to fully oracle-checked in round 12. The planes are
    * deterministic driver-side doubles ([[Similarity.hyperplanes]]: a
    * splitmix64 mix of (seed, p, i) — integer arithmetic DuckDB can't
    * express), but the ORACLE doesn't need to re-derive them: like the
    * VALUES micro-graphs, the plane constants are part of the query's
    * spec, and `Double.toString` round-trips exactly through DuckDB's
    * decimal→nearest-double parse, so both engines dot against
    * bit-identical planes. Plane p of a table is prefix-stable in
    * nPlanes (component = f(seed, p, i)), so one VALUES list serves any
    * `p < np` cut. */
  private def planeValuesSql(nTables: Int, maxPlanes: Int, dim: Int,
      seed: Long): String =
    (0 until nTables).flatMap { tb =>
      val planes = Similarity.hyperplanes(maxPlanes, dim, seed + 1000L * tb)
      planes.zipWithIndex.map { case (pl, p) =>
        s"($tb, $p, [${pl.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n        ")

  /** Full [[Dedup.embeddingNearDups]] restatement at the REAL banded
    * parameters (not a degenerate anchor): signature = packed sign bits
    * of the literal-plane dots, candidates = within-(table, signature)
    * pairs OR-ed across tables, then the exact-cosine verify. `npExpr`
    * is SQL so d5c can compute [[Similarity.nPlanesFor]]'s sizing from
    * `count(*)` in-query (valid while np ≤ maxPlanes — 16 covers the
    * correctness-gate SFs with 10× headroom; the engine keeps its exact
    * integer sizing, and the two `ceil∘log2` paths agree except when
    * n/16 is an exact power of two, which no gate SF hits). */
  private def embNearDupOracle(nTables: Int, maxPlanes: Int,
      seed: Long, npExpr: String, threshold: Double): String =
    s"""WITH np AS (SELECT ($npExpr) AS np),
      planes(t, p, pl) AS (VALUES
        ${planeValuesSql(nTables, maxPlanes, 64, seed)}),
      sig AS (SELECT e.vec_id AS id, pl.t,
          sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.pl) >= 0
              THEN 1 << pl.p ELSE 0 END) AS sig
        FROM embeddings e CROSS JOIN planes pl
        WHERE pl.p < (SELECT np FROM np)
        GROUP BY 1, 2),
      cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2
        FROM sig a JOIN sig b ON a.t = b.t AND a.sig = b.sig AND a.id < b.id),
      v AS (SELECT c.id1, c.id2,
          list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS cos
        FROM cand c JOIN embeddings x ON c.id1 = x.vec_id
          JOIN embeddings y ON c.id2 = y.vec_id)
      SELECT id1, id2, round(cos, 4) AS cos FROM v
      WHERE cos >= $threshold ORDER BY id1, id2"""

  private[graft] val qEmbDedup = Q("d5_embedding_neardups",
    // the synthetic embeddings are near-orthogonal random vectors (max
    // pairwise cos ~0.51), so the "near-dup" bar is set low enough to
    // exercise the bucket-join + verify path end-to-end; 3 OR-ed signature
    // tables exercise the recall-amplified path (DedupSpec measures recall).
    // Fully oracle-checked since round 12 (literal-plane restatement above) —
    // the BANDED pipeline itself now sits under the DuckDB gate, not just
    // the nPlanes=0 degenerate anchor d5b.
    (s, d) => Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.25, nPlanes = 4, nTables = 3)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
      .orderBy("id1", "id2"),
    Some(embNearDupOracle(nTables = 3, maxPlanes = 4, seed = 42L,
      npExpr = "4", threshold = 0.25)))

  /** d5's contract-sized SCALE path: nPlanes derived from the corpus
    * count via [[Similarity.nPlanesFor]] — the sizing the d5 scaladoc
    * promises but d5 deliberately pins (fixed nPlanes keeps its
    * hash-defined output stable round-over-round while pair work grows
    * ~n²/2^nPlanes: 36× at the r10 sf1 sweep). Here the benchmark
    * exercises the actual contract: in-bucket pair work stays
    * ~n·targetBucket/2 at any corpus size. Fully oracle-checked since
    * round 12: the sizing itself moves into the SQL (ceil∘log2 of
    * count(*)/16, the [[Similarity.nPlanesFor]] formula), so the oracle
    * tracks the corpus across gate SFs; 16 embedded plane literals per
    * table cover np up to 16 ≫ any gate SF's sizing. The count() sizing
    * pass is one cheap scan — the same bounded-driver-state class as
    * Lloyd centroids. */
  private[graft] val qEmbDedupScaled = Q("d5c_embedding_neardups_scaled",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val nPlanes = Similarity.nPlanesFor(emb.count())
      Dedup.embeddingNearDups(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.25, nPlanes = nPlanes, nTables = 3)
        .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
        .orderBy("id1", "id2")
    },
    Some(embNearDupOracle(nTables = 3, maxPlanes = 16, seed = 42L,
      npExpr = "GREATEST(1, LEAST(63, CEIL(LOG2(" +
        "(SELECT count(*) FROM embeddings) / 16.0))))::INTEGER",
      threshold = 0.25)))

  /** SemDeDup-style semantic dedup, the cluster-then-prune curation step:
    * cells from the deterministic IVF Lloyd trainer, within-cell pairs
    * only, keep-min-id prune at the cosine threshold. Fully
    * oracle-checked since round 12: at iters=1 the whole Lloyd loop
    * unrolls into SQL with ZERO embedded constants — the deterministic
    * every-⌊n/8⌋th-row init, the argmin assignment (|c|²−2v·c scored,
    * lowest-cell tie-break = the engine's array_position-of-min), the
    * per-cell elementwise mean (empty cells keep their init centroid),
    * the re-assignment, and the within-cell prune. Cell-membership
    * argmins sit ~0.1 apart on the synthetic vectors vs ~1e-15 float
    * drift, so the discrete decisions can't flip. `sem1b` additionally
    * anchors nCells=1 ≡ global and DedupSpec pins cells-vs-global
    * semantics. */
  private[graft] val qSemDedup = Q("sem1_semantic_dedup",
    (s, d) => Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        nCells = 8, threshold = 0.25, iters = 1)
      .orderBy("vec_id"),
    Some("""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      nn AS (SELECT greatest(1, count(*) // 8) AS step FROM base),
      rid AS (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) - 1 AS rn FROM base),
      c0 AS (SELECT (rn / (SELECT step FROM nn))::INTEGER AS cell, v FROM rid
        WHERE rn % (SELECT step FROM nn) = 0 AND rn / (SELECT step FROM nn) < 8),
      a1 AS (SELECT r.vec_id, r.v, c.cell,
          list_sum(list_transform(c.v, x -> x*x)) - 2*list_inner_product(r.v, c.v) AS score
        FROM base r CROSS JOIN c0 c),
      asg1 AS (SELECT vec_id, v, cell FROM (
          SELECT vec_id, v, cell, row_number() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rk
          FROM a1) t WHERE rk = 1),
      m1 AS (SELECT a.cell, i.i, avg(a.v[i.i]) AS mx
        FROM asg1 a CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i GROUP BY 1, 2),
      cm AS (SELECT cell, list(mx ORDER BY i) AS v FROM m1 GROUP BY 1),
      c1 AS (SELECT c0.cell, coalesce(cm.v, c0.v) AS v FROM c0 LEFT JOIN cm ON c0.cell = cm.cell),
      a2 AS (SELECT r.vec_id, r.v, c.cell,
          list_sum(list_transform(c.v, x -> x*x)) - 2*list_inner_product(r.v, c.v) AS score
        FROM base r CROSS JOIN c1 c),
      asg2 AS (SELECT vec_id, v, cell FROM (
          SELECT vec_id, v, cell, row_number() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rk
          FROM a2) t WHERE rk = 1),
      dropped AS (SELECT DISTINCT b.vec_id AS id2
        FROM asg2 a JOIN asg2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.25)
      SELECT e.vec_id, d.id2 IS NULL AS keep
      FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.id2
      ORDER BY e.vec_id"""))

  /** Degenerate-parameter anchor for sem1 (the d2b/sim2b device): at
    * nCells = 1 every vector shares the one cell, so the within-cell prune
    * provably equals the global threshold prune — keep(i) ⟺ no j<i with
    * cos ≥ τ, restated below via the d5b pair CTE. */
  private[graft] val qSemDedupAnchor = Q("sem1b_semantic_dedup_anchor",
    (s, d) => Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        nCells = 1, threshold = 0.25, iters = 1)
      .orderBy("vec_id"),
    Some("""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
      dropped AS (SELECT DISTINCT id2 FROM p WHERE cos >= 0.25)
      SELECT e.vec_id, d.id2 IS NULL AS keep
      FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.id2
      ORDER BY e.vec_id"""))

  /** Degenerate-parameter embedding-LSH anchor (the d2b/sim2b device): at
    * nPlanes = 0 the single signature table has one constant bucket, so the
    * candidate set is provably ALL id1<id2 pairs and the pipeline computes
    * exactly the exhaustive cosine threshold join the SQL below restates.
    * `d5` stays the rows-only scale exercise (banded buckets, 3 OR-ed
    * tables). */
  private[graft] val qEmbDedupAnchor = Q("d5b_embedding_exact_anchor",
    (s, d) => Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.25, nPlanes = 0, nTables = 1)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
      .orderBy("id1", "id2"),
    Some("""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      SELECT id1, id2, round(cos, 4) AS cos FROM p
      WHERE cos >= 0.25 ORDER BY id1, id2"""))

  // ====================================================================
  // Similarity search
  // ====================================================================

  private[graft] val qBruteTopK = Q("sim1_bruteforce_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 3, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        round(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]), 6) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
      SELECT query_id, neighbor_id, cos FROM ranked WHERE rn <= 3
      ORDER BY query_id, neighbor_id"""))

  /** Johnson–Lindenstrauss distortion audit: cosine error of the 64→16
    * projection over every (query, neighbor) pair — the measurement the
    * JL lemma actually bounds (distance/angle preservation), taken
    * before committing to reduced-space ANN at scale. Top-k RECALL is
    * deliberately NOT the metric here: the synthetic embeddings are
    * near-orthogonal noise, so true top-3 gaps are ~1e-3 and no
    * projection preserves that ranking (measured 0/15 at 8 dims, 2/15
    * even at 48 of 64) — distortion is the property the operator
    * guarantees. Both engines derive the SAME ±1 matrix from md5-nibble
    * parity, so the projection restates verbatim. */
  private[graft] val qProjectionDistortion = Q("rp1_projection_distortion",
    (s, d) => {
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"),
        Similarity.jlProjection(col("embedding"), inDim = 64, outDim = 16)
          .as("pv"))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("__qf"),
          col("pv").as("__qp"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cf"), col("pv").as("__cp"))
      val err = abs(Similarity.cosine(col("__qp"), col("__cp")) -
        Similarity.cosine(col("__qf"), col("__cf")))
      c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(err), 6).as("mean_abs_err"),
          round(max(err), 6).as("max_abs_err"),
          round(sqrt(avg(err * err)), 6).as("rmse"))
    },
    Some("""WITH pm AS (SELECT i.i, j.j, CASE WHEN strpos('02468ace',
              substr(md5('rp:' || i.i || ':' || j.j), 1, 1)) > 0
            THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(generate_series(0, 63)) AS i) i,
            (SELECT unnest(generate_series(0, 15)) AS j) j),
        pv AS (SELECT vec_id, j, sum(s * embedding[i + 1]::DOUBLE)
            * (1.0/sqrt(16.0)) AS y
          FROM embeddings, pm GROUP BY 1, 2),
        pl AS (SELECT vec_id, list(y ORDER BY j) AS v FROM pv GROUP BY 1),
        b AS (SELECT e.vec_id, e.embedding, pl.v
          FROM embeddings e JOIN pl ON e.vec_id = pl.vec_id),
        pe AS (SELECT abs(list_cosine_similarity(a.v, c.v)
            - list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[])) AS ae
          FROM b a CROSS JOIN b c
          WHERE a.vec_id < 5 AND a.vec_id != c.vec_id)
      SELECT count(*)::BIGINT AS n_pairs, round(avg(ae), 6) AS mean_abs_err,
        round(max(ae), 6) AS max_abs_err, round(sqrt(avg(ae*ae)), 6) AS rmse
      FROM pe"""))

  /** Cosine range search: every neighbor above the similarity radius per
    * query — threshold cut, no top-k window at all. */
  private[graft] val qRangeSearch = Q("sim8_range_search",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.rangeSearch(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", minCos = 0.2, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        round(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]), 6) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id)
      SELECT query_id, neighbor_id, cos FROM scored WHERE cos >= 0.2
      ORDER BY query_id, neighbor_id"""))

  /** IVF with nProbe = nCells degenerates to exhaustive search, so the
    * brute-force SQL oracle checks the whole quantize→probe→rank pipeline;
    * nProbe < nCells is the production approximate path (spec-tested for
    * cluster recall). */
  private[graft] val qIvfTopK = Q("sim3_ivf_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nCells = 8, iters = 2)
      Ivf.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 3, cents, nProbe = 8, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    qBruteTopK.oracle)

  /** Bucketed ANN at the real nPlanes=6 — fully oracle-checked since
    * round 12 via the literal-plane device ([[planeValuesSql]]): the
    * oracle rebuilds the 6-bit signatures, pairs within buckets, and
    * ranks by raw cos with the same neighbor_id tie-break (the sim2b
    * device — near-orthogonal synthetic vectors put no pair inside
    * float drift of a rank flip). */
  private[graft] val qLshTopK = Q("sim2_lsh_topk",
    (s, d) => Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 3, nPlanes = 6, dim = 64)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "neighbor_id"),
    Some(s"""WITH planes(t, p, pl) AS (VALUES
        ${planeValuesSql(1, 6, 64, 42L)}),
      sig AS (SELECT e.vec_id AS id,
          sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.pl) >= 0
              THEN 1 << pl.p ELSE 0 END) AS b
        FROM embeddings e CROSS JOIN planes pl GROUP BY 1),
      pairs AS (SELECT q.id AS query_id, c.id AS neighbor_id,
          list_cosine_similarity(eq.embedding::DOUBLE[], ec.embedding::DOUBLE[]) AS cos
        FROM sig q JOIN sig c ON q.b = c.b AND q.id <> c.id
        JOIN embeddings eq ON q.id = eq.vec_id
        JOIN embeddings ec ON c.id = ec.vec_id),
      ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM pairs)
      SELECT query_id, neighbor_id, round(cos, 4) AS cos FROM ranked
      WHERE rn <= 3 ORDER BY query_id, neighbor_id"""))

  /** Degenerate-parameter LSH anchor (the d2b/sim4 device): nPlanes = 0
    * yields the constant signature, so every vector lands in ONE bucket and
    * the bucketed search degenerates to the exhaustive all-pairs top-k —
    * recall 1 by construction, output ≡ brute-force cosine top-k, restated
    * below in SQL. `sim2` stays the rows-only scale exercise at nPlanes=6. */
  private[graft] val qLshAnchor = Q("sim2b_lsh_exact_anchor",
    (s, d) => Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 3, nPlanes = 0, dim = 64)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "neighbor_id"),
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
      SELECT query_id, neighbor_id, round(cos, 4) AS cos FROM ranked
      WHERE rn <= 3 ORDER BY query_id, neighbor_id"""))

  // ====================================================================

  /** Sorted-neighborhood blocking (merge/purge): candidates are each
    * document's 5 successors in (first-20-chars-of-text, id) order — a
    * pair budget of exactly 5n with NO bucket skew, the complementary
    * paradigm to the hash families (recall limited to what the key sorts
    * together; multiple passes with different keys raise it). Verified by
    * the same exact 3-gram Jaccard as d3. */
  private[graft] val qSortedNeighborhood = Q("d11_sorted_neighborhood",
    (s, d) => Dedup.sortedNeighborhoodPairs(
        t(s, d, "documents").filter(col("text").isNotNull),
        "doc_id", "text",
        blockKey = substring(lower(trim(col("text"))), 1, 20),
        window = 5, shingleN = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    Some("""WITH t AS (SELECT doc_id, lower(trim(text)) AS lt,
          string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      s AS (SELECT doc_id, substr(lt, 1, 20) AS bk,
          list_distinct(CASE WHEN len(w) < 3
            THEN [array_to_string(w, ' ')]
            ELSE list_transform(range(1, len(w)-1),
              i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks
        FROM t),
      r AS (SELECT doc_id, toks,
          row_number() OVER (ORDER BY bk, doc_id) AS rn FROM s),
      cand AS (SELECT least(a.doc_id, b.doc_id) AS id1,
          greatest(a.doc_id, b.doc_id) AS id2, a.toks AS t1, b.toks AS t2
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5),
      j AS (SELECT id1, id2, len(list_intersect(t1, t2))::DOUBLE /
          (len(t1) + len(t2) - len(list_intersect(t1, t2)))::DOUBLE AS jac
        FROM cand)
      SELECT id1, id2, round(jac, 4) AS jaccard FROM j
      WHERE jac >= 0.5 ORDER BY id1, id2"""))

  /** Blocking-strategy evaluation: d11's sorted-neighborhood pairs
    * measured against d3's exhaustive inverted-index truth at the same
    * τ — recall = how much the window missed, precision = 1 by
    * construction (every blocked pair is verified at the same bar, so
    * it IS a truth pair; the query exposes the invariant rather than
    * assuming it). One full-outer join + one aggregate; the "is my
    * cheap blocking good enough" audit run before switching paradigms
    * at scale. */
  private[graft] val qBlockingRecall = Q("dq7_blocking_recall",
    (s, d) => Dedup.blockingRecallAudit(
      t(s, d, "documents").filter(col("text").isNotNull),
      "doc_id", "text",
      blockKey = substring(lower(trim(col("text"))), 1, 20),
      window = 5, shingleN = 3, threshold = 0.5),
    Some("""WITH t AS (SELECT doc_id, lower(trim(text)) AS lt,
          string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      s AS (SELECT doc_id, substr(lt, 1, 20) AS bk,
          list_distinct(CASE WHEN len(w) < 3
            THEN [array_to_string(w, ' ')]
            ELSE list_transform(range(1, len(w)-1),
              i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks
        FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      tp AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      truth AS (SELECT id1, id2 FROM tp
        JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
        WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 0.5),
      r AS (SELECT doc_id, toks,
          row_number() OVER (ORDER BY bk, doc_id) AS rn FROM s),
      bc AS (SELECT least(a.doc_id, b.doc_id) AS id1,
          greatest(a.doc_id, b.doc_id) AS id2, a.toks AS t1, b.toks AS t2
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5),
      blocked AS (SELECT id1, id2 FROM bc
        WHERE len(list_intersect(t1, t2))::DOUBLE /
          (len(t1) + len(t2) - len(list_intersect(t1, t2)))::DOUBLE >= 0.5),
      j AS (SELECT coalesce(tr.id1, bl.id1) AS id1,
          CASE WHEN tr.id1 IS NULL THEN 0 ELSE 1 END AS in_t,
          CASE WHEN bl.id1 IS NULL THEN 0 ELSE 1 END AS in_b
        FROM truth tr FULL OUTER JOIN blocked bl
        ON tr.id1 = bl.id1 AND tr.id2 = bl.id2)
      SELECT sum(in_t)::BIGINT AS n_truth, sum(in_b)::BIGINT AS n_blocked,
        sum(in_t * in_b)::BIGINT AS n_hit,
        round(sum(in_t * in_b)::DOUBLE / sum(in_t)::DOUBLE, 4) AS recall,
        round(sum(in_t * in_b)::DOUBLE / sum(in_b)::DOUBLE, 4) AS precision
      FROM j"""))

  /** Probabilistic record linkage, trained and applied in one dataflow:
    * customers blocked by nation, 0/1 comparison vectors (segment,
    * account-balance proximity, name-suffix agreement), Fellegi–Sunter m/u/λ
    * fit by TWO EM iterations (each one aggregate pass), parameters
    * frozen at 6 dp, every pair scored with the posterior and the
    * classic log2 match weight. The posterior is pure literal
    * arithmetic of the frozen parameters (no transcendentals), so the
    * 0.9-threshold decision is bit-identical cross-engine. */
  private[graft] val qEmLinkage = Q("er1_em_linkage",
    (s, d) => {
      import graft.linkage.RecordLinkage
      import RecordLinkage.FsParams
      val c = t(s, d, "customer")
      val a = c.select(col("c_custkey").as("ak"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("aseg"), col("c_acctbal").as("abal"),
        col("c_name").as("anm"))
      val b = c.select(col("c_custkey").as("bk"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("bseg"), col("c_acctbal").as("bbal"),
        col("c_name").as("bnm"))
      // Three full passes consume the pair frame (2 EM aggregates + the
      // score pass); generating the nation-blocked pairs costs a join
      // that explodes 15k customers into 4.5M rows, so (r14) the pairs
      // are built ONCE and persisted: the right side broadcasts (the
      // customer projection sits under autoBroadcastJoinThreshold at
      // every bench SF) so pair generation is a map-side explosion over
      // the SPREAD left side — no nation-keyed shuffle, no 25-hot-key
      // skew (guide §3.1/§2.5) — and the γ comparison vectors (3 ints)
      // are all that is ever stored. (r15) The broadcast is NOT forced:
      // customer scales with SF, and a pinned hint would OOM the driver
      // at large SF where the planner's size-based choice degrades
      // gracefully to a shuffle join — scale-adaptivity over 0 ms of
      // local win (the plan is identical at bench SFs either way). The
      // persist stays: all three passes reread the γ frame, it is the
      // smallest representation of the pair set (3 ints/row), and
      // MEMORY_AND_DISK spills rather than pins.
      val pairs = graft.util.Spread.wide(a).join(b, "nk")
        .filter(col("ak") < col("bk"))
        .select(
          (col("aseg") === col("bseg")).cast("int").as("g1"),
          (abs(col("abal") - col("bbal")) < 500.0).cast("int").as("g2"),
          (substring(col("anm"), -2, 2) === substring(col("bnm"), -2, 2))
            .cast("int").as("g3"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val gs = Seq("g1", "g2", "g3")
        val fit = RecordLinkage.emFit(pairs, gs, iters = 2,
          FsParams(Array(0.9, 0.9, 0.9), Array(0.1, 0.1, 0.1), 0.1))
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val fz = FsParams(fit.m.map(r6), fit.u.map(r6), r6(fit.lambda))
        RecordLinkage.score(pairs, gs, fz)
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("posterior") > 0.9).cast("long")).as("n_matches"),
            round(avg(col("match_weight")), 4).as("avg_weight"))
          .select(lit(fz.m(0)).as("m1"), lit(fz.m(1)).as("m2"),
            lit(fz.m(2)).as("m3"), lit(fz.u(0)).as("u1"),
            lit(fz.u(1)).as("u2"), lit(fz.u(2)).as("u3"),
            lit(fz.lambda).as("lambda"),
            col("n_pairs"), col("n_matches"), col("avg_weight"))
          .transform(graft.util.Checkpoints.eager) // one row; frees the cache below safely
      } finally { pairs.unpersist(); () }
    },
    Some {
      def prod(p: String, which: Char) = {
        val f = (i: Int) => s"CASE WHEN g$i = 1 THEN $p.$which$i ELSE 1.0 - $p.$which$i END"
        s"${f(1)} * ${f(2)} * ${f(3)}"
      }
      def estep(p: String) =
        s"(${prod(p, 'm')}) * $p.l AS num, (${prod(p, 'u')}) * (1.0 - $p.l) AS alt"
      val iter = (i: Int) => {
        val prev = if (i == 1) "p0" else s"p${i - 1}"
        s"""e$i AS (SELECT pr.*, ${estep("p")} FROM pr, $prev p),
        s$i AS (SELECT sum(num/(num+alt)) AS sw, count(*)::DOUBLE AS n,
            sum(num/(num+alt)*g1) AS swg1, sum(num/(num+alt)*g2) AS swg2,
            sum(num/(num+alt)*g3) AS swg3,
            sum((1.0 - num/(num+alt))*g1) AS svg1,
            sum((1.0 - num/(num+alt))*g2) AS svg2,
            sum((1.0 - num/(num+alt))*g3) AS svg3
          FROM e$i),
        p$i AS (SELECT swg1/sw AS m1, swg2/sw AS m2, swg3/sw AS m3,
            svg1/(n - sw) AS u1, svg2/(n - sw) AS u2, svg3/(n - sw) AS u3,
            sw/n AS l FROM s$i)"""
      }
      s"""WITH pr AS (SELECT (a.c_mktsegment = b.c_mktsegment)::INT AS g1,
          (abs(a.c_acctbal - b.c_acctbal) < 500.0)::INT AS g2,
          (substr(a.c_name, -2, 2) = substr(b.c_name, -2, 2))::INT AS g3
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
        p0 AS (SELECT 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
          0.1 AS u1, 0.1 AS u2, 0.1 AS u3, 0.1 AS l),
        ${iter(1)},
        ${iter(2)},
        pf AS (SELECT round(m1, 6) AS m1, round(m2, 6) AS m2,
          round(m3, 6) AS m3, round(u1, 6) AS u1, round(u2, 6) AS u2,
          round(u3, 6) AS u3, round(l, 6) AS l FROM p2),
        sc AS (SELECT pr.*, ${estep("pf")},
            (CASE WHEN g1 = 1 THEN ln(pf.m1/pf.u1)/ln(2.0)
              ELSE ln((1.0-pf.m1)/(1.0-pf.u1))/ln(2.0) END +
             CASE WHEN g2 = 1 THEN ln(pf.m2/pf.u2)/ln(2.0)
              ELSE ln((1.0-pf.m2)/(1.0-pf.u2))/ln(2.0) END +
             CASE WHEN g3 = 1 THEN ln(pf.m3/pf.u3)/ln(2.0)
              ELSE ln((1.0-pf.m3)/(1.0-pf.u3))/ln(2.0) END) AS mw
          FROM pr, pf pf)
        SELECT min(pf.m1) AS m1, min(pf.m2) AS m2, min(pf.m3) AS m3,
          min(pf.u1) AS u1, min(pf.u2) AS u2, min(pf.u3) AS u3,
          min(pf.l) AS lambda, count(*)::BIGINT AS n_pairs,
          sum(CASE WHEN num/(num+alt) > 0.9 THEN 1 ELSE 0 END)::BIGINT AS n_matches,
          round(avg(mw), 4) AS avg_weight
        FROM sc, pf"""
    })

  private[graft] val all: Seq[Q] = Seq(
    qEmLinkage,
    qSortedNeighborhood,
    qBlockingRecall,
    qExactDedup,
    qNgramJaccard,
    qDupClusters,
    qCanonical,
    qMinhash,
    qMinhashAnchor,
    qSimhash,
    qSimhash128,
    qMinhashPortable,
    qSimhashPortable,
    qSimhashPortablePairs,
    qEmbDedup,
    qEmbDedupScaled,
    qSemDedup,
    qSemDedupAnchor,
    qEmbDedupAnchor,
    qBruteTopK,
    qProjectionDistortion,
    qRangeSearch,
    qIvfTopK,
    qLshTopK,
    qLshAnchor)
}
