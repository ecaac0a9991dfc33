package graft.sample

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.Schema

/** Batched BFS subgraph sampling — the reference's `BFSStrategy`
  * (db_transformer/data/strategy/bfs.py:11-84) re-expressed as iterative
  * frontier semi-joins (J3) instead of one SQL roundtrip per
  * (depth, table) per sample.
  *
  * Reproduced semantics (bfs.py):
  *  - seed row = LIMIT 1 OFFSET idx of the target table (:38) — our engine
  *    contract pins the order to the primary key (pandas/SQL relied on
  *    implicit DB order);
  *  - frontier expansion follows FKs forward (child values -> parent PK,
  *    :52-60) and reverse (other tables' FK columns -> current table's
  *    FIRST column, :62-82, reproducing the reference's first-column
  *    assumption);
  *  - composite (multi-column) FK frontiers are supported — the reference
  *    declares them in its schema (schema.py:163-182) but left the sampler
  *    single-column (TODO at :54); the frontier join here is the same
  *    zipped equi-join shape as [[graft.graph.RelGraph.fkEdges]];
  *  - tables queued forward in a step are not re-queued reverse in that
  *    step (`processed_foreigns`, :61), and the immediate parent is never
  *    re-visited (:69-71);
  *  - a node popped at depth >= maxDepth stops the walk; depth+1 == maxDepth
  *    nodes are collected but not expanded (:28-29, :49-50);
  *  - per-table row accumulation is a dedup union (:46-47).
  *
  * Scale design: each expansion is `table.join(broadcast(keys.distinct),
  * "left_semi")` — the frontier key set is small relative to the table, the
  * scan stays partition-parallel, and accumulated rows are unioned lazily
  * with one final `distinct` per table.
  */
object Sampling {
  import org.apache.spark.sql.expressions.Window

  /** W5: neighbor-sampling cap — at most k edges per destination node,
    * chosen by seeded random order (the reference's HGTLoader/NeighborLoader
    * `num_samples` cap, experiments/blueprint_mlflow.py:53,119-133). One
    * windowed rank on the edge list; deterministic for a fixed seed and
    * partitioning. */
  def capNeighbors(edges: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col("dst_id")).orderBy(rand(seed), col("src_id"))
    edges.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** W6: train/validation boolean masks by seeded random threshold
    * (`T.RandomNodeSplit('train_rest')`, main.py:220-221). Spark's RNG
    * stream is partitioning-dependent and engine-private — use
    * [[withSplitMasksPortable]] when the assignment must be reproducible
    * across runs or restatable in another engine. */
  def withSplitMasks(nodes: DataFrame, valFraction: Double, seed: Long = 42L): DataFrame = {
    val r = rand(seed)
    nodes.withColumn("val_mask", r < valFraction)
      .withColumn("train_mask", !(r < valFraction))
  }

  /** Engine-portable [[withSplitMasks]]: the per-row coin is the first 4
    * hex chars of `md5(key || ":" || seed)` (the
    * [[stratifiedSamplePortable]] device), so the mask is a pure function
    * of (key, seed) — stable across runs, partitionings and engines, and
    * SQL-restatable. A row is validation iff its coin falls below
    * `valFraction` quantized to 1/65536. Pure codegen filter-free
    * projection: no shuffle, no RNG state. */
  def withSplitMasksPortable(nodes: DataFrame, keyCol: String,
      valFraction: Double, seed: String = "42"): DataFrame = {
    require(valFraction >= 0 && valFraction <= 1,
      s"valFraction must be in [0, 1], got $valFraction")
    val coin = substring(md5(concat(col(keyCol).cast("string"),
      lit(":" + seed))), 1, 4)
    val isVal = coin < lit(hex4(valFraction))
    nodes.withColumn("val_mask", isVal).withColumn("train_mask", !isVal)
  }

  /** Leakage-free GROUP split: every row whose `keyCol` hashes below the
    * threshold goes to "train", the rest to "test" — all rows sharing a key
    * land in the SAME split (what per-row seeded masks like [[withSplitMasks]]
    * cannot guarantee when an entity spans many rows). Content-hash based,
    * so the assignment is stable across runs, partitionings and engines —
    * new data joins the same split its key always had.
    *
    * `thresholdHex` is the first-2-hex-chars cutoff of md5(key): "cd" ≈ 80%
    * train (205/256). md5 keeps the assignment portable across engines
    * (SQL-restatable); [[groupSplitFast]] is the cheaper xxhash64 variant
    * for engine-internal use at scale. */
  def groupSplit(df: DataFrame, keyCol: String,
      thresholdHex: String = "cd"): DataFrame = {
    requireHex2(thresholdHex)
    df.withColumn("split",
      when(substring(md5(col(keyCol).cast("string")), 1, 2) < lit(thresholdHex),
        lit("train")).otherwise(lit("test")))
  }

  // md5 hex is lowercase [0-9a-f]; an uppercase or wrong-length threshold
  // would silently skew the fraction via lexicographic string comparison
  private def requireHex2(t: String): Unit =
    require(t.matches("[0-9a-f]{2}"),
      s"threshold '$t' must be exactly 2 lowercase hex chars")

  /** [[groupSplit]] with xxhash64 bucketing: trainPct of 100 buckets. */
  def groupSplitFast(df: DataFrame, keyCol: String, trainPct: Int,
      seed: Long = 42L): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, "trainPct must be in [0, 100]")
    df.withColumn("split",
      when(pmod(xxhash64(col(keyCol), lit(seed)), lit(100)) < trainPct,
        lit("train")).otherwise(lit("test")))
  }

  /** Deterministic content-hash row sample: keep rows whose md5(key) prefix
    * falls below `thresholdHex` (2 hex chars: threshold/256 of the key
    * space). Unlike `df.sample`, the choice is a pure function of the key —
    * stable across runs, partitionings, engines and data arrivals, so
    * samples drawn today and next month agree on shared keys (the property
    * an incremental training-data pipeline needs). Pure filter: pushes into
    * the scan, no shuffle. */
  def hashSample(df: DataFrame, keyCol: String, thresholdHex: String): DataFrame = {
    requireHex2(thresholdHex)
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 2) < lit(thresholdHex))
  }

  /** Stratified sample: a different keep-fraction per stratum (e.g.
    * downsample the dominant language, keep all of the rare one — the
    * rebalancing step of corpus curation). Deterministic per (key, seed)
    * via xxhash64 bucketing, so the choice is stable across runs and
    * partitionings, unlike `df.stat.sampleBy`'s RNG-stream sampling; the
    * whole thing is one codegen'd filter, no shuffle. Strata missing from
    * `fractions` keep `defaultFraction`. The per-stratum thresholds ride
    * the plan as ONE map literal probed per row — constant expression
    * depth however many strata there are (a when-chain, the obvious
    * encoding, grows the expression tree linearly and overflows the
    * analyzer's stack in the hundreds). */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    requireStringStrata(df, strataCol)
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(10000L))
    val keepBelow =
      if (fractions.isEmpty) lit(defaultFraction * 10000)
      else coalesce(
        element_at(typedLit(fractions.map { case (s, f) => s -> f * 10000 }),
          col(strataCol).cast("string")),
        lit(defaultFraction * 10000))
    df.filter(bucket < keepBelow)
  }

  /** Engine-portable [[stratifiedSample]]: the per-key coin is the first 4
    * hex chars of `md5(key || ":" || seed)` compared against a per-stratum
    * threshold (fraction quantized to 1/65536) — the same md5-prefix device
    * as [[hashSample]]/groupSplit, so ANY engine with md5 draws the
    * identical sample (the xxhash64 variant is Spark-only). Fraction 1.0
    * maps to a sentinel above every hex string so nothing is dropped. */
  def stratifiedSamplePortable(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      seed: String = "42"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    requireStringStrata(df, strataCol)
    val coin = substring(md5(concat(col(keyCol).cast("string"), lit(":" + seed))), 1, 4)
    // one map literal, constant expression depth at any strata count (the
    // stratifiedSample device)
    val threshold =
      if (fractions.isEmpty) lit(hex4(defaultFraction))
      else coalesce(
        element_at(typedLit(fractions.map { case (s, f) => s -> hex4(f) }),
          col(strataCol).cast("string")),
        lit(hex4(defaultFraction)))
    df.filter(coin < threshold)
  }

  // Fraction → 4-hex-char threshold for the md5 coin (quantized to
  // 1/65536). The clamp matters: round(f·65536) hits 65536 for
  // f ≥ ~0.9999924, which would format as the 5-char "10000" and break
  // the 4-char string compare — f ≥ 1.0 maps to a sentinel above every
  // hex string instead. ONE definition for every sampler that draws the
  // coin, so the quantization can never drift between them.
  private def hex4(f: Double): String =
    if (f >= 1.0) "g" else f"${math.min(0xffff, math.round(f * 65536).toInt)}%04x"

  // The strata thresholds probe a string-keyed map literal, so the
  // stratum column must BE a string: a numeric column would render "1.0"
  // against a "1" key and silently fall through to the default fraction
  // (the old when-chain coerced; the constant-depth map probe cannot).
  // Cast in the caller — the cast is visible there, the mismatch loud here.
  private def requireStringStrata(df: DataFrame, strataCol: String): Unit =
    require(df.schema(strataCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"stratum column `$strataCol` must be a string (got " +
        s"${df.schema(strataCol).dataType.simpleString}); cast it first — " +
        "fraction keys match the string rendering exactly")

  /** Deterministic k-fold cross-validation assignment: fold =
    * (first 16 bits of md5(key || ":" || seed)) mod k — a pure function of
    * the key like every sampler here (an entity keeps its fold across
    * runs, partitionings, engines and data arrivals, which is what makes
    * CV splits reproducible and leakage-free when rows sharing a key must
    * stay together: pass the GROUP key, not the row id). One codegen
    * expression, no shuffle. */
  def kFold(df: DataFrame, keyCol: String, k: Int,
      seed: String = "cv"): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    require(k <= 0x10000, s"k must fit the 16-bit coin, got $k")
    val h = conv(substring(md5(concat(col(keyCol).cast("string"),
      lit(":" + seed))), 1, 4), 16, 10).cast("int")
    df.withColumn("fold", pmod(h, lit(k)))
  }

  /** Deterministic k-rows-per-group sample: within each group, rank rows
    * by `md5(key || ":" || seed)` (key tiebreak) and keep the first `k` —
    * the fixed-size companion of [[stratifiedSample]]'s fixed-fraction
    * coin. Like every sampler here the choice is a pure function of
    * (key, seed): stable across runs, partitionings and engines, and
    * SQL-restatable as a row_number over the same md5 order. One window
    * sort partitioned by group; Spark plans a WindowGroupLimit (rank
    * pushdown) so no group is fully sorted at scale. */
  def topKPerGroup(df: DataFrame, groupCol: String, keyCol: String, k: Int,
      seed: String = "42"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val coin = md5(concat(col(keyCol).cast("string"), lit(":" + seed)))
    val w = Window.partitionBy(col(groupCol)).orderBy(coin, col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** HGT-style per-node-TYPE budget sampling — the other half of the
    * reference's loader pair (blueprint_mlflow.py:119-133 drives training
    * through `HGTLoader`, whose `num_samples` is a budget of nodes per
    * node TYPE per hop; W5's [[topKPerGroup]]-based neighbor cap covers
    * the `NeighborLoader` per-edge fan-out). Input: one row per typed
    * expansion candidate `(typeCol, keyCol)` — the union of a frontier's
    * typed reachable sets, duplicates allowed (several frontier edges
    * reaching the same node). The HGT distinction from a per-edge cap:
    * candidates are collapsed to unique NODES first, so the budget counts
    * nodes, and a node's selection odds don't scale with its in-edge
    * count. Then at most `budget` nodes per type survive, ranked by the
    * md5 coin of (type, key) in its own `:hgt:` seed namespace (the
    * upsample `:up:` device — independent of any other sampler's draw on
    * the same key; hashing the TYPE in keeps two node types that share a
    * key string on independent draws, so a shared key is not favored in
    * both types together). Pure function of (type, key, seed): stable
    * across runs,
    * partitionings and engines; one distinct + one WindowGroupLimit-
    * planned top-budget per type, SQL-restatable as row_number over the
    * same md5 order. */
  def budgetSample(candidates: DataFrame, typeCol: String, keyCol: String,
      budget: Int, seed: String = "42"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val uniq = candidates.select(col(typeCol), col(keyCol)).distinct()
    val coin = md5(concat(col(typeCol).cast("string"), lit(":"),
      col(keyCol).cast("string"), lit(":hgt:" + seed)))
    val w = Window.partitionBy(col(typeCol)).orderBy(coin, col(keyCol))
    uniq.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= budget).drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * exponential-race form) — the quality-weighted corpus selection step
    * none of the uniform samplers cover: "keep the best-k documents where
    * a doc's odds scale with its quality/length/dedup-priority weight".
    * Each row draws `e = −ln(u)/w` with `u` the md5 coin of its key in
    * the `:ws:` namespace mapped into (0, 1); the k SMALLEST `e` win —
    * the first k arrivals of independent exponential clocks with rates
    * `w`, which is exactly sequential weighted draws without replacement.
    *
    * Engine-portable: `u = (int(md5[0:12]) + 0.5) / 16¹²` is a pure
    * function of (key, seed) — 48 bits of coin, the +0.5 keeps u
    * strictly inside (0,1) so ln never sees 0 — and ties on `e`
    * (impossible up to float drift) break by key. The plan is a
    * distributed TakeOrderedAndProject (sort-limit pushes top-k into
    * each partition), NOT a single-task global window — the same
    * scale shape as ORDER BY + LIMIT.
    *
    * Weights must be positive and non-NULL (a zero-weight row's clock
    * never fires; a NULL would sort arbitrarily) — rejected up front,
    * the [[graft.graph.PageRank.runWeighted]] fail-fast device.
    *
    * @param k rows to keep (all rows if fewer)
    * @return the winning input rows, original columns only */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: String = "42"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = col(weightCol).cast("double")
    val bad = df.filter(w.isNull || w <= 0).limit(1).count()
    require(bad == 0, "weights must be positive and non-NULL")
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"),
        lit(":ws:" + seed))), 1, 12), 16, 10).cast("double") + 0.5) /
      lit(math.pow(16.0, 12))
    val e = -log(u) / w
    df.withColumn("__e", e)
      .orderBy(col("__e"), col(keyCol))
      .limit(k)
      .drop("__e")
  }

  /** Deterministic fractional up-sampling — the "epochs per source" knob
    * of a pretraining data mix ([[temperatureMix]] can only DOWN-sample;
    * rebalancing a rare-but-valuable source means repeating it): each row
    * whose stratum has weight `w` is emitted `⌊w⌋` times plus one more
    * with probability `frac(w)`, decided by the md5 coin of
    * [[stratifiedSamplePortable]] — so the copy count is a pure function
    * of (key, seed), stable across engines, and the expected multiplicity
    * is exactly `w`. One `explode(sequence(...))` inside the scan: no
    * shuffle, output size `Σ wᵢ·nᵢ` by construction. Copies carry a
    * 0-based `copy_id` so downstream shuffles can spread them.
    *
    * The coin lives in its own `:up:` seed NAMESPACE: down-sampling
    * (temperatureMix / stratifiedSample*) then up-sampling the SAME key
    * column is the standard mix recipe, and if both drew the identical
    * md5 coin the decisions would correlate — rows that survived a
    * keep-fraction f ≤ 0.5 cut would ALL win a 0.5 extra-copy toss
    * (P(extra | survived) = min(1, frac/f), not frac). The namespace
    * keeps the two draws independent (the kFold `:cv` device). */
  def upsample(df: DataFrame, strataCol: String, keyCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: String = "42"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "weights must be non-negative")
    requireStringStrata(df, strataCol)
    val whole = (w: Double) => math.floor(w).toLong
    val fracHex = (w: Double) => hex4(w - math.floor(w))
    val base =
      if (weights.isEmpty) lit(whole(defaultWeight))
      else coalesce(
        element_at(typedLit(weights.map { case (s, w) => s -> whole(w) }),
          col(strataCol)),
        lit(whole(defaultWeight)))
    val extraThreshold =
      if (weights.isEmpty) lit(fracHex(defaultWeight))
      else coalesce(
        element_at(typedLit(weights.map { case (s, w) => s -> fracHex(w) }),
          col(strataCol)),
        lit(fracHex(defaultWeight)))
    val coin = substring(md5(concat(col(keyCol).cast("string"),
      lit(":up:" + seed))), 1, 4)
    val copies = base + when(coin < extraThreshold, 1L).otherwise(0L)
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Temperature-flattened corpus mixing (the multi-source sampling rule of
    * multilingual/multi-domain LLM pretraining, α = 0.5): source `i` with
    * `n_i` rows is resampled toward weight `√n_i / Σ√n_j`, which upweights
    * rare sources and downweights dominant ones relative to proportional
    * sampling. `targetFraction` sets the overall corpus budget; each
    * source's keep fraction is `min(1, N·⌊√n_i⌋ / (Σ⌊√n_j⌋ · n_i))` with
    * `N = round(targetFraction · Σn_j)`.
    *
    * Determinism across engines is designed in: the square roots go
    * through ⌊√n⌋ so every product and sum stays an exact integer, and the
    * single final division is one IEEE op — any engine computes the same
    * keep fraction bit-for-bit, and the per-row coin is the md5 device of
    * [[stratifiedSamplePortable]] (to which this delegates). The per-source
    * counts are one aggregation collected to the driver — sound ONLY while
    * `sourceCol` is a genuinely low-cardinality partition key (language,
    * domain, dataset name: the scalar-state class of Lloyd centroids).
    * `maxSources` enforces that contract: a caller who mixes on a
    * data-sized key (doc id, url) gets a clear IllegalArgumentException at
    * `maxSources + 1` collected rows instead of a driver OOM at
    * data-cardinality rows. The filter itself is one codegen scan: no
    * shuffle at any data size. */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
      targetFraction: Double, seed: String = "42",
      maxSources: Int = 100000): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    require(maxSources >= 1, s"maxSources must be >= 1, got $maxSources")
    // limit(maxSources + 1) caps what can ever reach the driver; one extra
    // row is enough to DETECT the violation without collecting the tail
    val countRows = df.groupBy(col(sourceCol)).count()
      .limit(maxSources + 1).collect()
    require(countRows.length <= maxSources,
      s"`$sourceCol` has more than $maxSources distinct values — " +
        "temperatureMix collects per-source counts to the driver and is " +
        "meant for low-cardinality source keys (language, domain, dataset); " +
        "raise maxSources only if the key really is bounded")
    require(!countRows.exists(_.isNullAt(0)),
      s"NULL values in `$sourceCol` — a NULL stratum can't be routed by the " +
        "per-source coin; fill or filter before mixing")
    val counts: Map[String, Long] =
      countRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no rows to mix")
    val isq = counts.map { case (s, n) => s -> math.sqrt(n.toDouble).toLong }
    val sumIsq = isq.values.sum
    val target = math.round(targetFraction * counts.values.sum)
    val fractions = counts.map { case (s, n) =>
      s -> math.min(1.0, (target * isq(s)).toDouble / (sumIsq * n).toDouble)
    }
    stratifiedSamplePortable(df, sourceCol, keyCol, fractions,
      defaultFraction = 0.0, seed = seed)
  }
}

class BfsSampler(schema: Schema, tables: Map[String, DataFrame], maxDepth: Int) {

  // joinCols are the COLUMNS OF `table` the frontier keys match; keys'
  // columns are __k0..__kn aligned positionally with joinCols. Composite
  // keys ride the same shape as RelGraph.fkEdges — the reference left
  // multi-column frontiers as a TODO (bfs.py:54) even though its schema
  // declares them (schema.py:163-182); here they just work.
  private case class QueueItem(table: String, depth: Int, parent: Option[String],
      joinCols: Option[Seq[String]], keys: Option[DataFrame])

  /** The seed row: LIMIT 1 OFFSET idx of the target table in PK order
    * (bfs.py:38; order pinned by the engine contract, see class doc). */
  private def seedRow(targetTable: String, idx: Int): DataFrame = {
    val full = tables(targetTable)
    val order = schema(targetTable).primaryKey match {
      case Nil => full.columns.toSeq
      case pk  => pk
    }
    full.orderBy(order.map(col): _*).offset(idx).limit(1)
  }

  /** Expand from row `idx` (0-based, PK order) of `targetTable`.
    * @return accumulated distinct rows per visited table */
  def sample(targetTable: String, idx: Int): Map[String, DataFrame] = {
    val queue = mutable.Queue(QueueItem(targetTable, 0, None, None, None))
    val acc = mutable.Map.empty[String, DataFrame]

    while (queue.nonEmpty) {
      val QueueItem(tableName, depth, parent, joinCols, keys) = queue.dequeue()
      if (depth >= maxDepth) return acc.toMap.map { case (t, df) => t -> df.distinct() }

      val full = tables(tableName)
      val batch = if (depth == 0) {
        seedRow(tableName, idx)
      } else {
        val k = keys.get.distinct()
        val cond = joinCols.get.zip(k.columns)
          .map { case (c, kc) => full(c) === k(kc) }.reduce(_ && _)
        full.join(broadcast(k), cond, "left_semi")
      }
      acc(tableName) = acc.get(tableName).fold(batch)(_.unionAll(batch))

      if (depth + 1 != maxDepth) {
        val collected = acc(tableName)
        val processedForeign = mutable.Set.empty[String]
        // positionally-aligned frontier key frame: one __k<i> per FK column
        def keyFrame(cols: Seq[String]) = collected.select(
          cols.zipWithIndex.map { case (c, i) => col(c).as(s"__k$i") }: _*)
        // forward: FK values of collected rows -> parent ref columns (:52-60)
        schema(tableName).foreignKeys.foreach { fk =>
          queue.enqueue(QueueItem(fk.refTable, depth + 1, Some(tableName),
            Some(fk.refColumns), Some(keyFrame(fk.columns))))
          processedForeign += fk.refTable
        }
        // reverse: tables referencing this one (:62-82). Single-column
        // edges keep the reference's first-column probe assumption; a
        // composite edge has no reference analogue (its TODO), so it
        // probes by the FK's declared referenced columns.
        schema.tables.foreach { case (nextTable, nextSchema) =>
          val skip = processedForeign.contains(nextTable) || parent.contains(nextTable)
          if (!skip) {
            nextSchema.foreignKeys.filter(_.refTable == tableName).foreach { fk =>
              val probe =
                if (fk.columns.lengthCompare(1) == 0)
                  collected.select(col(collected.columns.head).as("__k0"))
                else keyFrame(fk.refColumns)
              queue.enqueue(QueueItem(nextTable, depth + 1, Some(tableName),
                Some(fk.columns), Some(probe)))
            }
          }
        }
      }
    }
    acc.toMap.map { case (t, df) => t -> df.distinct() }
  }

  /** Per-table row counts of a sample, as one DataFrame (table_name, n). */
  def sampleStats(targetTable: String, idx: Int): DataFrame = {
    val dfs = sample(targetTable, idx).toSeq.sortBy(_._1).map { case (t, df) =>
      df.agg(count(lit(1)).as("n")).select(lit(t).as("table_name"), col("n"))
    }
    dfs.reduce(_.unionAll(_))
  }

  /** Virtual `_target_table` node + edge to the seed row — the reference
    * attaches a synthetic single-node table and one `(_target_table,
    * _target_fk, target)` edge per sample so the model can read the
    * prediction target off a fixed node type
    * (data/dataset.py:271 `x = ones((1,1))`, :356-362 edge to the seed).
    *
    * @return (sampled tables incl. `_target_table` with its 1-feature row,
    *         virtual edge DataFrame (src_id=0, seed PK value))
    */
  def sampleWithVirtualTarget(targetTable: String, idx: Int)
      : (Map[String, DataFrame], DataFrame) = {
    val acc = sample(targetTable, idx)
    val seed = seedRow(targetTable, idx)
    val pkCol = schema(targetTable).primaryKey match {
      case Nil => tables(targetTable).columns.head
      case pk  => pk.head
    }
    val virtualNode = seed.select(lit(0L).as("id"), array(lit(1.0)).as("feat"))
    val virtualEdge = seed.select(lit(0L).as("src_id"), col(pkCol).as("dst_key"))
    (acc + (BfsSampler.VirtualTargetTable -> virtualNode), virtualEdge)
  }

  /** [[sampleStats]] over [[sampleWithVirtualTarget]]: the per-table counts
    * plus the virtual node row and its edge count (both derived from the
    * seed DataFrame, so an empty seed reports 0). */
  def sampleStatsWithVirtualTarget(targetTable: String, idx: Int): DataFrame = {
    val (tablesOut, vEdge) = sampleWithVirtualTarget(targetTable, idx)
    val rows =
      tablesOut.toSeq.sortBy(_._1).map { case (t, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(t).as("table_name"), col("n"))
      } :+ vEdge.agg(count(lit(1)).as("n")).select(
        lit(s"${BfsSampler.VirtualTargetTable}->_target_fk->$targetTable").as("table_name"),
        col("n"))
    rows.reduce(_.unionAll(_))
  }
}

object BfsSampler {
  /** Name of the synthetic target node type (data/dataset.py:271). */
  val VirtualTargetTable = "_target_table"
}
