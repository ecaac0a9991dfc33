package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick pretraining documents whose hashed-n-gram
  * distribution looks like a target corpus. Three stages, each a
  * first-class Spark op:
  *
  *   1. [[fitLogRatio]] — estimate per-bucket log(p̂/q̂) from a
  *      target/raw split (bag of hashed uni+bigrams, add-1 smoothing);
  *   2. [[score]] / [[scoreAgainstTarget]] — per-document importance
  *      log-weight = Σ_ngrams log-ratio(bucket);
  *   3. [[gumbelTopK]] — sample k docs WITHOUT replacement with
  *      probability ∝ exp(log-weight) via the Gumbel-top-k trick.
  *
  * Everything is engine-portable: the bucket hash is the first 7 hex
  * chars of md5 mod nBuckets (the same device as
  * [[TextAnalysis.hashedLinearScore]]) and the Gumbel coin is the md5
  * 16-bit coin, so DuckDB recomputes every bucket, weight, and pick.
  *
  * 100 TB shape: the corpus is scanned once and shuffled once, keyed
  * (doc, bucket) with map-side combine; the bucket histograms and the
  * log-ratio table are ≤ nBuckets rows (paper uses 10⁴ — always
  * broadcastable), and Gumbel-top-k is one global top-k, no shuffle of
  * the corpus itself. Fit on a sample or a separate target corpus,
  * then [[score]] any number of shards against the frozen table.
  */
object Dsir {

  /** Hashed uni+bigram bucket ids for one document's text — the DSIR
    * feature extractor. Lowercased whitespace tokens; bigrams are the
    * space-joined adjacent pairs (empty when fewer than 2 tokens);
    * bucket = first 7 md5 hex chars mod `nBuckets` (portable, always
    * non-negative, fits a long).
    */
  def hashedNgramBuckets(textCol: Column, nBuckets: Int): Column = {
    require(nBuckets > 0, "nBuckets must be positive")
    transform(ngramStrings(textCol), g => bucketOf(g, nBuckets))
  }

  /** The raw uni+bigram strings of one document (pre-hash). Kept separate
    * from [[hashedNgramBuckets]] so pipelines can explode the STRINGS and
    * hash post-explode: higher-order `transform` is CodegenFallback, so an
    * md5 inside the lambda evaluates interpreted per n-gram, while the
    * same md5 applied to the exploded column compiles into whole-stage
    * codegen (~the entire map-side cost of the DSIR pass — guide §1.2
    * "per-task work", measured 2× on dsir1 at sf0.1). */
  private def ngramStrings(textCol: Column): Column = {
    val w = split(lower(trim(textCol)), "\\s+")
    val bi = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(w, bi)
  }

  /** Bucket id of one n-gram string: first 7 md5 hex chars mod nBuckets —
    * identical arithmetic whether applied inside the transform lambda
    * ([[hashedNgramBuckets]]) or to an exploded column (codegen). */
  private def bucketOf(g: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(g), 1, 7), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** Per-(doc, target-flag, bucket) n-gram counts — the one
    * corpus-wide pass every later stage re-aggregates. One shuffle,
    * map-side combine.
    */
  private def docBucketCounts(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int): DataFrame =
    // Spread.wide (narrow scans would single-thread the md5 pass) +
    // hash-after-explode (md5 in whole-stage codegen, not in the
    // CodegenFallback transform lambda — see ngramStrings)
    graft.util.Spread.wide(docs.filter(col(textCol).isNotNull))
      .select(col(idCol), isTarget.as("__tgt"),
        explode(ngramStrings(col(textCol))).as("__g"))
      .select(col(idCol), col("__tgt"), bucketOf(col("__g"), nBuckets).as("bucket"))
      .groupBy(col(idCol), col("__tgt"), col("bucket"))
      .agg(count(lit(1)).as("__c"))

  /** Estimate the per-bucket importance log-ratio
    * `ln p̂(b) − ln q̂(b)` where p̂ is the hashed-n-gram distribution of
    * the `isTarget` rows and q̂ of ALL rows, both add-1 smoothed over
    * `nBuckets` cells. Returns exactly `nBuckets` rows
    * (bucket, log_ratio) — never-seen buckets carry the smoothing
    * prior's ratio. Shuffle cost: one corpus pass into ≤ nBuckets
    * groups.
    */
  def fitLogRatio(docs: DataFrame, textCol: String, isTarget: Column,
      nBuckets: Int): DataFrame = {
    val b = graft.util.Spread.wide(docs.filter(col(textCol).isNotNull))
      .select(isTarget.as("__tgt"),
        explode(ngramStrings(col(textCol))).as("__g"))
      .select(col("__tgt"), bucketOf(col("__g"), nBuckets).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("__cr"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    logRatioFromCounts(b, nBuckets)
  }

  /** Smooth bucket counts (bucket, __cr raw, __ct target) into the
    * dense (bucket, log_ratio) table. The totals are a global window
    * over the ≤ nBuckets-row counts frame itself — a deliberate
    * single-partition window on a cardinality-bounded frame, chosen
    * over `counts.agg(...)` + crossJoin because the separate aggregate
    * subtree defeats Spark's exchange reuse and re-scans the corpus.
    */
  private def logRatioFromCounts(counts: DataFrame, nBuckets: Int): DataFrame = {
    val spark = counts.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val dense = spark.range(nBuckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
    dense.select(col("bucket"),
      (log((col("__ct") + 1).cast("double") /
          (sum("__ct").over(w) + nBuckets).cast("double")) -
       log((col("__cr") + 1).cast("double") /
          (sum("__cr").over(w) + nBuckets).cast("double")))
        .as("log_ratio"))
  }

  /** Score documents against a frozen (bucket, log_ratio) table:
    * log_weight = Σ_buckets count(doc, b) · log_ratio(b), rounded to
    * 4 dp for engine-portable output. The log-ratio table is broadcast
    * (≤ nBuckets rows); the corpus shuffles once on (doc, bucket).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      logRatio: DataFrame, nBuckets: Int): DataFrame =
    scoreCounts(docBucketCounts(docs, idCol, textCol, lit(false), nBuckets),
      idCol, logRatio)

  private def scoreCounts(dcb: DataFrame, idCol: String,
      logRatio: DataFrame): DataFrame =
    dcb.join(broadcast(logRatio), "bucket")
      .groupBy(col(idCol))
      .agg(sum("__c").cast("bigint").as("n_ngrams"),
        round(sum(col("__c") * col("log_ratio")), 4).as("log_weight"))

  /** Fused fit + score: estimate the log-ratio from `isTarget` and
    * score every document, scanning and shuffling the corpus ONCE —
    * the bucket histogram is a second aggregation of the same
    * (doc, bucket) counts, not a second pass over the text.
    */
  def scoreAgainstTarget(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int): DataFrame = {
    // dcb feeds TWO consumers (the bucket histogram behind the broadcast
    // log-ratio table, then the per-doc score join); without
    // materialization the static plan carries the corpus explode+md5
    // subtree TWICE and executes both (verified in the r14 plan dump —
    // exchange reuse does not collapse them across the broadcast
    // boundary). The counts frame is ≤ |docs|·min(nBuckets, doc n-grams)
    // rows — far smaller than the exploded n-gram stream it replaces.
    // The withShingleSets discipline: persist, eagerly compute the
    // result (localCheckpoint truncates lineage off the cache), release.
    val dcb = docBucketCounts(docs, idCol, textCol, isTarget, nBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = dcb.groupBy("bucket")
        .agg(sum("__c").as("__cr"),
          sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__ct"))
      // NOTE eager-execution semantics: calling this method runs the
      // corpus pass as Spark jobs at CALL time and returns a
      // materialized (lineage-truncated) frame — caller-side filters do
      // not push into the scan, and off local mode an executor loss
      // invalidates the blocks (no lineage to recompute). That is the
      // deliberate trade for scanning the corpus once across the two
      // consumers; a caller needing a lazy plan should compose [[score]]
      // with [[fitLogRatio]] instead. Under tools.Explain's lazyPlans
      // mode the checkpoint is skipped so plan dumps show the real
      // dataflow (Checkpoints.eager).
      graft.util.Checkpoints.eager(
        scoreCounts(dcb, idCol, logRatioFromCounts(counts, nBuckets)))
    } finally { dcb.unpersist(); () }
  }

  /** Gumbel-top-k resampling: draw `k` rows without replacement with
    * probability ∝ exp(weightCol). Each row's key is
    * `weight + Gumbel(0,1)` with the Gumbel drawn from the portable
    * md5 16-bit coin of (id, seed) — u = (coin + 0.5)/65536 ∈ (0,1),
    * g = −ln(−ln u) — so the pick is deterministic and
    * engine-reproducible. One global top-k (no corpus shuffle);
    * `gumbel_key` is exposed (rounded) for auditability.
    */
  def gumbelTopK(scored: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val coin = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 4), 16, 10).cast("double")
    val u = (coin + 0.5) / 65536.0
    val key = col(weightCol) + -log(-log(u))
    scored.select(col(idCol), col(weightCol), key.as("__key"))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol), round(col("__key"), 4).as("gumbel_key"))
  }
}
