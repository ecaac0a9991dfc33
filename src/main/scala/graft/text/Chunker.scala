package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text preparation: sliding-window chunking and blocklist
  * redaction. Both are pure per-row transforms — a chunked or scrubbed
  * 100 TB corpus costs one scan with zero shuffles, and Catalyst keeps
  * the whole pipeline inside one codegen stage. (Beyond the reference's
  * own surface — part of the LLM-pipeline operator family alongside
  * [[TextAnalysis]] / [[graft.dedup.Dedup]].)
  */
object Chunker {

  /** Overlapping token windows for context-length-bounded training: each
    * document's whitespace tokens are cut into windows of `window` tokens
    * starting every `stride` tokens (overlap = window − stride). Window
    * starts run while they can still contribute an unseen token
    * (start ≤ len − overlap, min one window), so a short tail is emitted
    * once rather than as a fully-contained suffix of its predecessor.
    * Output: (id, chunk_id, n_tokens, chunk); the final chunk may be
    * shorter than `window`. NULL/blank documents produce no chunks. */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val overlap = window - stride
    val starts = sequence(lit(1),
      greatest(lit(1), size(col("__w")) - overlap), lit(stride))
    docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(starts).as(Seq("__p", "__s")))
      .select(col(idCol),
        (col("__p") + 1).cast("bigint").as("chunk_id"),
        size(slice(col("__w"), col("__s"), lit(window))).cast("bigint").as("n_tokens"),
        array_join(slice(col("__w"), col("__s"), lit(window)), " ").as("chunk"))
  }

  /** Blocklist scrubbing: replace whole-word, case-insensitive occurrences
    * of `terms` with `replacement` and report how many were hit per
    * document. Terms must be word-like so the generated alternation regex
    * is injection-safe and `\b` anchoring is well-defined. NULL text stays
    * NULL (count and all), matching the repetitionStats contract. */
  def redactBlocklist(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], replacement: String = "[REDACTED]"): DataFrame = {
    require(terms.nonEmpty, "need at least one blocklist term")
    require(terms.forall(_.matches("[A-Za-z0-9_]+")),
      s"blocklist terms must be word-like: ${terms.filterNot(_.matches("[A-Za-z0-9_]+"))}")
    val pat = "(?i)\\b(" + terms.map(_.toLowerCase).distinct.sorted.mkString("|") + ")\\b"
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(pat)).cast("bigint").as("n_redacted"),
      regexp_replace(col(textCol), pat, replacement).as("redacted"))
  }

  /** Greedy sequence packing (concat-and-chunk): documents are laid
    * end-to-end in id order within each `bucketCol` group, and each doc is
    * assigned to the fixed-`capacity` training sequence where it STARTS —
    * the standard concatenation packing for LLM pretraining (splitting the
    * overflow across the boundary is [[slidingChunks]]'s job downstream).
    * Output: (bucket, id, n_tokens, seq_id, seq_offset) where `seq_offset`
    * is the doc's start position inside its sequence.
    *
    * Packing is inherently a prefix sum, and this is its distributed
    * shape: ONE shuffle on the bucket key, then a single sorted pass per
    * bucket (running-total window). At 100 TB, bucket by (lang, shard) so
    * each group is executor-sized; buckets pack independently and in
    * parallel. NULL/blank documents carry no tokens and are dropped. */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, bucketCol: String): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    // ROWS frame, not the default RANGE: duplicate ids within a bucket
    // must still get distinct prefix sums (RANGE is peer-inclusive)
    val w = Window.partitionBy(col(bucketCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(bucketCol), col(idCol),
        size(split(lower(trim(col(textCol))), "\\s+")).cast("bigint").as("n_tokens"))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(bucketCol), col(idCol), col("n_tokens"),
        floor(col("__start") / capacity).cast("bigint").as("seq_id"),
        (col("__start") - floor(col("__start") / capacity) * capacity)
          .cast("bigint").as("seq_offset"))
  }

  /** Corpus-derived top-`k` vocabulary: whitespace tokens ranked by
    * frequency (count desc, token asc — the heavy-hitters tiebreak), ids
    * 0..k−1. THE tokenization + ranking contract shared by
    * [[encodeTokens]] callers — one definition, so the whitespace regex
    * and tiebreak can't drift between the vocab builder and the encoder.
    * Ranking is a distributed top-k (per-partition pre-cut + range-sort
    * rank, [[graft.functions.DistributedRank.topK]]) — no single-partition
    * window even when the raw distinct-token set is huge. Output:
    * (token, tid, n). */
  def topKVocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    graft.functions.DistributedRank
      .topK(counts, Seq(col("n").desc, col("token")), "__r", k)
      .select(col("token"), (col("__r") - 1).cast("int").as("tid"), col("n"))
  }

  /** Tokenizer encode: map each document's tokens to integer ids through a
    * broadcast vocabulary table (token → id), out-of-vocabulary tokens to
    * `unkId` — the corpus → token-id-sequences step in front of packing/
    * chunking. One broadcast hash join on the exploded tokens (the vocab
    * is model-sized, not corpus-sized) and one per-doc re-assembly
    * aggregate; order is restored by sorting (pos, id) structs, so the
    * result is partitioning-independent. Output: (id, n_tokens,
    * token_ids). NULL/blank docs are dropped (no token stream exists). */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, tokenCol: String, tokenIdCol: String,
      unkId: Int = -1): DataFrame = {
    val tok = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("__p", "__tk")))
    tok
      .join(broadcast(vocab.select(col(tokenCol).as("__tk"),
        col(tokenIdCol).as("__tid"))), Seq("__tk"), "left")
      .select(col(idCol),
        struct(col("__p"),
          coalesce(col("__tid"), lit(unkId)).cast("int").as("__t")).as("__e"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(col("__e"))),
        e => e.getField("__t")).as("token_ids"))
      .select(col(idCol), size(col("token_ids")).cast("bigint").as("n_tokens"),
        col("token_ids"))
  }

  /** Length-bucketed batching for padded inference/training: round each
    * document's token count up to a multiple of `bucketWidth`, then cut
    * each length bucket into batches of `batchSize` docs in id order, and
    * report per-batch padding economics (pad target = longest doc in the
    * batch). Grouping similar lengths together is what keeps `waste_frac`
    * (the fraction of padded positions that are padding) near zero — the
    * whole point of length bucketing. Integer arithmetic until the final
    * rounded division, so the numbers are engine-portable. Two shuffles:
    * the per-bucket sort and the per-batch aggregate, both on bounded
    * keys. */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
      batchSize: Int, bucketWidth: Int = 16): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val n = size(split(lower(trim(col(textCol))), "\\s+")).cast("bigint")
    val bucket = (floor((n + (bucketWidth - 1)) / bucketWidth) * bucketWidth)
      .cast("bigint")
    val w = Window.partitionBy(col("len_bucket")).orderBy(col(idCol))
    docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol), n.as("n_tokens"), bucket.as("len_bucket"))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / batchSize).cast("bigint"))
      .groupBy(col("len_bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .select(col("len_bucket"), col("batch_id"), col("n_docs"),
        col("max_tokens"), col("sum_tokens"),
        round(lit(1.0) - col("sum_tokens") / (col("n_docs") * col("max_tokens")), 4)
          .as("waste_frac"))
  }

  /** The greedy left-to-right BPE merge of one (a, b) pair applied to a
    * symbol array — a single `aggregate` fold, codegen'd: when the
    * accumulator ends in `a` and the next symbol is `b`, the pair fuses;
    * overlapping occurrences merge leftmost-first (classic BPE: "aaa"
    * under (a,a) → ["aa", "a"]). */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Byte-pair-encoding merge-rule training over the corpus — the real
    * subword-vocabulary learner behind [[topKVocab]]'s word-level
    * approximation (Sennrich et al. 2016, the standard LLM tokenizer
    * construction). Trains on the DISTINCT-WORD frequency table (corpus
    * tokenization is one aggregation; every later pass touches vocab-sized
    * data only, the classic BPE trick — a 100 TB corpus costs one scan,
    * then each merge round is a pair-count aggregate + a fold over words
    * whose cost is independent of corpus size). Each round: adjacent-pair
    * weighted count (one partial-aggregating shuffle), argmax pair with
    * (count desc, pair asc) tiebreak — ONE driver row per round, the same
    * scalar-state class as Lloyd centroids — then the [[mergePair]] fold,
    * eagerly checkpointed so lineage stays flat. Deterministic: counts are
    * exact integers and the tiebreak totalizes, so any partitioning learns
    * the identical merge table.
    *
    * @return merge rules in learned order, and the per-rule weighted
    *         pair count (the rule's corpus frequency at learn time) */
  def trainBpe(docs: DataFrame, textCol: String, nMerges: Int,
      endMark: String = "</w>"): Seq[(String, String, Long)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val chars = regexp_extract_all(col("__w"), lit("(?s)."), lit(0))
    var words = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
      .select(concat(chars, array(lit(endMark))).as("__s"), col("__n"))
      .localCheckpoint(true)
    // sequence(1, 0) would count DOWN (Spark infers a negative step), so
    // single-symbol words must short-circuit to an empty pair list
    def pairList(syms: Column): Column =
      when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
        .otherwise(transform(sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("a"),
            element_at(syms, i + 1).as("b"))))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    (1 to nMerges).foreach { _ =>
      if (!exhausted) {
        val top = words
          .select(explode(pairList(col("__s"))).as("__p"), col("__n"))
          .groupBy(col("__p.a"), col("__p.b")).agg(sum(col("__n")).as("__c"))
          .orderBy(col("__c").desc, col("a"), col("b")).limit(1).collect()
        if (top.isEmpty) exhausted = true // every word fused to one symbol
        else {
          val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((a, b, c))
          val next = words.withColumn("__s", mergePair(col("__s"), a, b))
            .localCheckpoint(true)
          // next is materialized — drop the superseded round's blocks now
          // rather than leaving them to driver GC (graft.util.Checkpoints)
          graft.util.Checkpoints.release(words)
          words = next
        }
      }
    }
    // the result is the driver-side merge table: even the final working
    // frame is dead weight once the loop exits
    graft.util.Checkpoints.release(words)
    merges.toSeq
  }

  /** Segment each document's words with a learned merge table: the rules
    * of [[trainBpe]] applied in learned order (BPE's apply-time contract)
    * to each DISTINCT word — vocab-sized work — then joined back to the
    * exploded corpus and reassembled in document order. The per-word fold
    * chain is `merges.length` nested [[mergePair]] expressions: bounded by
    * the merge count, not the corpus. Output: (id, subwords). */
  def applyBpe(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String, Long)], endMark: String = "</w>"): DataFrame = {
    val tok = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("__p", "__w")))
      .filter(length(col("__w")) > 0)
    val chars = regexp_extract_all(col("__w"), lit("(?s)."), lit(0))
    val segmented = merges.foldLeft(
      concat(chars, array(lit(endMark)))) { case (acc, (a, b, _)) =>
      mergePair(acc, a, b)
    }
    val vocab = tok.select(col("__w")).distinct()
      .select(col("__w"), segmented.as("__sub"))
    tok.join(vocab, "__w")
      .select(col(idCol), struct(col("__p"), col("__sub")).as("__e"))
      .groupBy(col(idCol))
      .agg(flatten(transform(array_sort(collect_list(col("__e"))),
        e => e.getField("__sub"))).as("subwords"))
  }

  /** Deterministic BALANCED shard assignment for training-data export:
    * rank documents by (token count desc, id) and deal them round-robin
    * across `nShards` (shard = (rank−1) mod n) — the static analogue of
    * longest-processing-time scheduling, so every shard gets the same doc
    * count (±1) and near-equal token mass, and the assignment is an
    * engine-portable closed form (`row_number` restates it in SQL).
    *
    * Scale: the global rank is [[graft.functions.DistributedRank.withRank]]
    * (range-sort + zipWithIndex — distributed, but EAGER and bounded at
    * its default 100M rows; see its contract). When balance doesn't need
    * to be deterministic-exact, prefer `pmod(xxhash64(id), n)` (the
    * s10_hash_sample device): one scan, no sort, balanced in expectation.
    *
    * Output: (id, n_tokens, shard). */
  def balancedShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val counted = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    graft.functions.DistributedRank
      .withRank(counted, Seq(col("n_tokens").desc, col(idCol)), "__rk")
      .select(col(idCol), col("n_tokens"),
        pmod(col("__rk") - 1, lit(nShards.toLong)).cast("int").as("shard"))
  }
}
