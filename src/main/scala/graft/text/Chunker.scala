package graft.text

import org.apache.spark.sql.DataFrame
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
}
