package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. All pure Catalyst expressions (codegen'd, no UDFs) so
  * they stay inside whole-stage codegen on a 100 TB corpus scan.
  *
  * (No counterpart in the reference — its only text handling is embedding
  * text columns, ctu_dataset.py:43-52; these are the net-new LLM-pipeline
  * operators.)
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank strings count 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))
      .cast("int")

  /** BPE-ish subword proxy count: letter runs, digit runs, and isolated
    * non-space symbols — the usual pre-tokenizer split, a cheap stand-in
    * for a real BPE vocab. */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("int")

  private val punctChars = ".,!?;:'\"()-"

  /** Punctuation ratio: punctuation chars / total chars (0 for empty). */
  def punctRatio(c: Column): Column = {
    val total = length(c)
    val noPunct = length(translate(c, punctChars, ""))
    when(total === 0, lit(0.0)).otherwise((total - noPunct).cast("double") / total)
  }

  /** Mean word length over whitespace tokens (0 for blank). */
  def meanWordLen(c: Column): Column = {
    val toks = split(trim(c), "\\s+")
    when(length(trim(c)) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** English stopword ratio among whitespace tokens — a standard
    * quality-scoring feature (Gopher/C4-style heuristics). */
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "that", "this", "it", "as", "be", "at", "by")

  def stopwordRatio(c: Column): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val sw = array(englishStopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(sw, t)))
    when(length(trim(c)) === 0, lit(0.0))
      .otherwise(nStop.cast("double") / size(toks))
  }

  /** Composite quality features as a struct-per-document projection. */
  def qualityFeatures(c: Column): Seq[(String, Column)] = Seq(
    "n_chars_q"   -> length(c).cast("bigint"),
    "n_tokens"    -> tokenCount(c).cast("bigint"),
    "mean_wlen"   -> round(meanWordLen(c), 4),
    "punct_ratio" -> round(punctRatio(c), 4),
    "stopword_ratio" -> round(stopwordRatio(c), 4))

  /** Language-ID profiles: small high-frequency stopword sets per language
    * (n-gram-heuristic style). A text votes for the language whose profile
    * words it contains most of; ties break alphabetically. CJK-range
    * characters short-circuit to "zh". */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "avec"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "una", "con", "para", "por"))

  /** Heuristic language-ID over whitespace-tokenized lowercase text. */
  def langId(c: Column): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val prof = array(words.map(lit): _*)
      lang -> size(array_intersect(toks, prof))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(pick)
  }

  /** Document fingerprint: 128-bit content hash of the normalized text
    * (rolling-hash-class dedup key). `md5` keeps it oracle-comparable;
    * [[fingerprint64]] is the cheap engine-side variant. */
  def fingerprint(c: Column): Column = md5(lower(trim(c)))
  def fingerprint64(c: Column): Column = xxhash64(lower(trim(c)))

  /** F20 (stubbed): text → fixed-dim embedding. The reference embeds text
    * columns with GloVe sentence vectors (ctu_dataset.py:43-52); a real
    * deployment broadcasts an embedding table and joins it per token. Here
    * the per-token vector is a deterministic hash-derived stand-in (no
    * embedding weights ship in this container) and the SENTENCE COMBINATOR
    * — tokenize, embed per token, elementwise-average — is the real,
    * tested Spark plumbing: swap `tokenVec` for a broadcast-table lookup
    * and nothing else changes. */
  def embedTextStub(c: Column, dim: Int): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val tokenVec = (t: Column) => transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(t, i), lit(1000L)).cast("double") / 500.0) - 1.0)
    val sum = aggregate(toks,
      transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0)),
      (acc, t) => zip_with(acc, tokenVec(t), (a, b) => a + b))
    // split("") yields [""], so blank-guard on the trimmed length like
    // tokenCount, not on size(toks)
    when(length(trim(c)) === 0, transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0)))
      .otherwise(transform(sum, x => x / size(toks)))
  }

  /** F20 (real path): table-driven text embedding — tokenize, look each
    * token up in a broadcast (token → vec) embedding table, and average the
    * matched vectors per document, exactly the reference's GloVe sentence
    * embedding (ctu_dataset.py:43-52: mean of per-token vectors).
    *
    * Scale shape: the embedding table (GloVe ≈ 400k rows) broadcasts; the
    * corpus explodes to (doc, token) pairs map-side, the broadcast-hash
    * join never shuffles the corpus, and the per-document mean reduces
    * through the partial-aggregating vector UDAF — one corpus-sized shuffle
    * of (doc_id, partial-sum) buffers total. Out-of-vocabulary tokens are
    * skipped (GloVe convention); documents with no matched token get the
    * zero vector.
    */
  def embedWithTable(docs: DataFrame, idCol: String, textCol: String,
      embeddings: DataFrame, tokenCol: String, vecCol: String, dim: Int): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0) // split("") yields [""]
    val table = broadcast(
      embeddings.select(col(tokenCol).as("__tok"), col(vecCol).as("__vec")))
    val means = toks.join(table, "__tok")
      .groupBy(col(idCol))
      .agg(graft.agg.VectorAgg.vecMean(col("__vec")).as("__e"))
    val zero = array(Seq.fill(dim)(lit(0.0)): _*)
    docs.select(col(idCol))
      .join(means, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__e"), zero).as("embedding"))
  }

  /** GloVe-format embedding loader — the file the reference feeds its text
    * encoder (ctu_dataset.py:43-52 loads `glove.6B.50d.txt`): one line per
    * token, `token v1 v2 … vd` space-separated, no header. Parsed with pure
    * expressions over a distributed text scan (a 400k-line GloVe file is a
    * single-split read; a multi-TB embedding dump parallelizes for free)
    * into the (token, vec) DataFrame [[embedWithTable]] consumes.
    *
    * Malformed input fails loudly per row via `raise_error` — a wrong
    * field count or a non-numeric component means the wrong `dim` was
    * passed or the file is corrupt, and silently skipping rows would skew
    * every downstream sentence embedding. */
  def loadGloVe(spark: SparkSession, path: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val parts = split(col("value"), " ")
    val vec = transform(slice(parts, 2, dim), x => x.cast("double"))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // GloVe files may end with \n
      .select(
        when(size(parts) === dim + 1, element_at(parts, 1))
          .otherwise(raise_error(concat(
            lit(s"GloVe line must have ${dim + 1} space-separated fields, got "),
            size(parts).cast("string"), lit(": "),
            substring(col("value"), 1, 80)))).as("token"),
        when(forall(vec, _.isNotNull), vec)
          .otherwise(raise_error(concat(
            lit("non-numeric vector component in GloVe line: "),
            substring(col("value"), 1, 80)))).as("vec"))
  }

  /** Per-document sentence segmentation stats: segments split on
    * `[.!?]+` runs (RE2-safe — no lookbehind, so the same pattern runs on
    * any regex engine), blank segments dropped; reports sentence count
    * and mean whitespace-token count per sentence. Row-local array
    * expressions only — stays inside the corpus scan. */
  def sentenceStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val segs = filter(
      transform(split(col(textCol), "[.!?]+"), s => trim(s)),
      s => length(s) > 0)
    val tokCounts = transform(segs, s => size(split(s, "\\s+")))
    // NULL text → NULL stats, stated explicitly: size() on a NULL array is
    // config-dependent (-1 under the legacy flag), never silently baked in
    docs.select(col(idCol), segs.as("__s"), tokCounts.as("__t"))
      .select(col(idCol),
        when(col("__s").isNull, lit(null).cast("bigint"))
          .otherwise(size(col("__s")).cast("bigint")).as("n_sentences"),
        when(col("__s").isNull, lit(null).cast("double"))
          .when(size(col("__s")) === 0, lit(0.0))
          .otherwise(
            aggregate(col("__t"), lit(0L), (acc, x) => acc + x).cast("double")
              / size(col("__s"))).as("avg_sentence_tokens"))
  }

  /** Within-document repeated-sentence removal — the line/paragraph-dedup
    * cleaning pass of web-text curation (boilerplate sentences repeat
    * inside a page; downstream near-dup and LM-quality signals all skew
    * if they stay). Keeps the FIRST occurrence of each distinct sentence
    * in order via a row-local membership fold — O(s²) in the per-document
    * sentence count, which is a per-row constant, never corpus-scaled;
    * the whole operator stays inside the scan. Same `[.!?]+` RE2-safe
    * segmentation and NULL-in/NULL-out contract as [[sentenceStats]].
    *
    * @return (id, n_sentences, n_unique, text_clean) */
  def dedupSentences(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val segs = filter(
      transform(split(col(textCol), "[.!?]+"), s => trim(s)),
      s => length(s) > 0)
    val uniq = aggregate(segs, array().cast("array<string>"),
      (acc, s) => when(array_contains(acc, s), acc)
        .otherwise(concat(acc, array(s))))
    docs.select(col(idCol), segs.as("__s"), uniq.as("__u"))
      .select(col(idCol),
        when(col("__s").isNull, lit(null).cast("bigint"))
          .otherwise(size(col("__s")).cast("bigint")).as("n_sentences"),
        when(col("__s").isNull, lit(null).cast("bigint"))
          .otherwise(size(col("__u")).cast("bigint")).as("n_unique"),
        when(col("__s").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(". ", col("__u"))).as("text_clean"))
  }

  /** Zipf-law fit over the corpus vocabulary — the distributional sanity
    * check of corpus curation (natural text has log-freq vs log-rank slope
    * near −1; a synthetic or template-heavy corpus drifts far from it):
    * rank the top `topN` terms by frequency (term tiebreak), regress
    * `ln(freq)` on `ln(rank)` by least squares, report slope + intercept.
    * One tokenize-and-count aggregation, a distributed top-N (per-partition
    * pre-cut + range-sort rank, [[graft.functions.DistributedRank.topK]] —
    * no single-partition window however large the raw vocabulary), and a
    * 5-sum reduce — the regression itself is closed-form expression
    * arithmetic over the sums (the same device as the bp2 normal
    * equations), no driver-side math beyond the final row. */
  def zipfSlope(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 2, s"need at least two ranked terms, got $topN")
    val toks = docs.select(
      explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
    val counts = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val ranked = graft.functions.DistributedRank
      .topK(counts, Seq(col("__c").desc, col("__tok")), "__r", topN)
      .select(log(col("__r")).as("__x"), log(col("__c")).as("__y"))
    val s = ranked.agg(
      count(lit(1)).cast("double").as("n"), sum(col("__x")).as("sx"),
      sum(col("__y")).as("sy"), sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__x") * col("__x")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    s.select(col("n").cast("long").as("n_terms"),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
  }

  /** Gopher-style repetition signals per document: duplicate-word fraction
    * (1 − distinct/total tokens), top-word dominance (most frequent token's
    * share), and duplicate-bigram fraction — the standard "repetitious
    * document" quality filters for LLM corpus curation.
    *
    * Token/bigram distinct counts are row-local array expressions (stay in
    * the corpus scan); only the top-word count needs a real aggregation,
    * done as explode → groupBy(doc, term) → groupBy(doc) max — two
    * partial-aggregating shuffles keyed by doc, no row-local O(n·u) scan,
    * so a single pathological 10k-token document can't stall its task. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val base = docs.select(col(idCol), toks.as("__w"))
    val bigrams = transform(sequence(lit(1), size(col("__w")) - 1),
      i => concat_ws(" ", element_at(col("__w"), i), element_at(col("__w"), i + 1)))
    // NULL text -> NULL stats throughout: with ANSI off, size(NULL) is -1
    // (not NULL), which would silently yield "-1 tokens, 0.0 fractions"
    val hasText = col("__w").isNotNull
    val perDoc = base.select(
      col(idCol),
      when(hasText, size(col("__w"))).cast("bigint").as("n_tok"),
      when(hasText, size(array_distinct(col("__w")))).cast("bigint").as("n_uniq"),
      when(hasText && size(col("__w")) >= 2,
        size(array_distinct(bigrams))).cast("bigint").as("__uniq2"))
    val top = base.select(col(idCol), explode(col("__w")).as("__tk"))
      .groupBy(col(idCol), col("__tk")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("__mc"))
    // left join: NULL-text docs have no exploded tokens and would vanish
    // from an inner join — they must stay in the output (with NULL stats)
    // so callers can use this output as their filter universe
    perDoc.join(top, Seq(idCol), "left").select(
      col(idCol), col("n_tok"), col("n_uniq"),
      round(lit(1.0) - col("n_uniq") / col("n_tok").cast("double"), 4).as("dup_word_frac"),
      round(col("__mc") / col("n_tok").cast("double"), 4).as("top_word_frac"),
      round(lit(1.0) - col("__uniq2") / (col("n_tok") - 1).cast("double"), 4)
        .as("dup_bigram_frac"))
  }

  /** Top-k terms per document by TF-IDF (tf · ln((N+1)/(df+1)), the
    * smoothed-idf convention): explode to (doc, term), one groupBy for tf,
    * one distinct+groupBy for df, N via a broadcast 1-row aggregate (never
    * a driver collect), rank with a per-doc window. Ties rank by term so
    * output is total-ordered. All shuffles key on doc or term — the corpus
    * is never joined against itself. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val idf = toks.select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(idf, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log((col("__n") + lit(1)) / (col("df") + lit(1.0))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        round(col("score"), 4).as("score"), col("rk"))
  }

  /** BM25 document scores for a fixed query term set — the classic
    * retrieval ranking (idf · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen)),
    * idf = ln(1 + (N−df+0.5)/(df+0.5))). One explode pass computes tf and
    * doc lengths; df and avg length are tiny broadcast aggregates; the
    * score sum groups by doc — every shuffle keys on doc or term, and only
    * tokens matching the query survive the first filter, so the scored
    * intermediate is |query|-bounded per doc. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val q = array(queryTerms.distinct.map(t => lit(t.toLowerCase)): _*)
    val toks = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val lens = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val avgdl = lens.agg(avg(col("dl").cast("double")).as("avgdl"))
    val n = docs.agg(count(lit(1)).as("n"))
    val qtoks = toks.filter(array_contains(q, col("term")))
    val tf = qtoks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = qtoks.select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(dfreq, "term")
      .join(lens, idCol)
      .crossJoin(broadcast(n)).crossJoin(broadcast(avgdl))
      .withColumn("__s", idf * tfNorm)
      .groupBy(col(idCol)).agg(sum(col("__s")).as("bm25"))
  }

  /** Benchmark-contamination check: per corpus document, the fraction of
    * its distinct word n-gram shingles that appear anywhere in `benchmark`
    * (an eval set that must not leak into training data). The benchmark
    * shingle set is orders of magnitude smaller than the corpus, so it
    * broadcasts — the corpus side stays a scan + one aggregation, no
    * corpus-sized shuffle join. Documents with NULL text survive with NULL
    * stats (left join back), matching [[repetitionStats]]'s contract.
    * Shingling matches [[graft.dedup.Dedup.wordShingles]] (short texts fall
    * back to one whole-text shingle). */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    // NULL text must NOT shingle (concat_ws would fold it to [""]); those
    // docs re-enter with NULL stats via the final left join
    val docSh = corpus.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(graft.dedup.Dedup.wordShingles(col(textCol), n)).as("__sh"))
    val benchSh = benchmark.filter(col(textCol).isNotNull)
      .select(explode(graft.dedup.Dedup.wordShingles(col(textCol), n)).as("__sh"))
      .distinct().withColumn("__hit", lit(1))
    val perDoc = docSh.join(broadcast(benchSh), Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
    corpus.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"), col("n_hit"),
        round(col("n_hit") / col("n_shingles"), 4).as("contaminated_frac"))
  }

  /** Cross-source contamination matrix — [[contamination]]'s corpus-wide
    * form: for every source PAIR, how many distinct word-shingles they
    * share and what fraction of the smaller source that is (containment,
    * the leakage direction that matters — a small eval set fully inside a
    * big crawl shows 1.0 here but a tiny Jaccard). The self-join runs on
    * the DISTINCT (source, shingle) set, so candidates per shingle are
    * bounded by the number of sources (a corpus-level constant, never
    * data-sized); two key-shuffles total.
    *
    * @return (source_a, source_b, n_shared, overlap_frac), a < b */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // Spread.wide: shingle build + explode run pre-exchange
    val sh = graft.util.Spread.wide(docs.filter(col(textCol).isNotNull))
      .select(col(srcCol).as("__src"),
        explode(graft.dedup.Dedup.wordShingles(col(textCol), n)).as("__sh"))
      .distinct()
    val sizes = sh.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.__sh") === col("b.__sh") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"), col("b.__src").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("__src").as("source_a"), col("__n").as("__na")),
        "source_a")
      .join(sizes.select(col("__src").as("source_b"), col("__n").as("__nb")),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared").cast("double") / least(col("__na"), col("__nb")), 6)
          .as("overlap_frac"))
  }

  /** Keyed pseudonymization: replace identifier columns with
    * `sha2(salt:value)` digests — referentially CONSISTENT (the same
    * value hashes identically everywhere, so joins still work across
    * pseudonymized tables) yet irreversible without the salt; rotating
    * the salt severs all linkage at once (the crypto-shredding lever).
    * The privacy sibling of [[piiScan]]: scan redacts free text, this
    * de-identifies structured keys. Pure per-row expressions, NULLs stay
    * NULL. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      when(col(c).isNotNull,
        sha2(concat_ws(":", lit(salt), col(c).cast("string")), 256))))
  }

  /** Intra-corpus boilerplate score: the fraction of a document's distinct
    * n-gram shingles that also occur in at least one OTHER document — high
    * values flag templated/navigational text (the complement of novelty;
    * [[contamination]] is the same shape against an external benchmark).
    * Since per-doc shingles are distinct, a shingle's document frequency
    * IS its occurrence count, so one groupBy over the inverted index and
    * one join back suffice — exchange bounded by distinct (doc, shingle)
    * pairs. NULL-text docs survive with NULL stats (the
    * [[repetitionStats]] contract). */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val docSh = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(graft.dedup.Dedup.wordShingles(col(textCol), n)).as("__sh"))
    val freq = docSh.groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
    val perDoc = docSh.join(freq, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_shared"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        round(col("n_shared") / col("n_shingles"), 4).as("boilerplate_frac"))
  }

  /** Per-document character-distribution entropy in nats — the classic
    * gibberish/boilerplate signal (natural prose sits in a narrow band;
    * repeated padding scores low, random noise high). Computed as
    * H = ln N − (Σ n·ln n)/N over per-character counts, so only exact
    * integer counts feed the logs (cross-engine-stable at 4 decimals).
    * Shuffles (id, char) count pairs only — map-side combine bounds the
    * exchange at docs × alphabet, never corpus character volume. Empty
    * and NULL documents are excluded. */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), explode(split(col(textCol), "")).as("__c"))
      .filter(col("__c") =!= "") // Java split keeps a trailing "" under limit -1
    chars.groupBy(col(idCol), col("__c")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("__N"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("__n") * log(col("__n"))).as("__nl"))
      .select(col(idCol),
        col("__N").cast("bigint").as("n_chars_seen"),
        col("n_distinct_chars"),
        round(log(col("__N")) - col("__nl") / col("__N"), 4).as("entropy"))
  }

  /** Email pattern shared by [[piiScan]] — RE2-compatible (no lookaround),
    * so the same pattern string runs under Java regex and DuckDB/RE2. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (word-anchored; no range check — a scrubber
    * over-matches rather than leaks). */
  val Ipv4Pattern: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** International-ish hyphenated phone: +CC-XXX-XXX[-XXXX]. */
  val PhonePattern: String = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(?:-[0-9]{4})?"

  /** PII scrubbing pass for pretraining corpora: count and redact emails,
    * IPv4 addresses and hyphenated phone numbers in one scan. Pure per-row
    * regex work — zero shuffles at any corpus size, and the patterns are
    * RE2-safe so the exact same scrub restates on any engine. Redaction
    * order is emails → IPs → phones (the patterns are mutually exclusive
    * by construction: `@`, dots, leading `+`). NULL text stays NULL in
    * every output column, the [[repetitionStats]] contract. */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    docs.select(col(idCol),
      regexp_count(c, lit(EmailPattern)).cast("bigint").as("n_emails"),
      regexp_count(c, lit(Ipv4Pattern)).cast("bigint").as("n_ips"),
      regexp_count(c, lit(PhonePattern)).cast("bigint").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(c, EmailPattern, "[EMAIL]"),
          Ipv4Pattern, "[IP]"),
        PhonePattern, "[PHONE]").as("redacted"))
  }

  /** fastText-style hashed-feature linear scorer — the classic cheap
    * quality filter for pretraining corpora (a trained linear model over
    * hashed token buckets, applied corpus-wide; cf. the CCNet/fastText
    * filtering recipe). Each token hashes to `weights.size` buckets via a
    * PORTABLE hash (the first 7 hex chars of md5, mod nBuckets — any
    * engine can recompute it), the document score is the weight sum plus
    * bias, `keep` thresholds at 0. INTEGER weights by contract: the score
    * stays exact under any aggregation order, so outputs are
    * engine-reproducible bit-for-bit (no float-sum hazard). One explode +
    * one groupBy(id) — map-side partial sums, no join (the weight table
    * rides along as a literal array, never shuffled or broadcast).
    * Scale shape: linear in corpus tokens, the same contract as t1. */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Long], bias: Long = 0L): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val nB = weights.size
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("__t"))
    val bucket = pmod(conv(substring(md5(col("__t")), 1, 7), 16, 10).cast("long"), lit(nB))
    val w = element_at(typedLit(weights), (bucket + 1).cast("int"))
    toks.select(col(idCol), w.as("__w"))
      .groupBy(col(idCol))
      .agg((sum(col("__w")) + lit(bias)).as("score"),
        count(lit(1)).as("n_tokens"))
      .withColumn("keep", col("score") >= 0)
  }

  /** Project a documents DataFrame to per-document analysis columns. */
  def analyze(docs: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val withQ = qualityFeatures(c).foldLeft(docs) { case (df, (n, e)) => df.withColumn(n, e) }
    withQ
      .withColumn("lang_pred", langId(c))
      .withColumn("fingerprint", fingerprint(c))
  }
}
