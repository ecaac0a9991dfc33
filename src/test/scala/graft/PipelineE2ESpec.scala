package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sample.Sampling
import graft.text.TextAnalysis

/** The LLM-corpus curation flow end-to-end on the real documents table:
  * near-dup pair generation → cluster collapse → one representative per
  * cluster → repetition/quality filter → leakage-free group split →
  * TF-IDF features on the training half. Each stage is oracle-checked
  * individually (d3, d6, t5, w8, t6); this spec pins the COMPOSITION —
  * stages consume exactly what the previous stage emits, and the global
  * invariants (no near-dup pair survives, no split leakage) hold on the
  * composed output.
  */
class PipelineE2ESpec extends SparkSpec {

  test("dedup -> cluster -> filter -> split -> features composes") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val n = docs.count()

    // 1. near-dup pairs + clusters, keep one representative per cluster
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    val clusters = Dedup.dupClusters(docs, "doc_id", pairs)
    val keep = clusters.filter(col("doc_id") === col("rep")).select("doc_id")
    val deduped = docs.join(keep, "doc_id")
    val nDeduped = deduped.count()
    assert(nDeduped <= n && nDeduped > 0)

    // no surviving pair: both ends of a near-dup pair can't be kept
    val survivors = pairs
      .join(keep.withColumnRenamed("doc_id", "id1"), "id1")
      .join(keep.withColumnRenamed("doc_id", "id2"), "id2")
    assert(survivors.isEmpty)

    // 2. repetition/quality gate
    val stats = TextAnalysis.repetitionStats(deduped, "doc_id", "text")
    val clean = deduped.join(
      stats.filter(col("top_word_frac") <= 0.5).select("doc_id"), "doc_id")
    assert(clean.count() > 0)

    // 3. leakage-free split by source (the grouping entity)
    val split = Sampling.groupSplit(clean, "source")
    val mixed = split.groupBy("source")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1)
    assert(mixed.isEmpty)

    // 4. features on the train half only
    val train = split.filter(col("split") === "train")
    if (train.count() > 0) {
      val feats = TextAnalysis.tfidfTopK(train, "doc_id", "text", k = 3)
      assert(feats.count() > 0)
      assert(feats.select("doc_id").distinct().count() == train.count())
    }
  }

  test("scrub -> mix -> encode -> pack: the pretraining prep flow composes") {
    import graft.text.Chunker
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")

    // 1. PII scrub — redacted text feeds everything downstream
    val scrubbed = TextAnalysis.piiScan(docs, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))
      .join(docs.select("doc_id", "lang", "source"), "doc_id")

    // 2. temperature-flattened source mixing at half budget
    val mixed = Sampling.temperatureMix(scrubbed, "source", "doc_id", 0.5)
    val nMixed = mixed.count()
    assert(nMixed > 0 && nMixed < docs.count())

    // 3. tokenizer encode against a corpus-derived vocab
    val vocab = Chunker.topKVocab(mixed, "text", 30)
    val encoded = Chunker.encodeTokens(mixed, "doc_id", "text", vocab, "token", "tid")
    assert(encoded.count() == nMixed)

    // 4. greedy sequence packing per language
    val packed = Chunker.packGreedy(mixed, "doc_id", "text", 64, "lang")
    assert(packed.count() == nMixed)
    // packing invariant: within a bucket, offsets are consistent with
    // token counts — every doc starts inside its assigned sequence
    assert(packed.filter(col("seq_offset") < 0 || col("seq_offset") >= 64).isEmpty)
    // encode/pack agree on every doc's token count (same tokenization)
    val disagree = encoded.select(col("doc_id"), col("n_tokens").as("a"))
      .join(packed.select(col("doc_id"), col("n_tokens").as("b")), "doc_id")
      .filter(col("a") =!= col("b"))
    assert(disagree.isEmpty)
  }

  test("train-inside-the-pipeline: the logistic filter fit is deterministic and moves off zero") {
    import graft.pipeline.Blueprint
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .filter(col("text").isNotNull)
    val feats = docs.select(
      array(TextAnalysis.tokenCount(col("text")).cast("double") / 100.0,
        TextAnalysis.punctRatio(col("text"))).as("feat"),
      (col("lang") === "en").cast("double").as("y"))
    val (w1, b1) = Blueprint.fitLogisticGD(feats, "feat", "y", dim = 2, steps = 2, lr = 0.5)
    val (w2, b2) = Blueprint.fitLogisticGD(feats, "feat", "y", dim = 2, steps = 2, lr = 0.5)
    assert(w1.toSeq == w2.toSeq && b1 == b2,
      "refitting on the same data must give bit-identical parameters")
    assert(w1.exists(_ != 0.0) && b1 != 0.0,
      "two GD steps must move every parameter off the zero init")
    // applying frozen weights is a pure projection: scores in (0,1)
    val margin = element_at(col("feat"), 1) * lit(w1(0)) +
      element_at(col("feat"), 2) * lit(w1(1)) + lit(b1)
    val score = lit(1.0) / (lit(1.0) + exp(-margin))
    assert(feats.select(score.as("s"))
      .filter(col("s") <= 0.0 || col("s") >= 1.0).isEmpty)
  }
}
