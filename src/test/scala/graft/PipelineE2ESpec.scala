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
}
