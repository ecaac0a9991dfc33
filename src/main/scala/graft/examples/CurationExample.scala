package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sample.Sampling
import graft.text.{Chunker, TextAnalysis}

/** Runnable end-to-end LLM-corpus curation example — the pipeline a
  * pretraining-data team runs, composed entirely from this engine's
  * operators (each individually oracle-gated in `SparkEntry`):
  *
  *  1. quality + language scoring (pure expressions in the corpus scan)
  *  2. exact dedup on the normalized fingerprint
  *  3. mix rebalancing: temperature down-sampling of the dominant
  *     language, fractional epoch UP-sampling of rare ones
  *  4. BPE vocabulary training on the surviving corpus + segmentation
  *  5. sequence packing into fixed-capacity training rows
  *
  * {{{
  * sbt "runMain graft.examples.CurationExample /root/testdata/sf0.001"
  * }}}
  */
object CurationExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"corpus: ${docs.count()} documents")

    // 1. score, then gate on cheap row-local quality signals
    val scored = TextAnalysis.qualityFeatures(col("text"))
      .foldLeft(docs) { case (df, (name, c)) => df.withColumn(name, c) }
      .withColumn("lang_guess", TextAnalysis.langId(col("text")))
    val kept = scored.filter(col("n_tokens") >= 3)
    println(s"after quality gate: ${kept.count()}")

    // 2. exact dedup on the normalized fingerprint
    val deduped = Dedup.exactDedup(kept, "doc_id", "text")
    println(s"after exact dedup: ${deduped.count()}")

    // 3. rebalance the language mix: flatten the head, repeat the tail
    val flattened = Sampling.temperatureMix(deduped, "lang", "doc_id",
      targetFraction = 0.9)
    val mixed = Sampling.upsample(flattened, "lang", "doc_id",
      Map("fr" -> 2.0, "de" -> 1.5))
    // limit-guarded: the language mix is small by construction, but a
    // driver collect should never be unbounded on principle.
    mixed.groupBy("lang").count().orderBy("lang").limit(100).collect()
      .foreach(r => println(s"  mix ${r.getString(0)}: ${r.getLong(1)}"))

    // 4. BPE: learn merges on the mixed corpus, segment every document
    val merges = Chunker.trainBpe(mixed, "text", nMerges = 20)
    println(s"learned ${merges.size} BPE merges; top 5: " +
      merges.take(5).map { case (a, b, c) => s"$a+$b($c)" }.mkString(", "))
    val segmented = Chunker.applyBpe(
      mixed.select(col("doc_id"), col("copy_id"), col("text"))
        .withColumn("doc_id", col("doc_id") * 10 + col("copy_id")),
      "doc_id", "text", merges)
    val avgSub = segmented.agg(avg(size(col("subwords")))).head().getDouble(0)
    println(f"segmented: avg $avgSub%.1f subwords/doc")

    // 5. pack into fixed-capacity training rows
    val packed = Chunker.packGreedy(
      mixed.withColumn("doc_id", col("doc_id") * 10 + col("copy_id")),
      "doc_id", "text", capacity = 128, bucketCol = "lang")
    val nPacks = packed.select("lang", "seq_id").distinct().count()
    println(s"packed into $nPacks training rows of capacity 128")
    spark.stop()
  }
}
