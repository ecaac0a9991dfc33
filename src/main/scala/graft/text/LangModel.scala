package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the classic
  * perplexity-style quality filter for pretraining data (score each
  * document by how surprising it is under a model of the corpus itself;
  * boilerplate and spam sit at the extremes). The model is plain
  * aggregation, so the whole pipeline is DuckDB-restatable and
  * oracle-checked. (Beyond the reference's own surface — LLM-pipeline
  * operator family.)
  */
object LangModel {

  /** Per-document mean bigram surprisal −ln P(w᾿|w) under an add-k
    * smoothed bigram model trained on the whole corpus:
    * P(w᾿|w) = (C(w,w᾿)+k) / (C(w,·)+k·V), V = corpus vocabulary size.
    *
    * Shape at scale: the bigram stream shuffles once per model count
    * (grouped on (w1,w2) and w1 — both vocabulary-bounded outputs), V is
    * a 1-row broadcast aggregate, and scoring joins the stream against
    * the vocab²-bounded model (AQE broadcasts it; a Zipfian real-corpus
    * model is MB-scale). No corpus-sized state ever sits on the driver.
    * Documents with fewer than two tokens have no bigrams and are
    * excluded (on both engine and oracle side, by construction). */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val base = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__w"))
      .filter(size(col("__w")) >= 2)
    val bigrams = base.select(col(idCol), explode(
        zip_with(
          slice(col("__w"), lit(1), size(col("__w")) - 1),
          slice(col("__w"), lit(2), size(col("__w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = base.select(explode(col("__w")).as("__t"))
      .agg(count_distinct(col("__t")).as("v"))
    bigrams
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        (-log((col("c12") + k) / (col("c1") + lit(k) * col("v")))).as("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__s")), 4).as("surprisal"))
  }
}
