package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution): pairs whose edit distance is
  * within a bound, with candidate generation that is provably a superset
  * of the answer — never an unfiltered cross product.
  *
  * Candidates: `|len(a) − len(b)| > k ⇒ levenshtein(a, b) > k`, so each
  * left row replicates to its 2k+1 admissible length bands and equi-joins
  * on exact length — candidate volume is bounded by the length-histogram
  * overlap, and the join shuffles on an integer key. Verification uses
  * Spark's thresholded `levenshtein(l, r, k)` (early-exit O(k·len) per
  * pair, returns −1 past the bound) so even same-length-heavy corpora
  * (constant-width ID strings) verify cheaply. At 100 TB add a sound
  * second blocking key (q-gram count signature) in front — the shape
  * stays replicate → equi-join → verify.
  */
object FuzzyJoin {

  /** All (id1, id2, dist) with `levenshtein ≤ maxDist`, NULL texts
    * dropped (no distance is defined). Self-join callers filter
    * `id1 < id2` downstream. */
  def editDistanceJoin(left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val l = left.filter(col(textCol).isNotNull)
      .select(col(leftId).as("id1"), col(textCol).as("__t1"),
        explode(sequence(length(col(textCol)) - maxDist,
          length(col(textCol)) + maxDist)).as("__len"))
    val r = right.filter(col(textCol).isNotNull)
      .select(col(rightId).as("id2"), col(textCol).as("__t2"),
        length(col(textCol)).as("__len"))
    l.join(r, "__len")
      .withColumn("dist", levenshtein(col("__t1"), col("__t2"), maxDist))
      .filter(col("dist") >= 0) // thresholded form returns -1 past the bound
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** All deletion variants of `text` up to `k` character deletions,
    * including the string itself — the FastSS blocking key (Bocek et al.
    * 2007, "Fast Similarity Search in Large Dictionaries"). Soundness:
    * an edit script of cost ≤ k touches ≤ k positions in each string;
    * deleting the touched positions from both yields the SAME string, so
    * any pair within edit distance k shares at least one variant. Built
    * entirely from codegen'd collection expressions (transform/sequence/
    * flatten/array_distinct) — no UDF. Variant count is O(len^k) per
    * row, so keep k small (the require below) — that is also the regime
    * where the device beats banding. */
  private[joins] def deletionVariants(text: Column, k: Int): Column = {
    require(k >= 0 && k <= 2,
      s"deletion neighborhood is O(len^k) per row; k=$k not supported (use <= 2, " +
        "or the length-banded editDistanceJoin for larger bounds)")
    def dels(v: Column): Column =
      when(length(v) > lit(0),
        transform(sequence(lit(1), length(v)), j =>
          concat(v.substr(lit(1), j - lit(1)),
            v.substr(j + lit(1), length(v) - j))))
        .otherwise(array().cast("array<string>"))
    var levels = List(array(text))
    var cur: Column = array(text)
    (1 to k).foreach { _ =>
      cur = array_distinct(flatten(transform(cur, dels(_))))
      levels = cur :: levels
    }
    array_distinct(concat(levels.reverse: _*))
  }

  /** [[editDistanceJoin]] with FastSS deletion-neighborhood blocking —
    * the scale path when the length histogram is degenerate (constant-
    * width ID/name strings put EVERY row in one band, and in-band pairs
    * grow quadratically: the fz1 sf1 sweep measured exactly that).
    * Candidates are pairs sharing a deletion variant: each side explodes
    * to ~len^k variants (k=1: len+1 — cheap), the join is an equi-join
    * on the variant string, and near-identical strings collide while
    * merely same-length strings do not — candidate volume tracks the
    * TRUE near-pair count, not the length histogram. Verification is the
    * same thresholded levenshtein, so the output is bit-identical to
    * [[editDistanceJoin]]. */
  def editDistanceJoinFastSS(left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"FastSS blocking needs 1 <= maxDist <= 2, got $maxDist " +
        "(use editDistanceJoin outside that range)")
    val l = left.filter(col(textCol).isNotNull)
      .select(col(leftId).as("id1"), col(textCol).as("__t1"),
        explode(deletionVariants(col(textCol), maxDist)).as("__v"))
    val r = right.filter(col(textCol).isNotNull)
      .select(col(rightId).as("id2"), col(textCol).as("__t2"),
        explode(deletionVariants(col(textCol), maxDist)).as("__v"))
    l.join(r, "__v")
      .select(col("id1"), col("__t1"), col("id2"), col("__t2")).distinct()
      .withColumn("dist", levenshtein(col("__t1"), col("__t2"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
