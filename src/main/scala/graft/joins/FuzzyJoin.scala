package graft.joins

import org.apache.spark.sql.DataFrame
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
}
