package graft.joins

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("editDistanceJoin: length-banded candidates reproduce the naive join") {
    val left = Seq((1L, "kitten"), (2L, "flaw"), (3L, null: String))
      .toDF("id", "name")
    val right = Seq((10L, "sitten"), (11L, "kitte"), (12L, "kittens"),
      (13L, "flaws"), (14L, "lawn"), (15L, "unrelated")).toDF("id", "name")
    val out = FuzzyJoin.editDistanceJoin(left, "id", right, "id", "name", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(
      (1L, 10L, 1), // substitution
      (1L, 11L, 1), // deletion
      (1L, 12L, 1), // insertion
      (2L, 13L, 1)))
    // "lawn" is 2 edits from "flaw" (band admits it, verify rejects);
    // NULL text produces no pairs

    // exactness vs the naive quadratic join at maxDist 2
    val naive = left.filter(col("name").isNotNull).as("a")
      .crossJoin(right.as("b"))
      .withColumn("d", levenshtein(col("a.name"), col("b.name")))
      .filter(col("d") <= 2)
      .select(col("a.id"), col("b.id"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = FuzzyJoin.editDistanceJoin(left, "id", right, "id", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == naive)
  }
}
