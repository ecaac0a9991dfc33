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

  test("editDistanceJoinFastSS is bit-identical to the banded join, k=1 and 2") {
    val rnd = new scala.util.Random(41)
    // constant-width ID-style strings — the length histogram is ONE band
    // (the degenerate case FastSS exists for) — plus a few ragged extras
    val base = (0 until 120).map(i => (i.toLong, f"Supplier#${rnd.nextInt(300)}%04d"))
    val ragged = Seq((200L, ""), (201L, "S"), (202L, "Supplier#"),
      (203L, null: String))
    val df = (base ++ ragged).toDF("id", "name")
    for (k <- 1 to 2) {
      val banded = FuzzyJoin.editDistanceJoin(df, "id", df, "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val fastss = FuzzyJoin.editDistanceJoinFastSS(df, "id", df, "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(fastss == banded, s"k=$k: ${fastss.size} vs ${banded.size}")
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoinFastSS(df, "id", df, "id", "name", 3)
    }
  }

  test("FastSS agrees with naive levenshtein on supplementary-plane unicode") {
    // emoji are surrogate PAIRS in UTF-16: if length/substr counted code
    // units while levenshtein counted code points, the variant arithmetic
    // would slice half a character and the blocking would silently lose
    // pairs — all three are code-point based, asserted here
    val df = Seq((1L, "ab😀cd"), (2L, "abcd"), (3L, "ab😀c"),
      (4L, "😀😁"), (5L, "😀😂"), (6L, "😀😁x")).toDF("id", "name")
    val naive = df.as("a").crossJoin(df.as("b"))
      .withColumn("d", levenshtein(col("a.name"), col("b.name")))
      .filter(col("d") <= 1 && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fast = FuzzyJoin.editDistanceJoinFastSS(df, "id", df, "id", "name", 1)
      .filter(col("id1") < col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fast == naive, s"fastss=$fast naive=$naive")
    assert(naive.contains((1L, 3L, 1)) && naive.contains((4L, 5L, 1)))
  }

  test("deletionVariants: exact neighborhood for small strings") {
    val out = Seq(Tuple1("abc")).toDF("t")
      .select(FuzzyJoin.deletionVariants(col("t"), 1).as("v"))
      .collect()(0).getSeq[String](0).toSet
    assert(out == Set("abc", "bc", "ac", "ab"))
    val k2 = Seq(Tuple1("abc")).toDF("t")
      .select(FuzzyJoin.deletionVariants(col("t"), 2).as("v"))
      .collect()(0).getSeq[String](0).toSet
    assert(k2 == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    val empty = Seq(Tuple1("")).toDF("t")
      .select(FuzzyJoin.deletionVariants(col("t"), 2).as("v"))
      .collect()(0).getSeq[String](0).toSet
    assert(empty == Set(""))
  }
}
