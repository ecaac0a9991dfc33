package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("slidingChunks: overlapping windows cover every token, tail emitted once") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = Chunker.slidingChunks(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    // starts 1, 4, 7 (start ≤ len − overlap = 9); start 10 would repeat "j"
    assert(out.toSeq == Seq(
      (1L, 4L, "a b c d"), (2L, 4L, "d e f g"), (3L, 4L, "g h i j")))
  }

  test("slidingChunks: short doc yields one whole-doc chunk; ragged tail allowed") {
    val docs = Seq((1L, "x y"), (2L, "a b c d e")).toDF("doc_id", "text")
    val out = Chunker.slidingChunks(docs, "doc_id", "text", window = 2, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(out == Set((1L, 1L, "x y"),
      (2L, 1L, "a b"), (2L, 2L, "c d"), (2L, 3L, "e")))
  }

  test("slidingChunks: NULL and blank docs produce no chunks; bad params rejected") {
    val docs = Seq((1L, null: String), (2L, "   "), (3L, "ok then")).toDF("doc_id", "text")
    val out = Chunker.slidingChunks(docs, "doc_id", "text", window = 8, stride = 8)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(3L))
    intercept[IllegalArgumentException] {
      Chunker.slidingChunks(docs, "doc_id", "text", window = 4, stride = 5)
    }
    intercept[IllegalArgumentException] {
      Chunker.slidingChunks(docs, "doc_id", "text", window = 0, stride = 1)
    }
  }

  test("redactBlocklist: whole-word case-insensitive hits; NULL text stays NULL") {
    val docs = Seq(
      (1L, "Hash the JOIN keys; hashes stay"),
      (2L, null: String)).toDF("doc_id", "text")
    val out = Chunker.redactBlocklist(docs, "doc_id", "text", Seq("hash", "join"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2L) // "hashes" must NOT match (\b anchoring)
    assert(out(0).getString(2) == "[REDACTED] the [REDACTED] keys; hashes stay")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    intercept[IllegalArgumentException] {
      Chunker.redactBlocklist(docs, "doc_id", "text", Seq("a b")) // not word-like
    }
  }
}
