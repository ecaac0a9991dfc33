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

  test("packGreedy: docs assigned to the sequence where they start, per bucket") {
    val docs = Seq(
      (1L, "a b c", "en"),        // 3 tokens, starts at 0  -> seq 0, off 0
      (2L, "d e f g", "en"),      // 4 tokens, starts at 3  -> seq 0, off 3
      (3L, "h i j k l m", "en"),  // 6 tokens, starts at 7  -> seq 0, off 7 (spans into seq 1)
      (4L, "n o", "en"),          // starts at 13           -> seq 1, off 5
      (5L, "x y z", "de"),        // buckets pack independently: starts at 0
      (6L, null: String, "en"),   // no tokens -> dropped
      (7L, "   ", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Chunker.packGreedy(docs, "doc_id", "text", capacity = 8, "lang")
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("de", 5L, 3L, 0L, 0L),
      ("en", 1L, 3L, 0L, 0L), ("en", 2L, 4L, 0L, 3L),
      ("en", 3L, 6L, 0L, 7L), ("en", 4L, 2L, 1L, 5L)))
    intercept[IllegalArgumentException] {
      Chunker.packGreedy(docs, "doc_id", "text", capacity = 0, "lang")
    }
  }

  test("encodeTokens: vocab ids in position order, OOV to unkId, repartition-stable") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "dog zzz"),
      (3L, null: String)).toDF("doc_id", "text")
    val vocab = Seq(("the", 0), ("cat", 1), ("sat", 2), ("on", 3), ("mat", 4),
      ("dog", 5)).toDF("token", "tid")
    val out = Chunker.encodeTokens(docs, "doc_id", "text", vocab, "token", "tid")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2)))
    assert(out.toSeq == Seq(
      (1L, 6L, Seq(0, 1, 2, 3, 0, 4)),
      (2L, 2L, Seq(5, -1)))) // zzz is OOV; NULL doc dropped
    val again = Chunker.encodeTokens(docs.repartition(7), "doc_id", "text",
        vocab, "token", "tid")
      .orderBy("doc_id").collect().map(r => r.getSeq[Int](2))
    assert(again.toSeq == out.map(_._3).toSeq)
  }

  test("lengthBatches: similar lengths batch together, waste from batch max") {
    // lengths 3,4 -> bucket 4 (wd 4); lengths 5,7,8 -> bucket 8
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d"),
      (3L, "a b c d e"), (4L, "a b c d e f g"), (5L, "a b c d e f g h"),
      (6L, null: String)).toDF("doc_id", "text")
    val out = Chunker.lengthBatches(docs, "doc_id", "text",
        batchSize = 2, bucketWidth = 4)
      .orderBy("len_bucket", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (4L, 0L, 2L, 4L, 7L, 0.125),        // docs 1,2: pad 3->4
      (8L, 0L, 2L, 7L, 12L, 0.1429),      // docs 3,4: round(1 - 12/14, 4)
      (8L, 1L, 1L, 8L, 8L, 0.0)))         // doc 5 alone: no padding
  }

  test("applyBpe matches a reference greedy-merge implementation on random words") {
    // driver-side reference: the textbook greedy leftmost merge fold
    def refMerge(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    def refApply(word: String, merges: Seq[(String, String, Long)]): List[String] = {
      val init = word.map(_.toString).toList :+ "</w>"
      merges.foldLeft(init) { case (syms, (a, b, _)) => refMerge(syms, a, b) }
    }
    val rnd = new scala.util.Random(7)
    val words = (1 to 30).map(_ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    // adversarial merge list over a 3-letter alphabet, includes chained
    // and overlapping rules
    val merges = Seq(("a", "a", 0L), ("a", "b", 0L), ("ab", "c", 0L),
      ("c", "</w>", 0L), ("aa", "aa", 0L))
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Chunker.applyBpe(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == refApply(w, merges),
        s"word '$w': ${got(i.toLong)} != ${refApply(w, merges)}")
    }
  }

  test("trainBpe learns the classic merge sequence on the Sennrich corpus") {
    // word frequencies low:5 lower:2 newest:6 widest:3 — the BPE paper's
    // worked example; expected merges hand-computable from pair counts
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val merges = Chunker.trainBpe(docs, "text", nMerges = 5)
    assert(merges == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    // repartitioning the corpus learns the identical table
    val again = Chunker.trainBpe(docs.repartition(7), "text", nMerges = 5)
    assert(again == merges)
    // apply-time: the learned rules segment an UNSEEN word correctly
    val seg = Chunker.applyBpe(Seq((9L, "lowest")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect()(0).getSeq[String](1)
    assert(seg == Seq("low", "est</w>"))
    // overlapping-pair greed: leftmost-first ("aaa" under (a,a))
    val aaa = Chunker.applyBpe(Seq((1L, "aaa")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(("a", "a", 1L)))
      .collect()(0).getSeq[String](1)
    assert(aaa == Seq("aa", "a", "</w>"))
    // a single-letter corpus exhausts its pairs without looping forever
    val tiny = Chunker.trainBpe(Seq((1L, "a a")).toDF("doc_id", "text"),
      "text", nMerges = 5)
    assert(tiny == Seq(("a", "</w>", 2L)))
    intercept[IllegalArgumentException] {
      Chunker.trainBpe(docs, "text", nMerges = 0)
    }
  }

  test("balancedShards deals the size-sorted rank round-robin") {
    // token counts 6,5,4,3,2,1 → rank order ids (1,2,3,4,5,6) → shards
    // 0,1,0,1,0,1; doc counts equal, token mass 6+4+2=12 vs 5+3+1=9
    val corpus = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e"), (3L, "a b c d"),
      (4L, "a b c"), (5L, "a b"), (6L, "a")).toDF("doc_id", "text")
    val out = Chunker.balancedShards(corpus, "doc_id", "text", nShards = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 0, 6L -> 1))
    // ties broken by id: equal counts assign in id order
    val ties = Seq((10L, "x y"), (11L, "x y"), (12L, "x y")).toDF("doc_id", "text")
    val t2 = Chunker.balancedShards(ties, "doc_id", "text", nShards = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(t2 == Map(10L -> 0, 11L -> 1, 12L -> 0))
    intercept[IllegalArgumentException] {
      Chunker.balancedShards(ties, "doc_id", "text", nShards = 0)
    }
  }
}
