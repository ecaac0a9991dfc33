package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("charEntropy: closed forms — uniform, single-char, empty/NULL excluded") {
    val docs = Seq(
      (1L, "abab"),   // two chars, uniform: H = ln 2
      (2L, "aaaa"),   // one char: H = 0
      (3L, ""), (4L, null: String))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, BigDecimal(math.log(2)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      (2L, 4L, 1L, 0.0)))
  }

  test("tokenCount: blank strings count zero") {
    val out = Seq("one two  three", "", "   ", "solo").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n")).as[Int].collect()
    assert(out.toSeq == Seq(3, 0, 0, 1))
  }

  test("bpeish token count splits letter/digit/symbol runs") {
    val out = Seq("abc12 def!", "x-y").toDF("t")
      .select(TextAnalysis.bpeishTokenCount(col("t")).as("n")).as[Int].collect()
    assert(out.toSeq == Seq(4, 3)) // abc,12,def,! | x,-,y
  }

  test("punctRatio and meanWordLen handle empties") {
    val r = Seq("ab, cd!", "").toDF("t").select(
      TextAnalysis.punctRatio(col("t")).as("p"),
      TextAnalysis.meanWordLen(col("t")).as("m")).collect()
    assert(math.abs(r(0).getDouble(0) - 2.0 / 7.0) < 1e-12)
    assert(r(0).getDouble(1) == 3.0) // ("ab,"=3 + "cd!"=3) / 2
    assert(r(1).getDouble(0) == 0.0 && r(1).getDouble(1) == 0.0)
  }

  test("stopwordRatio counts occurrences, not distinct") {
    val out = Seq("the cat and the dog").toDF("t")
      .select(TextAnalysis.stopwordRatio(col("t")).as("r")).as[Double].collect()
    assert(math.abs(out(0) - 3.0 / 5.0) < 1e-12) // the, and, the
  }

  test("langId picks profile with most distinct hits; CJK short-circuits; und on no hits") {
    val out = Seq(
      "the cat is in that house and it was big",
      "der hund ist nicht mit der katze und das haus",
      "le chat est dans la maison pour le chien avec",
      "el perro es una casa con los gatos para el",
      "борщ свёкла картошка",
      "这是中文文本").toDF("t")
      .select(TextAnalysis.langId(col("t")).as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "fr", "es", "und", "zh"))
  }

  test("embedTextStub: deterministic fixed-dim sentence vectors, word-order invariant mean") {
    val df = Seq("hello world", "world hello", "hello there", "").toDF("t")
    val out = df.select(TextAnalysis.embedTextStub(col("t"), 4).as("v")).as[Seq[Double]].collect()
    assert(out.forall(_.length == 4))
    assert(out(0) == out(1))         // mean of token vectors: order-invariant
    assert(out(0) != out(2))         // different tokens -> different embedding
    assert(out(3) == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("embedWithTable: broadcast lookup + mean, OOV skipped, no-hit -> zero") {
    val docs = Seq(
      (1L, "cat dog"),        // both in table: mean((1,10),(2,20)) = (1.5, 15)
      (2L, "cat cat dog"),    // multiset mean: (4/3, 40/3)
      (3L, "cat unicorn"),    // OOV skipped: mean of just cat = (1, 10)
      (4L, "unicorn"),        // no hits -> zero vector
      (5L, ""))               // blank -> zero vector
      .toDF("doc_id", "text")
    val table = Seq(("cat", Array(1.0, 10.0)), ("dog", Array(2.0, 20.0)))
      .toDF("token", "vec")
    val out = TextAnalysis.embedWithTable(docs, "doc_id", "text", table, "token", "vec", dim = 2)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(1.5, 15.0))
    assert(out(2L).zip(Seq(4.0 / 3, 40.0 / 3)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(out(3L) == Seq(1.0, 10.0))
    assert(out(4L) == Seq(0.0, 0.0))
    assert(out(5L) == Seq(0.0, 0.0))
  }

  test("fingerprint is normalization-invariant") {
    val out = Seq("Hello World ", "  hello world").toDF("t")
      .select(TextAnalysis.fingerprint(lower(trim(col("t")))).as("f")).as[String].collect()
    assert(out(0) == out(1))
  }

  test("repetitionStats: hand-computed fractions") {
    val docs = Seq(
      (1L, "a a b"),          // 3 tok, 2 uniq; top 'a' 2/3; bigrams [a a, a b] distinct
      (2L, "x x x x"),        // 4 tok, 1 uniq; bigrams [x x]*3 -> 1 distinct of 3
      (3L, "one"))            // single token: bigram frac undefined
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), Option(r.get(5))))).toMap
    assert(out(1L) == ((3L, 2L, 0.3333, 0.6667, Some(0.0))))
    assert(out(2L) == ((4L, 1L, 0.75, 1.0, Some(0.6667))))
    assert(out(3L) == ((1L, 1L, 0.0, 1.0, None)))
  }

  test("repetitionStats keeps NULL-text documents with NULL stats") {
    val docs = Seq((1L, Some("a a b")), (2L, None))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
    assert(out.count() == 2) // the NULL-text doc must not vanish
    val row2 = out.filter(col("doc_id") === 2L).collect().head
    assert(row2.isNullAt(3) && row2.isNullAt(4)) // dup/top fractions NULL
  }

  test("bm25: hand-computed scores; unmatched docs absent") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple apple cherry"),
      (3L, "durian"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=2, df(apple)=2 -> idf = ln(1 + 1.5/2.5) = ln(1.6)
    val idf = math.log(1.6)
    // doc1: tf=1, dl=2 -> 2.2/(1 + 1.2*(0.25 + 0.75)) = 1.0
    assert(math.abs(out(1L) - idf) < 1e-9)
    // doc2: tf=2, dl=3 -> 4.4/(2 + 1.2*(0.25 + 1.125)) = 4.4/3.65
    assert(math.abs(out(2L) - idf * 4.4 / 3.65) < 1e-9)
    assert(!out.contains(3L))
  }

  test("tfidfTopK: scores, ranking and term tiebreak") {
    // 3 docs; 'rare' only in doc 1; 'common' everywhere
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "common other"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc1: rare tf=1 df=1 -> ln(4/2)=0.6931; common tf=2 df=3 -> 2*ln(4/4)=0
    assert(out((1L, 1L))._1 == "rare")
    assert(out((1L, 1L))._4 == 0.6931)
    assert(out((1L, 2L))._1 == "common")
    assert(out((1L, 2L))._4 == 0.0)
    // doc2 has only 'common' -> a single row despite k=2
    assert(!out.contains((2L, 2L)))
    // doc3: 'other' (df=1) outranks 'common' (score 0)
    assert(out((3L, 1L))._1 == "other")
  }

  test("contamination: hand-computed shingle overlap, NULL text survives") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Some("a b c d")),        // shingles {a b c, b c d}
      (2L, Some("a b c x")),        // {a b c, b c x}: 1 of 2 in benchmark
      (3L, Some("q r s t")),        // {q r s, r s t}: none
      (4L, None: Option[String]))   // NULL text: survives with NULL stats
      .toDF("doc_id", "text")
    val benchmark = Seq((99L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, benchmark, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2), r.getDouble(3))))).toMap
    assert(out(1L) == Some((2L, 2L, 1.0)))
    assert(out(2L) == Some((2L, 1L, 0.5)))
    assert(out(3L) == Some((2L, 0L, 0.0)))
    assert(out(4L).isEmpty)
  }

  test("pseudonymize: consistent digests preserve joins, NULLs stay NULL") {
    val a = Seq((Some(1L), "x"), (Some(2L), "y"), (None: Option[Long], "z"))
      .toDF("id", "v")
    val p = TextAnalysis.pseudonymize(a, Seq("id"), "s3cret")
    val rows = p.orderBy("v").collect()
    assert(rows(0).getString(0).length == 64) // sha-256 hex
    assert(rows(2).isNullAt(0))
    // same value -> same pseudonym across independent tables (join-safe)
    val b = TextAnalysis.pseudonymize(
      Seq(1L).toDF("id"), Seq("id"), "s3cret")
    assert(p.join(b, "id").count() == 1)
    // different salt severs linkage entirely
    val c = TextAnalysis.pseudonymize(Seq(1L).toDF("id"), Seq("id"), "other")
    assert(p.join(c, "id").count() == 0)
  }

  test("boilerplate: shared shingles counted, unique docs score 0, NULL survives") {
    val docs = Seq(
      (1L, Some("the quick brown fox")),   // shingles {the quick brown, quick brown fox}
      (2L, Some("the quick brown cat")),   // shares "the quick brown" with doc 1
      (3L, Some("entirely different words here")),
      (4L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.boilerplate(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1), r.getLong(2), r.getDouble(3))))).toMap
    assert(out(1L) == Some((2L, 1L, 0.5)))
    assert(out(2L) == Some((2L, 1L, 0.5)))
    assert(out(3L) == Some((2L, 0L, 0.0)))
    assert(out(4L).isEmpty)
  }

  test("piiScan counts and redacts emails, IPs, phones; NULL stays NULL") {
    val docs = Seq(
      (1L, "mail a.b+c@sub.example.org and x@y.io please"),
      (2L, "host 192.168.0.1 gateway 10.0.0.254"),
      (3L, "call +1-555-0134 or +420-777-123-4567"),
      (4L, "clean text, version 1.2 only"), // 1.2 must NOT match IPv4
      (5L, null: String)).toDF("doc_id", "text")
    val out = TextAnalysis.piiScan(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2L &&
      out(0).getString(4) == "mail [EMAIL] and [EMAIL] please")
    assert(out(1).getLong(2) == 2L &&
      out(1).getString(4) == "host [IP] gateway [IP]")
    assert(out(2).getLong(3) == 2L &&
      out(2).getString(4) == "call [PHONE] or [PHONE]")
    assert((1 to 3).forall(i => out(3).getLong(i) == 0L) &&
      out(3).getString(4) == "clean text, version 1.2 only")
    assert((1 to 4).forall(out(4).isNullAt))
  }

  test("sentenceStats: segment counts and token means, edge cases") {
    val docs = Seq(
      (1L, "One two three. Four five! Six?"),   // 3 sentences of 3,2,1 tokens
      (2L, "no terminator here"),               // 1 sentence, 3 tokens
      (3L, "...!!!"),                           // only enders: 0 sentences
      (4L, ""),                                 // empty: 0 sentences
      (5L, null: String))                       // NULL stays NULL
      .toDF("doc_id", "text")
    val out = TextAnalysis.sentenceStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(0).getDouble(2) == 2.0)
    assert(out(1).getLong(1) == 1L && out(1).getDouble(2) == 3.0)
    assert(out(2).getLong(1) == 0L && out(2).getDouble(2) == 0.0)
    assert(out(3).getLong(1) == 0L && out(3).getDouble(2) == 0.0)
    assert(out(4).isNullAt(1) && out(4).isNullAt(2))
  }

  test("dedupSentences keeps first occurrences in order, NULL stays NULL") {
    val docs = Seq(
      (1L, "Buy now. Great deal! Buy now. Act fast. Great deal."),
      (2L, "All unique. Sentences here."),
      (3L, ""),
      (4L, null: String)).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSentences(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 5L && out(0).getLong(2) == 3L)
    assert(out(0).getString(3) == "Buy now. Great deal! Act fast."
      .replace("!", ".").replace("Act fast.", "Act fast") ||
      out(0).getString(3) == "Buy now. Great deal. Act fast",
      s"got '${out(0).getString(3)}'")
    assert(out(1).getLong(2) == 2L)
    assert(out(2).getLong(1) == 0L && out(2).getString(3) == "")
    assert(out(3).isNullAt(1) && out(3).isNullAt(3))
  }

  test("sourceOverlap: containment of the smaller source, a<b ordering") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "crawl"),   // shingles: abg, bgd
      (2L, "alpha beta gamma", "eval"),          // shingle: abg — fully inside crawl
      (3L, "zeta eta theta iota", "other")       // no overlap with anyone
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlap(docs, "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // only the crawl/eval pair overlaps; eval (1 shingle) is fully contained
    assert(out.keySet == Set(("crawl", "eval")), s"pairs: ${out.keySet}")
    assert(out(("crawl", "eval")) == ((1L, 1.0)),
      "1 shared shingle / min(2, 1) = full containment")
  }

  test("zipfSlope recovers the slope of a constructed power-law corpus") {
    // term at frequency rank r appears 720/r times (720 divides 1..6), so
    // ln(freq) = ln(720) - ln(rank): an exact slope -1 corpus
    val docs = (1 to 6).map { r =>
      (r.toLong, Seq.fill(720 / r)(s"t$r").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.zipfSlope(docs, "text", topN = 6).collect()(0)
    assert(out.getLong(0) == 6L)
    assert(math.abs(out.getDouble(1) - (-1.0)) < 1e-9, s"slope ${out.getDouble(1)}")
    assert(math.abs(out.getDouble(2) - math.log(720.0)) < 1e-9, "intercept ln(720)")
    // a uniform corpus has slope 0
    val flat = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val f = TextAnalysis.zipfSlope(flat, "text", topN = 6).collect()(0)
    assert(math.abs(f.getDouble(1)) < 1e-12)
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfSlope(docs, "text", topN = 1)
    }
  }

  test("loadGloVe parses token/vec lines and feeds embedWithTable") {
    val dir = java.nio.file.Files.createTempDirectory("glove").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "glove.txt")
    val lines = Seq(
      "the 0.1 0.2", "quick 1.0 -1.0", "brown 0.5 0.5", "fox -0.2 0.4",
      "jumps 0.0 1.0", "over 0.3 -0.3", "lazy -1.0 0.0", "dog 0.8 0.6",
      "a 0.0 0.0", "and 0.25 -0.75")
    java.nio.file.Files.write(f.toPath,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    val table = TextAnalysis.loadGloVe(spark, f.getAbsolutePath, dim = 2)
    assert(table.count() == 10L)
    val quick = table.filter(col("token") === "quick").collect()(0)
    assert(quick.getSeq[Double](1) == Seq(1.0, -1.0))
    // end-to-end: the loaded table drives the F20 sentence embedding
    val docs = Seq((1L, "the quick fox"), (2L, "zzz unknown")).toDF("doc_id", "text")
    val out = TextAnalysis.embedWithTable(docs, "doc_id", "text", table,
        "token", "vec", dim = 2)
      .orderBy("doc_id").collect()
    // mean of (0.1,0.2), (1.0,-1.0), (-0.2,0.4)
    assert(math.abs(out(0).getSeq[Double](1)(0) - 0.3) < 1e-12)
    assert(math.abs(out(0).getSeq[Double](1)(1) - (-0.4 / 3)) < 1e-12)
    assert(out(1).getSeq[Double](1) == Seq(0.0, 0.0), "all-OOV doc -> zero vec")
    // malformed rows fail loudly, not silently skip
    java.nio.file.Files.write(f.toPath, "bad 0.1\n".getBytes("UTF-8"))
    val err = intercept[Exception] {
      TextAnalysis.loadGloVe(spark, f.getAbsolutePath, dim = 2).collect()
    }
    assert(err.getMessage.contains("GloVe") ||
      err.getCause != null && err.getCause.getMessage.contains("GloVe"))
  }

  test("hashedLinearScore matches an independent driver-side md5 rescoring") {
    import spark.implicits._
    val weights: Seq[Long] = Seq(2L, -3L, 5L, -1L, 0L, 4L, -5L, 1L)
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "  MIXED Case   Tokens  "),   // trim + lower + multi-space split
      (3L, "solo"),
      (4L, null.asInstanceOf[String])    // NULL text drops out entirely
    ).toDF("doc_id", "text")
    def bucketOf(tok: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(h.substring(0, 7), 16) % weights.size).toInt
    }
    val got = TextAnalysis.hashedLinearScore(docs, "doc_id", "text", weights, bias = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val want = Map(
      1L -> "the quick brown fox", 2L -> "mixed case tokens", 3L -> "solo"
    ).map { case (id, norm) =>
      val toks = norm.split(" ")
      val score = 10L + toks.map(t => weights(bucketOf(t))).sum
      id -> ((score, toks.length.toLong, score >= 0))
    }
    assert(got == want)
    assert(!got.contains(4L))
  }
}
