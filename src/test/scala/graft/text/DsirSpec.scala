package graft.text

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def md5Bucket(gram: String, nBuckets: Int): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(gram.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16) % nBuckets
  }

  private def ngrams(text: String): Seq[String] = {
    val w = text.trim.toLowerCase.split("\\s+").toSeq
    w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  test("hashedNgramBuckets: uni+bigram buckets match an independent md5 recomputation") {
    val docs = Seq((1L, "Alpha beta gamma"), (2L, "solo")).toDF("id", "text")
    val got = docs.select(col("id"),
        Dsir.hashedNgramBuckets(col("text"), 64).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == ngrams("Alpha beta gamma").map(md5Bucket(_, 64)),
      "3 unigrams then 2 bigrams, hashed by the first 7 md5 hex chars mod 64")
    assert(got(2L) == ngrams("solo").map(md5Bucket(_, 64)),
      "a 1-token doc has no bigrams")
  }

  test("fitLogRatio: dense table, target-only grams positive, raw-only negative") {
    // 'aa' appears only in target docs, 'zz' only in non-target ones.
    val docs = Seq(
      ("aa aa aa", true), ("aa aa aa", true), ("zz zz zz", false))
      .toDF("text", "tgt")
    val nB = 256
    val lr = Dsir.fitLogRatio(docs, "text", col("tgt"), nB)
      .as[(Long, Double)].collect().toMap
    assert(lr.size == nB, "one row per bucket, never-seen buckets included")
    val bAa = md5Bucket("aa", nB)
    val bZz = md5Bucket("zz", nB)
    assert(lr(bAa) > 0, "a gram concentrated in the target corpus scores positive")
    assert(lr(bZz) < 0, "a gram absent from the target corpus scores negative")
    // Hand-check 'aa aa' bigram cell assuming no collision with 'aa'/'zz':
    // target grams T = 2 docs * (3 uni + 2 bi) = 10, raw R = 15.
    val bBi = md5Bucket("aa aa", nB)
    assume(bBi != bAa && bBi != bZz)
    val expect = math.log((4.0 + 1) / (10 + nB)) - math.log((4.0 + 1) / (15 + nB))
    assert(math.abs(lr(bBi) - expect) < 1e-12,
      "add-1 smoothed log(p/q) matches the by-hand value")
  }

  test("never-seen bucket carries exactly the smoothing prior's ratio") {
    val docs = Seq(("aa", true), ("zz", false)).toDF("text", "tgt")
    val nB = 64
    val lr = Dsir.fitLogRatio(docs, "text", col("tgt"), nB)
      .as[(Long, Double)].collect().toMap
    val empty = (0L until nB).toSet - md5Bucket("aa", nB) - md5Bucket("zz", nB)
    val prior = math.log(1.0 / (1 + nB)) - math.log(1.0 / (2 + nB))
    empty.foreach { b =>
      assert(math.abs(lr(b) - prior) < 1e-12,
        s"bucket $b saw no grams: log((0+1)/(T+B)) - log((0+1)/(R+B))")
    }
  }

  test("scoreAgainstTarget == fitLogRatio + score composed (the fused path is the same math)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(40)
    val fused = Dsir.scoreAgainstTarget(docs, "doc_id", "text",
      col("lang") === "en", 64)
    val staged = Dsir.score(docs, "doc_id", "text",
      Dsir.fitLogRatio(docs, "text", col("lang") === "en", 64), 64)
    assert(fused.orderBy("doc_id").collect().toSeq ==
      staged.orderBy("doc_id").collect().toSeq)
  }

  test("score: per-doc weight is the ngram-count-weighted sum of its buckets' ratios") {
    val docs = Seq((7L, "aa bb aa")).toDF("doc_id", "text")
    val nB = 128
    // A fixed two-sided table built from a separate corpus.
    val lr = Dsir.fitLogRatio(
      Seq(("aa bb", true), ("cc", false)).toDF("text", "tgt"),
      "text", col("tgt"), nB)
    val got = Dsir.score(docs, "doc_id", "text", lr, nB)
      .as[(Long, Long, Double)].collect().head
    val table = lr.as[(Long, Double)].collect().toMap
    val grams = ngrams("aa bb aa")
    val expect = grams.map(g => table(md5Bucket(g, nB))).sum
    assert(got._2 == grams.size)
    assert(math.abs(got._3 - math.rint(expect * 1e4) / 1e4) < 1e-9,
      "log_weight = rounded sum over the doc's hashed grams")
  }

  test("gumbelTopK: k rows, deterministic, and a dominant weight always wins") {
    val scored = (1L to 100L).map(i => (i, if (i == 42L) 1e6 else 0.0))
      .toDF("id", "w")
    val a = Dsir.gumbelTopK(scored, "id", "w", k = 10, seed = "s1")
    val b = Dsir.gumbelTopK(scored, "id", "w", k = 10, seed = "s1")
    assert(a.count() == 10)
    assert(a.collect().toSeq == b.collect().toSeq, "same seed, same pick")
    assert(a.orderBy(desc("gumbel_key")).select("id").as[Long].head() == 42L,
      "a +1e6 log-weight dominates any Gumbel draw")
    val c = Dsir.gumbelTopK(scored, "id", "w", k = 10, seed = "s2")
      .select("id").as[Long].collect().toSet
    val aSet = a.select("id").as[Long].collect().toSet
    assert(aSet != c, "at uniform weights the seed decides the sample")
    assert(c.contains(42L), "the dominant doc survives any seed")
  }

  test("gumbelTopK plan: global top-k, not a full sort-shuffle of the corpus") {
    val scored = (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "w")
    val plan = Dsir.gumbelTopK(scored, "id", "w", k = 5, seed = "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "orderBy+limit must compile to the per-partition top-k operator")
  }
}
