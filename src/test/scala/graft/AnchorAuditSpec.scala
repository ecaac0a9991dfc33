package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{Chunker, TextAnalysis}

/** Machine-checks the anchor claims of the rows-only registry entries
  * (bpe1/bpe2/d2/d4/d4b/t4 carry `err: "no_oracle"` in the driver's
  * gate): each hash-/seed-defined output is asserted to be a
  * SUBSET/refinement/prefix of its oracle-checked anchor twin's relation
  * ON THE REAL TESTDATA at the registered parameters — so "every
  * rows-only query is anchored" is a spec suite, not prose. (The d2 ⊆
  * exact-Jaccard subset claim is already specced in DedupSpec; this file
  * covers the remaining four.)
  */
class AnchorAuditSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("bpe1 anchor: the iterative learner is prefix-stable, so rule 1 IS bpe1b's single merge") {
    val ten = Chunker.trainBpe(docs, "text", nMerges = 10)
    val one = Chunker.trainBpe(docs, "text", nMerges = 1)
    val three = Chunker.trainBpe(docs, "text", nMerges = 3)
    assert(ten.take(1) == one,
      "rule 1 of the 10-merge train must equal the anchored single merge")
    assert(ten.take(3) == three,
      "the merge list is a prefix chain — bpe2b's fixed 3-rule table is the true prefix")
  }

  test("bpe2 anchor: more merge rules only coarsen — per-doc n_subwords(10 rules) <= n_subwords(3 rules)") {
    val ten = Chunker.trainBpe(docs, "text", nMerges = 10)
    def counts(rules: Seq[(String, String, Long)]) =
      Chunker.applyBpe(docs, "doc_id", "text", rules)
        .select(col("doc_id"), size(col("subwords")).as("n"))
        .as[(Long, Int)].collect().toMap
    val n10 = counts(ten)
    val n3 = counts(ten.take(3))
    assert(n10.keySet == n3.keySet, "same documents segmented")
    assert(n10.nonEmpty)
    n3.foreach { case (id, n) =>
      assert(n10(id) <= n, s"doc $id: applying a superset of rules split MORE ($n -> ${n10(id)})")
    }
    assert(n10.exists { case (id, n) => n < n3(id) },
      "rules 4-10 actually merge something on this corpus")
  }

  test("d4 anchor: banded 64-bit simhash pairs EQUAL brute-force Hamming at the registered distance") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 10)
      .as[(Long, Long, Int)].collect().toSet
    val banded = Dedup.simhashNearDups(docs, "doc_id", "text", maxDistance = 10)
      .select(col("id1"), col("id2"), col("hamming").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute,
      s"pigeonhole banding must have FULL recall and exact-verify precision: ${banded.size} vs ${brute.size}")
  }

  test("d4b anchor: banded 128-bit simhash pairs EQUAL brute-force Hamming at the registered distance") {
    val sh = Dedup.simhash128(docs, "doc_id", "text")
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        (bit_count(col("a.simhash_lo").bitwiseXOR(col("b.simhash_lo"))) +
          bit_count(col("a.simhash_hi").bitwiseXOR(col("b.simhash_hi"))))
          .as("hamming"))
      .filter(col("hamming") <= 10)
      .as[(Long, Long, Int)].collect().toSet
    val banded = Dedup.simhashNearDups128(docs, "doc_id", "text", maxDistance = 10)
      .select(col("id1"), col("id2"), col("hamming").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute,
      s"128-bit banding must have FULL recall and exact-verify precision: ${banded.size} vs ${brute.size}")
  }

  test("t4 anchor: the hash-defined stub is column-compatible with the oracle-checked table path") {
    val dim = 8
    val stub = docs.select(col("doc_id"),
      TextAnalysis.embedTextStub(col("text"), dim).as("embedding"))
    // table path over the same corpus vocabulary (t4b's derivation)
    val vocab = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0).distinct()
      .select(col("token"), array((0 until dim).map(i =>
        (length(col("token")) * (i + 1)).cast("double")): _*).as("vec"))
    val table = TextAnalysis.embedWithTable(docs, "doc_id", "text",
      vocab, "token", "vec", dim = dim)
    // same schema shape: one row per document, a dim-length double vector
    // (containsNull differs — the stub provably emits no null elements,
    // the table path's coalesce-built array keeps the conservative flag)
    import org.apache.spark.sql.types.ArrayType
    val et = (df: org.apache.spark.sql.DataFrame) =>
      df.schema("embedding").dataType.asInstanceOf[ArrayType].elementType
    assert(et(stub) == et(table),
      "stub and table paths must agree on the embedding element type")
    val stubRows = stub.orderBy("doc_id")
      .as[(Long, Seq[Double])].collect()
    val tableRows = table.orderBy("doc_id")
      .as[(Long, Seq[Double])].collect()
    assert(stubRows.map(_._1).toSeq == tableRows.map(_._1).toSeq,
      "both paths keep exactly the documents' rows")
    assert(stubRows.forall(_._2.length == dim) && tableRows.forall(_._2.length == dim))
    // the stub is a pure function of the text: a second invocation is
    // bit-identical (the property that makes rows-only checking sound)
    val again = docs.select(col("doc_id"),
        TextAnalysis.embedTextStub(col("text"), dim).as("embedding"))
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(stubRows.toSeq == again.toSeq)
  }
}
