package graft.text

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramSurprisal matches the hand-computed add-1 model") {
    // corpus: d1 = "a b", d2 = "a b a"
    // bigrams: (a,b)x2, (b,a)x1; contexts: a->2, b->1; V = 2
    // P(b|a) = (2+1)/(2+2) = 3/4; P(a|b) = (1+1)/(1+2) = 2/3
    val docs = Seq((1L, "a b"), (2L, "a b a")).toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val s1 = -math.log(3.0 / 4.0)            // d1: one bigram
    val s2 = (s1 - math.log(2.0 / 3.0)) / 2  // d2: avg over (a,b), (b,a)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((1L, 1L, r4(s1)), (2L, 2L, r4(s2))))
  }

  test("bigramSurprisal: sub-2-token and blank docs are excluded; k shifts scores") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, null: String), (4L, "x y x y"))
      .toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(4L))
    // d4 alone: bigrams (x,y)x2, (y,x)x1; V=2; higher k pulls toward uniform
    val k1 = out(0).getDouble(2)
    val k9 = LangModel.bigramSurprisal(docs, "doc_id", "text", k = 9.0)
      .collect()(0).getDouble(2)
    assert(k9 > k1) // heavy smoothing flattens the sharp (x,y) probability
    intercept[IllegalArgumentException] {
      LangModel.bigramSurprisal(docs, "doc_id", "text", k = 0.0)
    }
  }
}
