package graft.analyze

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def values(n: Int, tag: String) =
    (1 to n).map(i => s"$tag-$i").toDF("v")

  test("rho is 1 + leading zero bits of the 44-bit suffix") {
    // hand-picked hex hashes: bucket chars then 11 suffix chars
    val cases = Seq(
      ("ab" + "80000000000", 1),  // suffix starts with bit 1
      ("ab" + "40000000000", 2),  // 0b0100...
      ("ab" + "20000000000", 3),
      ("ab" + "10000000000", 4),
      ("ab" + "08000000000", 5),  // one zero nibble + high bit of next
      ("ab" + "00100000000", 12), // two zero nibbles + 0001
      ("ab" + "00000000001", 44), // ten zero nibbles + 0001
      ("ab" + "00000000000", 45)) // all-zero suffix
    val got = cases.toDF("h", "want")
      .withColumn("got", Sketches.rho(col("h")))
      .filter(col("got") =!= col("want"))
      .collect()
    assert(got.isEmpty, got.mkString(", "))
  }

  test("HLL estimate lands within 4 standard errors at n >> m") {
    // m = 256 -> se ~ 6.5%; 20k distinct values is deep in the raw regime
    val n = 20000
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(values(n, "x"), Seq.empty, col("v")), Seq.empty)
      .select("estimate").as[Double].head()
    assert(math.abs(est - n) / n < 0.26, s"estimate $est for n=$n")
  }

  test("HLL small-range correction kicks in and is accurate at n < m") {
    val n = 60
    val row = Sketches.hllEstimate(
      Sketches.hllRegisters(values(n, "y"), Seq.empty, col("v")), Seq.empty)
      .select("zeros", "estimate").head()
    assert(row.getLong(0) > 0)
    assert(math.abs(row.getDouble(1) - n) / n < 0.25,
      s"linear-counting estimate ${row.getDouble(1)} for n=$n")
  }

  test("duplicate values do not move the sketch") {
    val once = values(500, "d")
    val thrice = once.union(once).union(once)
    val a = Sketches.hllRegisters(once, Seq.empty, col("v"))
    val b = Sketches.hllRegisters(thrice, Seq.empty, col("v"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("sharded registers merge to exactly the direct sketch (any split)") {
    val df = values(5000, "m")
    for (shards <- Seq(2, 7)) {
      val sharded = df.withColumn("shard",
        pmod(conv(substring(md5(col("v")), 1, 4), 16, 10).cast("int"),
          lit(shards)))
      val merged = Sketches.hllMerge(
        Sketches.hllRegisters(sharded, Seq("shard"), col("v")), Seq.empty)
      val direct = Sketches.hllRegisters(df, Seq.empty, col("v"))
      assert(merged.exceptAll(direct).isEmpty &&
        direct.exceptAll(merged).isEmpty, s"shards=$shards")
    }
  }

  test("merge is idempotent: re-merging a merged sketch is a no-op") {
    val reg = Sketches.hllRegisters(values(3000, "i"), Seq.empty, col("v"))
    val twice = Sketches.hllMerge(
      Sketches.hllMerge(reg.union(reg), Seq.empty), Seq.empty)
    assert(twice.exceptAll(reg).isEmpty && reg.exceptAll(twice).isEmpty)
  }

  test("KMV estimate lands within 4 standard errors when saturated") {
    // se ~ 1/sqrt(k-1) ~ 6.3% at k = 256
    val n = 15000
    val row = Sketches.kmvEstimate(
      Sketches.kmvSketch(values(n, "k"), col("v"), 256), 256)
      .select("saturated", "estimate").head()
    assert(row.getBoolean(0))
    assert(math.abs(row.getDouble(1) - n) / n < 0.26,
      s"estimate ${row.getDouble(1)} for n=$n")
  }

  test("unsaturated KMV reports the exact distinct count") {
    val row = Sketches.kmvEstimate(
      Sketches.kmvSketch(values(100, "u"), col("v"), 256), 256)
      .select("n_sketch", "saturated", "estimate").head()
    assert(row.getLong(0) == 100)
    assert(!row.getBoolean(1))
    assert(row.getDouble(2) == 100.0)
  }

  test("KMV sketch of a union is the merge of the per-set sketches") {
    val a = values(4000, "a")
    val b = values(4000, "b")
    val k = 256
    val skU = Sketches.kmvSketch(a.union(b), col("v"), k)
    // merging bottom-k sketches = bottom-k of their union of hashes
    val merged = Sketches.kmvSketch(a, col("v"), k)
      .union(Sketches.kmvSketch(b, col("v"), k))
      .distinct().orderBy("h").limit(k)
    assert(skU.exceptAll(merged).isEmpty && merged.exceptAll(skU).isEmpty)
  }

  test("bottom-k sample merges losslessly: shard samples union to the direct sample") {
    val df = (1 to 6000).map(i => (s"key-$i", i.toLong)).toDF("k", "x")
    val k = 200
    val direct = Sketches.bottomK(df, col("k"), k, "s")
    for (shards <- Seq(3, 8)) {
      val parts = (0 until shards).map { sh =>
        Sketches.bottomK(
          df.filter(pmod(conv(substring(md5(col("k")), 1, 4), 16, 10)
            .cast("int"), lit(shards)) === sh), col("k"), k, "s")
      }.reduce(_ union _)
      val merged = Sketches.bottomKMerge(parts, k)
      // collect-compare: the samples are k rows by construction (and
      // exceptAll over unions of LIMIT frames trips a Catalyst binding bug)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("__h", "k", "x").as[(String, String, Long)]
          .collect().sorted.toSeq
      assert(rows(merged) == rows(direct), s"shards=$shards")
    }
  }

  test("bottom-k sample is uniform enough: sample mean tracks the population mean") {
    // keys 1..20000 carry value = key; a uniform 256-sample's mean has
    // se = sigma/sqrt(k) ~ 361 here — assert within 4 se of 10000.5
    val df = (1 to 20000).map(i => (s"u-$i", i.toDouble)).toDF("k", "x")
    val m = Sketches.bottomK(df, col("k"), 256, "s")
      .agg(avg("x")).as[Double].head()
    assert(math.abs(m - 10000.5) < 4 * 20000 / math.sqrt(12) / 16,
      s"sample mean $m")
  }

  test("bottom-k with duplicate keys keeps one row per key hash after merge") {
    val df = Seq("a", "a", "b", "c", "c").toDF("k")
    val merged = Sketches.bottomKMerge(
      Sketches.bottomK(df, col("k"), 10, "s"), 10)
    assert(merged.count() == 3)
  }

  test("registers never exceed m rows per group and ranks stay in 1..45") {
    val reg = Sketches.hllRegisters(values(30000, "r"), Seq.empty, col("v"))
    assert(reg.count() <= Sketches.Buckets)
    val bad = reg.filter(col("r") < 1 || col("r") > 45).count()
    assert(bad == 0)
  }
}
