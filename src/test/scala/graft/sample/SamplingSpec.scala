package graft.sample

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("capNeighbors bounds fan-in per destination and keeps all small groups") {
    val edges = ((1L to 100L).map(s => (s, 7L)) ++ Seq((1L, 8L), (2L, 8L)))
      .toDF("src_id", "dst_id")
    val capped = Sampling.capNeighbors(edges, k = 10)
    val byDst = capped.groupBy("dst_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDst(7L) == 10L)   // hot node capped
    assert(byDst(8L) == 2L)    // small group untouched
    // deterministic per seed
    val again = Sampling.capNeighbors(edges, k = 10)
      .orderBy("dst_id", "src_id").collect().toSeq
    assert(Sampling.capNeighbors(edges, k = 10)
      .orderBy("dst_id", "src_id").collect().toSeq == again)
  }

  test("withSplitMasks: masks are complementary and roughly proportional") {
    val nodes = (1L to 1000L).toDF("id")
    val masked = Sampling.withSplitMasks(nodes, valFraction = 0.3)
    val counts = masked.agg(
      sum(when(col("train_mask"), 1).otherwise(0)).as("tr"),
      sum(when(col("val_mask"), 1).otherwise(0)).as("va"),
      sum(when(col("train_mask") === col("val_mask"), 1).otherwise(0)).as("overlap"))
      .collect()(0)
    assert(counts.getLong(0) + counts.getLong(1) == 1000L)
    assert(counts.getLong(2) == 0L) // masks never agree (complementary)
    assert(counts.getLong(1) > 200L && counts.getLong(1) < 400L)
  }

  test("withSplitMasksPortable: complementary, proportional, and repartition-stable") {
    val nodes = (1L to 1000L).toDF("id")
    val masked = Sampling.withSplitMasksPortable(nodes, "id", valFraction = 0.3)
    val counts = masked.agg(
      sum(when(col("train_mask"), 1).otherwise(0)).as("tr"),
      sum(when(col("val_mask"), 1).otherwise(0)).as("va"),
      sum(when(col("train_mask") === col("val_mask"), 1).otherwise(0)).as("overlap"))
      .collect()(0)
    assert(counts.getLong(0) + counts.getLong(1) == 1000L)
    assert(counts.getLong(2) == 0L)
    assert(counts.getLong(1) > 200L && counts.getLong(1) < 400L)
    // pure function of the key: any partitioning draws the identical masks
    // (the property rand(seed) cannot give)
    val a = masked.orderBy("id").collect().toSeq
    val b = Sampling.withSplitMasksPortable(nodes.repartition(7), "id", 0.3)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // fraction edge cases ride the hex4 clamp
    assert(Sampling.withSplitMasksPortable(nodes, "id", 1.0)
      .filter(!col("val_mask")).count() == 0L)
    assert(Sampling.withSplitMasksPortable(nodes, "id", 0.0)
      .filter(col("val_mask")).count() == 0L)
  }

  test("groupSplit: every row of a group lands in the same split, ~80/20") {
    // 10 rows per group — leakage would show as a group with mixed splits
    val rows = for (g <- 1L to 500L; r <- 1 to 10) yield (g, r)
    val df = rows.toDF("gid", "row")
    val split = Sampling.groupSplit(df, "gid")
    val mixed = split.groupBy("gid")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(mixed == 0L)
    val tr = split.filter(col("split") === "train").count()
    assert(tr > 3500L && tr < 4500L) // ~80% of 5000 rows
    // stable: same assignment on re-evaluation and under repartitioning
    val a = split.select("gid", "split").distinct().collect().toSet
    val b = Sampling.groupSplit(df.repartition(7), "gid")
      .select("gid", "split").distinct().collect().toSet
    assert(a == b)
  }

  test("hashSample: deterministic, nested thresholds, ~proportional") {
    val df = (1L to 5000L).toDF("id")
    val small = Sampling.hashSample(df, "id", "10").as[Long].collect().toSet
    val big = Sampling.hashSample(df, "id", "80").as[Long].collect().toSet
    assert(small.subsetOf(big))             // thresholds nest
    assert(small.size > 150 && small.size < 500)   // ~6.3% of 5000
    assert(big.size > 2200 && big.size < 2800)     // ~50% of 5000
    val again = Sampling.hashSample(df.repartition(13), "id", "10")
      .as[Long].collect().toSet
    assert(again == small)                  // pure function of the key
  }

  test("stratifiedSample keeps per-stratum fractions, deterministically") {
    val df = (1L to 6000L).map(i => (i, if (i % 3 == 0) "rare" else "common"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "lang", "id",
      Map("common" -> 0.1, "rare" -> 1.0))
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rare") == 2000L)                    // fraction 1.0 keeps all
    assert(counts("common") > 250L && counts("common") < 550L) // ~10% of 4000
    // stable under repartitioning (pure function of key+seed)
    val again = Sampling.stratifiedSample(df.repartition(11), "lang", "id",
      Map("common" -> 0.1, "rare" -> 1.0)).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // unlisted strata follow defaultFraction
    val none = Sampling.stratifiedSample(df, "lang", "id", Map(), defaultFraction = 0.0)
    assert(none.count() == 0L)
  }

  test("groupSplitFast agrees with itself and respects trainPct bounds") {
    val df = (1L to 2000L).toDF("gid")
    val s = Sampling.groupSplitFast(df, "gid", trainPct = 70)
    val tr = s.filter(col("split") === "train").count()
    assert(tr > 1200L && tr < 1600L)
    assert(Sampling.groupSplitFast(df, "gid", trainPct = 0)
      .filter(col("split") === "train").count() == 0L)
    assert(Sampling.groupSplitFast(df, "gid", trainPct = 100)
      .filter(col("split") === "test").count() == 0L)
  }

  test("stratifiedSamplePortable keeps per-stratum fractions, repartition-stable") {
    import spark.implicits._
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSamplePortable(df, "lang", "id",
      Map("en" -> 0.25), defaultFraction = 1.0)
    val en = out.filter(col("lang") === "en").count()
    assert(en > 380 && en < 620, s"~25% of 2000 en rows, got $en")
    assert(out.filter(col("lang") === "de").count() == 2000L) // default keeps all
    // deterministic under repartitioning
    val again = Sampling.stratifiedSamplePortable(df.repartition(13), "lang", "id",
      Map("en" -> 0.25), defaultFraction = 1.0)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // fraction edges: 0 drops everything, 1.0 keeps everything
    assert(Sampling.stratifiedSamplePortable(df, "lang", "id",
      Map("en" -> 0.0, "de" -> 1.0)).count() == 2000L)
    // fractions within 1/65536 of 1.0 round to 65536 — must clamp to "ffff",
    // not format as the 5-char "10000" (which kept only coins < '1')
    val near1 = Sampling.stratifiedSamplePortable(df, "lang", "id",
      Map("en" -> 0.999995), defaultFraction = 1.0)
      .filter(col("lang") === "en").count()
    assert(near1 >= 1990L, s"~all of 2000 en rows at f=0.999995, got $near1")
  }

  test("temperatureMix flattens source proportions toward sqrt weights") {
    import spark.implicits._
    // dominant source 'big' (3600 rows), rare source 'small' (400 rows)
    val df = (1L to 4000L).map(i => (i, if (i <= 3600) "big" else "small"))
      .toDF("id", "src")
    val out = Sampling.temperatureMix(df, "src", "id", targetFraction = 0.5)
    val big = out.filter(col("src") === "big").count().toDouble
    val small = out.filter(col("src") === "small").count().toDouble
    // proportional sampling would keep big/small = 9:1; sqrt-weights keep
    // 60:20 = 3:1 — the rare source's SHARE of the sample must grow
    assert(small / (big + small) > 0.15,
      s"rare source share should exceed its 10% corpus share, got ${small / (big + small)}")
    // keep fractions: N=2000, isq=(60,20), S=80 -> f_big=2000*60/(80*3600)=0.4167
    // f_small=2000*20/(80*400)=1.25 -> capped at 1.0: ALL small rows kept
    assert(small == 400.0, s"rare source capped at keep-all, got $small")
    assert(big > 1350 && big < 1650, s"~41.7% of 3600, got $big")
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(df.repartition(7), "src", "id", 0.5)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(df, "src", "id", 0.0)
    }
  }

  test("kFold: complete partition into k stable folds, grouped keys travel together") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("id")
    val out = Sampling.kFold(df, "id", k = 5)
    val sizes = out.groupBy("fold").count().orderBy("fold").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(sizes.map(_._1).toSeq == Seq(0, 1, 2, 3, 4), "every fold present")
    assert(sizes.map(_._2).forall(n => n > 800 && n < 1200),
      s"roughly uniform folds, got ${sizes.toSeq}")
    // pure function of (key, seed): stable under repartitioning
    val again = Sampling.kFold(df.repartition(13), "id", k = 5)
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(again == out.orderBy("id").collect().map(_.getInt(1)).toSeq)
    // rows sharing a key share a fold — assign on the group key
    val grouped = Seq((1L, "u1"), (2L, "u1"), (3L, "u2"))
      .toDF("row_id", "user")
    val folds = Sampling.kFold(grouped, "user", k = 3)
      .select("user", "fold").distinct().count()
    assert(folds == 2L, "one fold per user, however many rows")
    intercept[IllegalArgumentException] {
      Sampling.kFold(df, "id", k = 1)
    }
  }

  test("upsample: expected multiplicity per stratum, deterministic copies") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, if (i <= 1000) "rare" else "common"))
      .toDF("id", "src")
    val out = Sampling.upsample(df, "src", "id", Map("rare" -> 2.5))
    val byStratum = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("common") == 2000L, "weight 1.0 is a no-op")
    // 1000 rare rows at w=2.5: 2 copies each + ~half get a third
    assert(byStratum("rare") > 2300 && byStratum("rare") < 2700,
      s"~2500 expected, got ${byStratum("rare")}")
    // copy_id enumerates each row's copies from 0
    val copies = out.filter($"id" === 1L).select("copy_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(copies == (0L until copies.length.toLong), s"contiguous ids: $copies")
    // deterministic under repartitioning
    val again = Sampling.upsample(df.repartition(7), "src", "id", Map("rare" -> 2.5))
    assert(again.count() == out.count())
    // weight 0 drops the stratum entirely
    assert(Sampling.upsample(df, "src", "id", Map("rare" -> 0.0))
      .filter($"src" === "rare").count() == 0L)
    intercept[IllegalArgumentException] {
      Sampling.upsample(df, "src", "id", Map("rare" -> -1.0))
    }
  }

  test("stratified samplers reject non-string strata columns loudly") {
    import spark.implicits._
    // a numeric stratum renders "1.0" against a "1" key in the map probe —
    // the old when-chain coerced, the constant-depth probe cannot, so the
    // mismatch must be an error, not a silent fall-through to the default
    val df = (1L to 10L).map(i => (i, (i % 2).toDouble)).toDF("id", "grp")
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(df, "grp", "id", Map("1" -> 0.5))
    }
    assert(e.getMessage.contains("must be a string"))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSamplePortable(df, "grp", "id", Map("1" -> 0.5))
    }
    // the documented remedy works
    assert(Sampling.stratifiedSample(df.withColumn("grp", $"grp".cast("string")),
      "grp", "id", Map("1.0" -> 1.0), defaultFraction = 0.0).count() == 5L)
  }

  test("topKPerGroup: exactly k rows per group, stable under repartitioning") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val out = Sampling.topKPerGroup(df, "grp", "id", k = 7)
    val sizes = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ == 7L), s"7 per group, got $sizes")
    // a group smaller than k is kept whole, not padded
    val tiny = Sampling.topKPerGroup(df.filter($"id" <= 2), "grp", "id", k = 7)
    assert(tiny.count() == 2L)
    // pure function of (key, seed): repartitioning changes nothing
    val again = Sampling.topKPerGroup(df.repartition(11), "grp", "id", k = 7)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // a different seed draws a different sample
    val other = Sampling.topKPerGroup(df, "grp", "id", k = 7, seed = "43")
    assert(other.select("id").collect().map(_.getLong(0)).sorted.toSeq !=
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.topKPerGroup(df, "grp", "id", k = 0)
    }
  }

  test("budgetSample: budget counts NODES per type, stable under repartitioning") {
    import spark.implicits._
    // node 'n1' of type A appears via 5 edges; the budget must treat it
    // as ONE candidate (the HGT distinction from a per-edge cap)
    val dup = (1 to 5).map(_ => ("A", "n1")) ++
      (2 to 40).map(i => ("A", s"n$i")) ++
      (1 to 4).map(i => ("B", s"m$i"))
    val cands = dup.toDF("node_type", "node_key")
    val out = Sampling.budgetSample(cands, "node_type", "node_key", budget = 10)
    val sizes = out.groupBy("node_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("A" -> 10L, "B" -> 4L), s"got $sizes") // B kept whole
    assert(out.count() == out.distinct().count(), "unique nodes only")
    // pure function of (key, seed): repartitioning changes nothing
    val again = Sampling.budgetSample(cands.repartition(13),
      "node_type", "node_key", budget = 10)
    assert(again.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      out.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq)
    // n1's 5 duplicate edges give it no selection advantage: its odds are
    // one md5 draw like everyone else's — assert it is NOT always present
    // across seeds (it would be under edge-weighted sampling, 5/44 rows)
    val picksN1 = (1 to 8).count { s =>
      Sampling.budgetSample(cands, "node_type", "node_key", budget = 10,
        seed = s"s$s").filter($"node_key" === "n1").count() == 1L
    }
    assert(picksN1 < 8, "n1 must not be privileged by its edge multiplicity")
    intercept[IllegalArgumentException] {
      Sampling.budgetSample(cands, "node_type", "node_key", budget = 0)
    }
  }

  test("temperatureMix rejects data-cardinality source keys with a clear error") {
    import spark.implicits._
    // mixing on a per-row key would collect data-sized counts to the
    // driver — the guard must fail fast, not OOM
    val df = (1L to 500L).map(i => (i, s"doc_$i")).toDF("id", "src")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMix(df, "src", "id", 0.5, maxSources = 100)
    }
    assert(e.getMessage.contains("distinct values"))
    // at or under the bound the mix proceeds normally
    assert(Sampling.temperatureMix(df, "src", "id", 1.0, maxSources = 500)
      .count() == 500L)
  }

  test("weightedSample: race identity, weight bias, determinism, guards") {
    import spark.implicits._
    import java.security.MessageDigest
    // independent re-derivation of the exponential race
    def eOf(key: Long, w: Double): Double = {
      val h = MessageDigest.getInstance("MD5")
        .digest(s"$key:ws:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(h, 16) + 0.5) / math.pow(16.0, 12)
      -math.log(u) / w
    }
    val rows = (1L to 400L).map(i => (i, (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = rows.sortBy { case (i, w) => (eOf(i, w), i) }
      .take(50).map(_._1).toSet
    assert(got == want, "winners must be the 50 smallest race values")
    // weight bias: heavy rows (w=7) must win far more often than light
    // (w=1) — under uniform sampling each stratum would land ~7 winners
    val byW = rows.filter(r => want(r._1)).groupBy(_._2).view.mapValues(_.size)
    assert(byW.getOrElse(7.0, 0) > byW.getOrElse(1.0, 0),
      s"heavier stratum must win more: $byW")
    // partitioning/order invariance
    val got2 = Sampling.weightedSample(df.repartition(7).sortWithinPartitions("w"),
      "id", "w", k = 50).select("id").collect().map(_.getLong(0)).toSet
    assert(got2 == got)
    // k beyond the input keeps everything
    assert(Sampling.weightedSample(df, "id", "w", k = 1000).count() == 400L)
    // guards: non-positive and NULL weights fail fast
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(Seq((1L, 0.0)).toDF("id", "w"), "id", "w", 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(
        Seq((1L, Option.empty[Double])).toDF("id", "w"), "id", "w", 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "id", "w", k = 0)
    }
  }
}
