package graft

class EntrySmokeSpec extends SparkSpec {

  test("entry() runs under the driver's conditions, including ANSI mode") {
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    val prevNanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    // simulate a driver-created session: Spark 4 ANSI default, no nanos conf
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val rows = SparkEntry.entry(spark).collect()
      // 10 node types + 8 forward + 8 reverse FK edge types
      assert(rows.length == 26)
      assert(rows.forall(_.getLong(2) >= 0))
      val kinds = rows.map(_.getString(1)).toSet
      assert(kinds == Set("node_rows", "edges"))
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prevNanos)
    }
  }

  test("bench detail filename self-versions off committed BENCH_r*.json rounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench").toFile
    try {
      assert(Bench.defaultDetailPath(dir.getPath) == "BENCH_DETAIL_r10.json")
      java.nio.file.Files.createFile(new java.io.File(dir, "BENCH_r09.json").toPath)
      assert(Bench.defaultDetailPath(dir.getPath) == "BENCH_DETAIL_r10.json")
      java.nio.file.Files.createFile(new java.io.File(dir, "BENCH_r10.json").toPath)
      assert(Bench.defaultDetailPath(dir.getPath) == "BENCH_DETAIL_r11.json")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("every registered query has either an oracle or a documented rows-only reason") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // hash-/seed-defined pipelines and iterative float fixpoints only —
    // keep this list in sync when adding
    // (mm2_decode_batched left this list in round 9: the default decode
    // codec is now the real javax.imageio path, pinned by a closed-form
    // PNG oracle; w6_random_split left in round 10: the registered split
    // is the md5-coin portable variant, oracle-checked per row)
    assert(rowsOnly == anchorOf.keySet,
      "every rows-only query must be declared here WITH its anchor twin — " +
        s"undeclared: ${(rowsOnly -- anchorOf.keySet).toSeq.sorted}, " +
        s"stale: ${(anchorOf.keySet -- rowsOnly).toSeq.sorted}")
    // and no oracle exists without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  /** The closed rows-only list, each entry carrying its oracle-anchored
    * twin — the query that pins the same pipeline under the DuckDB gate
    * at a degenerate/portable parameter setting. Growth gate (round-10
    * verdict task #8): a NEW rows-only query cannot land without an
    * anchor; the test below fails the build if the named anchor is not
    * itself oracle-checked.
    * (mm2_decode_batched left this list in round 9: the default decode
    * codec is now the real javax.imageio path, pinned by a closed-form
    * PNG oracle; w6_random_split left in round 10: the registered split
    * is the md5-coin portable variant, oracle-checked per row;
    * pr1_pagerank left in round 12: the fixed 5-round power iteration
    * unrolls into CTEs — pageRankOracle — and the shared round-to-6
    * absorbs summation-order drift. d5/d5c/sim2 left in round 12 too:
    * their hyperplanes are deterministic driver-side doubles, so the
    * oracle embeds them as literal DOUBLE[] VALUES — planeValuesSql —
    * and the banded pipelines restate at their REAL parameters;
    * sem1 likewise: at iters=1 the deterministic-init Lloyd loop
    * unrolls into SQL with zero embedded constants; sim6's fixed-m
    * greedy MMR unrolls into per-pick argmax CTEs — mmrOracle;
    * kc1_kcore left in round 13: the peel unrolls into materialized
    * CTE rounds — kCoreOracle — idempotent past the fixpoint, so a
    * fixed unroll depth restates the iterate-to-fixpoint exactly.) */
  private val anchorOf: Map[String, String] = Map(
    "d2_minhash_neardups" -> "d2c_minhash_portable", // full pipeline incl. banding
    "d4_simhash_neardups" -> "d4c_simhash_portable",
    "d4b_simhash128_neardups" -> "d4d_simhash_portable_pairs",
    "t4_text_embed_stub" -> "t4b_text_embed_table",
    // BPE's merge-round loop (argmax + fold per round) has no SQL
    // restatement; the classic-corpus closed form is pinned in ChunkerSpec
    "bpe1_bpe_merges" -> "bpe1b_bpe_first_merge",
    "bpe2_bpe_segment" -> "bpe2b_bpe_apply_fixed")

  test("PLANS.lock covers exactly the registered queries (fast, Spark-free)") {
    // The full fingerprint comparison lives in PlanQualitySpec and needs
    // Spark plans; this set-difference check fails in seconds with the
    // same message when a query is registered without regenerating the
    // lock (round-11 gate break: fp2 landed lock-less in the snapshot
    // commit and was only caught minutes into PlanQualitySpec).
    val lockFile = new java.io.File("PLANS.lock")
    assert(lockFile.exists(), "PLANS.lock missing — run graft.tools.PlanLock")
    val locked = scala.io.Source.fromFile(lockFile).getLines()
      .filter(_.contains(":")).map(_.takeWhile(_ != ':').trim).toSet
    val registered = SparkEntry.queries.keySet
    assert(registered -- locked == Set.empty[String],
      s"new queries not in lock (run graft.tools.PlanLock and review): ${(registered -- locked).toSeq.sorted}")
    assert(locked -- registered == Set.empty[String],
      s"stale lock entries for unregistered queries: ${(locked -- registered).toSeq.sorted}")
  }

  test("every rows-only query's anchor twin is itself oracle-checked") {
    val unanchored = anchorOf.collect {
      case (q, a) if !SparkEntry.oracleSql.contains(a) => s"$q -> $a"
    }
    assert(unanchored.isEmpty,
      s"anchor twins missing from the oracle registry: $unanchored")
  }
}
