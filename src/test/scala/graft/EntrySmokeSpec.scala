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
    assert(rowsOnly == Set("d2_minhash_neardups",
      "d4_simhash_neardups", "d4b_simhash128_neardups", "d5_embedding_neardups",
      "sim2_lsh_topk", "t4_text_embed_stub",
      "pr1_pagerank", "sim6_mmr_topk",
      "sem1_semantic_dedup", // cell assignment is centroid-defined; sem1b anchors
      // the nCells=1 degenerate under the oracle, DedupSpec pins cell semantics
      "kc1_kcore", // iterate-to-fixpoint peel: no SQL restatement
      // BPE's merge-round loop (argmax + fold per round) has no SQL
      // restatement; the classic-corpus closed form is pinned in ChunkerSpec
      "bpe1_bpe_merges", "bpe2_bpe_segment"))
    // and no oracle exists without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
