package graft

import graft.dedup.Dedup
import graft.graph.RelGraph
import graft.schema.{ForeignKeyDef, OmitColumnDef, Schema, TableSchema}

import scala.collection.immutable.ListMap

/** Library hygiene: operators that persist working sets internally
  * (shingle sets, per-edge-type counts) must release them before
  * returning — a caller holding a long-lived session accumulates nothing.
  * The returned results are eagerly computed (localCheckpoint), so their
  * storage is result-sized and freed by the ContextCleaner on GC. */
class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def cacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap here at all"))
    .toDF("doc_id", "text")

  test("ngramJaccardPairs leaves no cache entries and still returns pairs") {
    spark.catalog.clearCache()
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    assert(cacheEmpty)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("minhashNearDups and verifyJaccard leave no cache entries") {
    spark.catalog.clearCache()
    Dedup.minhashNearDups(docs, "doc_id", "text", k = 16, bands = 8,
      shingleN = 3, threshold = 0.5).collect()
    assert(cacheEmpty)
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    val v = Dedup.verifyJaccard(docs, cands, "doc_id", "text", shingleN = 3,
      threshold = 0.5)
    assert(cacheEmpty)
    assert(v.count() == 1)
  }

  test("RelGraph stats with cached nodes releases everything when told") {
    spark.catalog.clearCache()
    val schema = Schema(ListMap(
      "parent" -> TableSchema(ListMap("pid" -> OmitColumnDef(key = true))),
      "child" -> TableSchema(ListMap(
        "cid" -> OmitColumnDef(key = true), "pid" -> OmitColumnDef()),
        Seq(ForeignKeyDef(Seq("pid"), "parent", Seq("pid"))))))
    val tables = Map(
      "parent" -> Seq(Tuple1(1), Tuple1(2)).toDF("pid"),
      "child" -> Seq((10, 1), (11, 2)).toDF("cid", "pid"))
    val g = RelGraph.build(schema, tables).withCachedNodes
    val out = g.stats(spark, includeReverse = true).localCheckpoint(true)
    g.unpersistNodes()
    assert(cacheEmpty)
    assert(out.count() == 4) // 2 node rows + 1 fwd + 1 rev edge type
  }
}
