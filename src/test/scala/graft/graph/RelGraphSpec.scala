package graft.graph

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema._

class RelGraphSpec extends SparkSpec {
  import spark.implicits._

  private def tinySchema = Schema(ListMap(
    "parent" -> TableSchema(ListMap(
      "pid" -> OmitColumnDef(key = true), "pval" -> NumericColumnDef())),
    "child" -> TableSchema(ListMap(
      "cid" -> OmitColumnDef(key = true), "pid" -> OmitColumnDef()),
      Seq(ForeignKeyDef(Seq("pid"), "parent", Seq("pid")))),
    "empty" -> TableSchema(ListMap("eid" -> OmitColumnDef(key = true)))))

  private def tinyTables = Map(
    "parent" -> Seq((10, 1.0), (20, 2.0)).toDF("pid", "pval"),
    "child" -> Seq((1, 20), (2, 10), (3, 99), (4, 20)).toDF("cid", "pid"),
    "empty" -> Seq.empty[Int].toDF("eid"))

  test("withRowId assigns contiguous 0-based ids in PK order") {
    val df = Seq((30, "c"), (10, "a"), (20, "b")).toDF("k", "v")
    val out = RelGraph.withRowId(df, Seq("k")).orderBy("k")
      .select("k", RelGraph.RowId).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((10, 0L), (20, 1L), (30, 2L)))
  }

  test("withRowId stays contiguous across many range partitions") {
    // wide-enough input that the sort spans several partitions — exercises
    // the per-partition offset accumulation (id = partition start + local
    // position), which a single-partition case cannot
    val n = 10000
    val df = spark.range(n).selectExpr(s"cast($n - id AS long) AS k")
      .repartition(16)
    val got = RelGraph.withRowId(df, Seq("k"))
      .select("k", RelGraph.RowId).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.length == n)
    // k = 1..n sorted ascending must map to ids 0..n-1 exactly
    assert(got.zipWithIndex.forall { case ((k, id), i) =>
      k == i + 1L && id == i.toLong })
  }

  test("withRowId on an empty frame keeps the schema and returns no rows") {
    val df = Seq.empty[(Int, String)].toDF("k", "v")
    val out = RelGraph.withRowId(df, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "v", RelGraph.RowId))
    assert(out.count() == 0L)
  }

  test("fkEdges drops dangling and null FK rows, maps to row ids") {
    val g = RelGraph.build(tinySchema, tinyTables)
    val e = g.edges(EdgeType("child", "pid", "parent"))
      .orderBy("src_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // child row ids by cid order: 1->0, 2->1, 3->2 (dangling), 4->3
    // parent row ids: 10->0, 20->1
    assert(e.toSeq == Seq((0L, 1L), (1L, 0L), (3L, 1L)))
  }

  test("withReverseEdges transposes every edge type") {
    val g = RelGraph.build(tinySchema, tinyTables).withReverseEdges
    val rev = g.edges(EdgeType("parent", "rev_pid", "child"))
      .orderBy("src_id", "dst_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rev.toSeq == Seq((0L, 1L), (1L, 0L), (1L, 3L)))
  }

  test("withSelfLoops adds one loop per node row") {
    val g = RelGraph.build(tinySchema, tinyTables).withSelfLoops
    val loops = g.edges(EdgeType("parent", "self", "parent")).collect()
    assert(loops.forall(r => r.getLong(0) == r.getLong(1)) && loops.length == 2)
  }

  test("pruneEmpty removes empty node types and their incident edges") {
    val g = RelGraph.build(tinySchema, tinyTables).pruneEmpty
    assert(g.nodes.keySet == Set("parent", "child"))
    assert(g.edges.keySet == Set(EdgeType("child", "pid", "parent")))
  }

  test("stats derives reverse counts from forward counts and keeps empty edge types") {
    val schema = Schema(ListMap(
      "parent" -> TableSchema(ListMap(
        "pid" -> OmitColumnDef(key = true), "pval" -> NumericColumnDef())),
      "child" -> TableSchema(ListMap(
        "cid" -> OmitColumnDef(key = true), "pid" -> OmitColumnDef()),
        Seq(ForeignKeyDef(Seq("pid"), "parent", Seq("pid")))),
      "orphan" -> TableSchema(ListMap(
        "oid" -> OmitColumnDef(key = true), "pid" -> OmitColumnDef()),
        Seq(ForeignKeyDef(Seq("pid"), "parent", Seq("pid"))))))
    val tables = Map(
      "parent" -> tinyTables("parent"),
      "child" -> tinyTables("child"),
      "orphan" -> Seq((1, 777)).toDF("oid", "pid")) // FK never matches → 0 edges
    val g = RelGraph.build(schema, tables)
    val out = g.stats(spark, includeReverse = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("parent", "node_rows")) == 2L && out(("child", "node_rows")) == 4L)
    assert(out(("child->pid->parent", "edges")) == 3L)
    assert(out(("parent->rev_pid->child", "edges")) == 3L)
    assert(out(("orphan->pid->parent", "edges")) == 0L)
    assert(out(("parent->rev_pid->orphan", "edges")) == 0L)
    assert(out.size == 3 + 2 * 2)
  }

  test("composite FK joins on all key columns") {
    val p = Seq((1, "x", 100.0), (1, "y", 200.0)).toDF("a", "b", "v")
    val c = Seq((7, 1, "y")).toDF("cid", "fa", "fb")
    val pr = RelGraph.withRowId(p, Seq("a", "b"))
    val cr = RelGraph.withRowId(c, Seq("cid"))
    val e = RelGraph.fkEdges(cr, pr, ForeignKeyDef(Seq("fa", "fb"), "p", Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq == Seq((0L, 1L)))
  }
}
