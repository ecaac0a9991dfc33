package graft.sample

import scala.collection.immutable.ListMap

import graft.SparkSpec
import graft.schema._

class BfsSamplerSpec extends SparkSpec {
  import spark.implicits._

  // star: child -> parent; sibling -> parent (reverse direction from parent)
  private def schema = Schema(ListMap(
    "parent" -> TableSchema(ListMap("pid" -> OmitColumnDef(key = true))),
    "child" -> TableSchema(ListMap(
      "cid" -> OmitColumnDef(key = true), "pid" -> OmitColumnDef()),
      Seq(ForeignKeyDef(Seq("pid"), "parent", Seq("pid")))),
    "sibling" -> TableSchema(ListMap(
      "sid" -> OmitColumnDef(key = true), "pid" -> OmitColumnDef()),
      Seq(ForeignKeyDef(Seq("pid"), "parent", Seq("pid"))))))

  private def tables = Map(
    "parent" -> Seq(Tuple1(1), Tuple1(2)).toDF("pid"),
    "child" -> Seq((10, 1), (11, 1), (12, 2)).toDF("cid", "pid"),
    "sibling" -> Seq((20, 1), (21, 2)).toDF("sid", "pid"))

  test("depth-2 walk from a child row reaches parent but not siblings") {
    val s = new BfsSampler(schema, tables, maxDepth = 2)
    val out = s.sample("child", 0) // cid=10 -> parent pid=1
    assert(out("child").count() == 1)
    assert(out("parent").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(!out.contains("sibling")) // depth 2 nodes collected, not expanded
  }

  test("depth-3 walk expands parent reverse edges to siblings and all its children") {
    val s = new BfsSampler(schema, tables, maxDepth = 3)
    val out = s.sample("child", 0)
    // parent(1) expands: reverse to sibling (pid=1) and child is its parent -> skipped
    assert(out("sibling").collect().map(_.getInt(0)).toSeq == Seq(20))
    // child not re-expanded from parent (immediate parent suppression)
    assert(out("child").count() == 1)
  }

  test("seed row is selected by PK-ordered offset") {
    val s = new BfsSampler(schema, tables, maxDepth = 1)
    val out = s.sample("child", 2) // third child by cid order = cid 12
    assert(out("child").collect().map(_.getInt(0)).toSeq == Seq(12))
  }

  // composite-FK star: line references (order_no, site) of header — a
  // two-column frontier the reference's sampler rejects (bfs.py:54 TODO)
  private def compositeSchema = Schema(ListMap(
    "header" -> TableSchema(ListMap(
      "order_no" -> OmitColumnDef(key = true), "site" -> OmitColumnDef(key = true),
      "note" -> OmitColumnDef())),
    "line" -> TableSchema(ListMap(
      "line_id" -> OmitColumnDef(key = true),
      "order_no" -> OmitColumnDef(), "site" -> OmitColumnDef()),
      Seq(ForeignKeyDef(Seq("order_no", "site"), "header", Seq("order_no", "site"))))))

  private def compositeTables = Map(
    // two headers share order_no=1 but differ on site: a single-column
    // frontier on order_no alone would wrongly pull BOTH
    "header" -> Seq((1, "east", "a"), (1, "west", "b"), (2, "east", "c"))
      .toDF("order_no", "site", "note"),
    "line" -> Seq((100, 1, "east"), (101, 1, "west"), (102, 2, "east"))
      .toDF("line_id", "order_no", "site"))

  test("composite-FK forward frontier joins on the full column zip") {
    val s = new BfsSampler(compositeSchema, compositeTables, maxDepth = 2)
    val out = s.sample("line", 0) // line_id=100 -> header (1, east) ONLY
    assert(out("line").count() == 1)
    val headers = out("header").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(headers.toSeq == Seq((1, "east")),
      s"expected only the (1,east) header, got ${headers.mkString(",")}")
  }

  test("composite-FK reverse frontier probes the declared ref columns") {
    val s = new BfsSampler(compositeSchema, compositeTables, maxDepth = 3)
    val out = s.sample("header", 0) // header (1, east)
    // reverse edge header -> line must pull only line 100, not 101 (same
    // order_no, different site) or 102
    val lines = out("line").collect().map(_.getInt(0)).sorted
    assert(lines.toSeq == Seq(100), s"got ${lines.mkString(",")}")
  }

  test("virtual _target_table node + edge point at the seed row") {
    val s = new BfsSampler(schema, tables, maxDepth = 2)
    val (out, edge) = s.sampleWithVirtualTarget("child", 1) // seed cid=11
    // one synthetic node with the reference's ones((1,1)) feature
    val vn = out(BfsSampler.VirtualTargetTable).collect()
    assert(vn.length == 1 && vn(0).getLong(0) == 0L && vn(0).getSeq[Double](1) == Seq(1.0))
    // one edge from the virtual node to the seed's PK value
    val e = edge.collect()
    assert(e.length == 1 && e(0).getLong(0) == 0L && e(0).getInt(1) == 11)
    // the sampled tables themselves are unchanged by the addition
    assert(out("child").count() == 1 && out("parent").count() == 1)
    // stats include both virtual rows
    val stats = s.sampleStatsWithVirtualTarget("child", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats(BfsSampler.VirtualTargetTable) == 1L)
    assert(stats(s"${BfsSampler.VirtualTargetTable}->_target_fk->child") == 1L)
  }
}
