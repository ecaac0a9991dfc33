package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import graft.schema.ForeignKeyDef

class CatalogSpec extends SparkSpec {

  private lazy val cat = new ParquetCatalog(spark, sf(), ConstraintRegistry.testdata)

  test("S1: lists all parquet tables sorted; filters apply") {
    assert(cat.listTables() == Seq("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier"))
    val filtered = new ParquetCatalog(spark, sf(), ConstraintRegistry.testdata,
      tableFilter = SetFilter(include = Some(Set("orders", "nation")), exclude = Set("nation")))
    assert(filtered.listTables() == Seq("orders"))
  }

  test("S2/S3/S4: columns, physical types, PK/FK from the sidecar registry") {
    assert(cat.columns("region").fieldNames.toSeq == Seq("r_regionkey", "r_name"))
    assert(cat.primaryKey("lineitem") == Seq("l_orderkey", "l_linenumber"))
    assert(cat.foreignKeys("lineitem").map(_.refTable).toSet == Set("orders", "part", "supplier"))
  }

  test("column filters prune the visible schema") {
    val c = new ParquetCatalog(spark, sf(), ConstraintRegistry.testdata,
      columnFilters = Map("orders" -> SetFilter(exclude = Set("o_orderpriority"))))
    assert(!c.columns("orders").fieldNames.contains("o_orderpriority"))
    assert(c.columns("customer").fieldNames.length == 5) // others untouched
  }

  test("S6: copyTo round-trips tables through parquet") {
    val out = Files.createTempDirectory("graft-copy").toString
    val small = new ParquetCatalog(spark, sf(), ConstraintRegistry.testdata,
      tableFilter = SetFilter(include = Some(Set("region", "nation"))))
    small.copyTo(out)
    val copy = new ParquetCatalog(spark, out, ConstraintRegistry.testdata)
    assert(copy.listTables() == Seq("nation", "region"))
    assert(copy.table("region").count() == cat.table("region").count())
    assert(copy.columns("nation") == cat.columns("nation"))
  }

  test("constraintSchema carries PK flags and FKs for graph building") {
    val s = cat.constraintSchema()
    assert(s("orders").primaryKey == Seq("o_orderkey"))
    assert(s("lineitem").foreignKeys.contains(
      ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey"))))
  }
}
