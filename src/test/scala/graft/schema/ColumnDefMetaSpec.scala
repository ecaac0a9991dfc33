package graft.schema

import scala.collection.immutable.ListMap

import graft.SparkSpec

class ColumnDefMetaSpec extends SparkSpec {
  import spark.implicits._

  test("ColumnDefs attach to StructField metadata and survive a plan") {
    val df = Seq((1, "a", 2.5)).toDF("id", "cat", "num")
    val ts = TableSchema(ListMap(
      "id" -> OmitColumnDef(key = true),
      "cat" -> CategoricalColumnDef(7),
      "num" -> NumericColumnDef()))
    val tagged = ColumnDefMeta.attach(df, ts)
    // survive a projection + filter (Catalyst keeps field metadata)
    val planned = tagged.filter($"id" > 0).select($"cat", $"num", $"id")
    val back = ColumnDefMeta.recover(planned)
    assert(back == Map(
      "id" -> OmitColumnDef(key = true),
      "cat" -> CategoricalColumnDef(7),
      "num" -> NumericColumnDef()))
  }

  test("untagged columns recover to nothing; unknown type errors") {
    val df = Seq(1).toDF("x")
    assert(ColumnDefMeta.recover(df).isEmpty)
  }

  test("metadata round-trips every ColumnDef kind") {
    val defs: Seq[ColumnDef] = Seq(CategoricalColumnDef(3, key = true),
      NumericColumnDef(), DateColumnDef(), DateTimeColumnDef(key = true),
      DurationColumnDef(), TimeColumnDef(), TextColumnDef(), OmitColumnDef())
    defs.foreach { cd =>
      assert(ColumnDefMeta.fromMetadata(ColumnDefMeta.toMetadata(cd)).contains(cd))
    }
  }
}
