package graft.schema

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

class SchemaSpec extends AnyFunSuite {

  private val schema = Schema(ListMap(
    "orders" -> TableSchema(ListMap(
      "o_orderkey" -> OmitColumnDef(key = true),
      "o_custkey" -> OmitColumnDef(),
      "o_status" -> CategoricalColumnDef(3),
      "o_total" -> NumericColumnDef(),
      "o_date" -> DateTimeColumnDef()),
      Seq(ForeignKeyDef(Seq("o_custkey"), "customer", Seq("c_custkey")))),
    "customer" -> TableSchema(ListMap(
      "c_custkey" -> OmitColumnDef(key = true),
      "c_name" -> TextColumnDef()))))

  test("JSON round-trip preserves order, types, keys, cardinality, FKs") {
    val json = Schema.toJson(schema)
    val back = Schema.fromJson(json)
    assert(back == schema)
    assert(back.tables.keys.toSeq == Seq("orders", "customer"))
    assert(back("orders").columns("o_status") == CategoricalColumnDef(3))
    assert(back("orders").foreignKeys.head.refTable == "customer")
  }

  test("primaryKey derives from key flags; edgeTypes enumerate FKs") {
    assert(schema("orders").primaryKey == Seq("o_orderkey"))
    assert(schema.edgeTypes.map { case (t, fk) => (t, fk.refTable) } == Seq("orders" -> "customer"))
    assert(schema("orders").nonCompositeFkColumns == Set("o_custkey"))
  }

  test("FK arity mismatch rejected") {
    intercept[IllegalArgumentException](ForeignKeyDef(Seq("a", "b"), "t", Seq("x")))
  }

  test("all eight ColumnDef kinds round-trip") {
    val all = ListMap(
      "a" -> CategoricalColumnDef(7, key = true), "b" -> NumericColumnDef(),
      "c" -> DateColumnDef(), "d" -> DateTimeColumnDef(),
      "e" -> DurationColumnDef(), "f" -> TimeColumnDef(),
      "g" -> TextColumnDef(), "h" -> OmitColumnDef(key = true))
    val s = Schema(ListMap("t" -> TableSchema(all.asInstanceOf[ListMap[String, ColumnDef]])))
    assert(Schema.fromJson(Schema.toJson(s)) == s)
  }
}
