package graft.analyze

import graft.SparkSpec
import graft.catalog.{ConstraintRegistry, ParquetCatalog}
import graft.schema._

class SchemaAnalyzerSpec extends SparkSpec {

  private lazy val cat =
    new ParquetCatalog(spark, sf(), ConstraintRegistry.testdata)
  private lazy val guessed =
    new SchemaAnalyzer(cat, target = Some(("orders", "o_totalprice"))).guessSchema()

  test("single-column PKs and non-composite FK members are omitted") {
    assert(guessed("orders").columns("o_orderkey") == OmitColumnDef(key = true))
    assert(guessed("orders").columns("o_custkey") == OmitColumnDef())
    assert(guessed("lineitem").columns("l_partkey") == OmitColumnDef())
    // l_orderkey: composite-PK member AND single-col-FK member -> omitted
    // via the FK rule, key flag preserved
    assert(guessed("lineitem").columns("l_orderkey") == OmitColumnDef(key = true))
  }

  test("determined physical types: double -> numeric, timestamp -> datetime") {
    assert(guessed("orders").columns("o_totalprice") == NumericColumnDef())
    assert(guessed("orders").columns("o_orderdate") == DateTimeColumnDef())
    assert(guessed("lineitem").columns("l_shipdate") == DateTimeColumnDef())
  }

  test("low-cardinality strings become categorical with null-inclusive cardinality") {
    guessed("orders").columns("o_orderstatus") match {
      case CategoricalColumnDef(card, false) => assert(card == 3)
      case other => fail(s"expected categorical, got $other")
    }
    guessed("customer").columns("c_mktsegment") match {
      case CategoricalColumnDef(card, false) => assert(card == 5)
      case other => fail(s"expected categorical, got $other")
    }
  }

  test("high-cardinality strings become text; name columns stay text not omit") {
    assert(guessed("part").columns("p_name") == TextColumnDef())
    assert(guessed("documents").columns("text") == TextColumnDef())
  }

  test("plural/numeric-name heuristics and thresholds drive int columns") {
    // l_linenumber: small distinct count but name matches 'number' -> numeric;
    // key=true because it belongs to the composite PK
    assert(guessed("lineitem").columns("l_linenumber") == NumericColumnDef(key = true))
    // p_size: distinct/nonnull 0.25 > 0.2 cannot-be-categorical -> numeric
    assert(guessed("part").columns("p_size") == NumericColumnDef())
    // event_type: low ratio, no numeric-name hit -> categorical
    assert(guessed("events").columns("event_type").isInstanceOf[CategoricalColumnDef])
  }

  test("explicit numeric target type short-circuits") {
    val a = new SchemaAnalyzer(cat, target = Some(("customer", "c_mktsegment")),
      targetType = Some("numeric"))
    assert(a.guessColumnType("customer", "c_mktsegment") == NumericColumnDef())
  }

  test("omit filter excludes configured columns") {
    import graft.catalog.SetFilter
    val a = new SchemaAnalyzer(cat,
      omitFilters = SetFilter(exclude = Set(("part", "p_type"))))
    assert(a.guessColumnType("part", "p_type") == OmitColumnDef())
  }

  test("post-guess hook patches the schema (infer -> patch layering)") {
    val hook: Schema => Schema = s =>
      s.updated("region", s("region").copy(columns =
        s("region").columns.updated("r_name", TextColumnDef())))
    val patched = new SchemaAnalyzer(cat, postGuessSchemaHook = hook).guessSchema()
    assert(patched("region").columns("r_name") == TextColumnDef())
  }

  test("guessSchemaDF flat view has one row per (table, column)") {
    val df = new SchemaAnalyzer(cat).guessSchemaDF()
    val expected = cat.tableColumnPairs().size
    assert(df.count() == expected)
  }

  test("all distinct counters return 0 (not NULL) on an empty table") {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val empty = Seq.empty[String].toDF("c")
    for (dc <- Seq(DistinctCounter.DbDistinct,
        DistinctCounter.FetchAllNormalized("ci"),
        DistinctCounter.Approx())) {
      val r = empty.agg(dc.expr(org.apache.spark.sql.functions.col("c"), StringType)).collect()(0)
      assert(!r.isNullAt(0) && r.getLong(0) == 0L, s"counter $dc")
    }
  }

  test("a5's static physicalKinds fixture matches the actual testdata schemas") {
    // the generated a5 oracle bakes in each column's physical kind; if the
    // driver regenerates the testdata with different physical types (it
    // did on 2026-08-13: events.ts ns-as-long -> native timestamp[us]),
    // fail HERE at build time instead of as a mysterious oracle mismatch
    // in the driver's gate
    import org.apache.spark.sql.types._
    def kind(dt: DataType): String = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "int"
      case _: FloatType | _: DoubleType | _: DecimalType => "num"
      case _: StringType => "str"
      case _: TimestampType | _: DateType => "datetime"
      case _ => "other"
    }
    val fixture = graft.QueriesCore.physicalKinds
    assert(fixture.keySet == cat.listTables().toSet)
    for (t <- cat.listTables()) {
      val actual = cat.columns(t).fields.map(f => f.name -> kind(f.dataType)).toSeq
      assert(fixture(t) == actual,
        s"$t: fixture=${fixture(t)} actual=$actual — regenerate physicalKinds")
    }
  }
}
