package graft

import java.nio.file.Files

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.analyze.{DistinctCounter, SchemaAnalyzer}
import graft.catalog.{ConstraintRegistry, ParquetCatalog}
import graft.convert.{CategoricalCodes, TableConverter}
import graft.graph.{EdgeType, RelGraph}
import graft.schema._

/** FIXTURES.md shapes F-B (mutagenesis: two FKs to one parent), F-C
  * (schema-fixer FK injection), F-E (diacritic distinct counting), and the
  * F-F edge-case micro-fixtures, over a temp-parquet mini-database. */
class FixturesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-fixtures").toString
    // F-B: molecule / atom / bond, bond has TWO FKs to atom
    Seq(("m1", "yes", 1.5), ("m2", "no", -0.5), ("m3", "yes", 0.7))
      .toDF("molecule_id", "mutagenic", "logp")
      .write.mode("overwrite").parquet(s"$d/molecule.parquet")
    Seq(("a1", "m1", "c"), ("a2", "m1", "n"), ("a3", "m2", "c"), ("a4", "m9", "o"))
      .toDF("atom_id", "molecule_id", "element") // a4 dangles (m9)
      .write.mode("overwrite").parquet(s"$d/atom.parquet")
    Seq(("a1", "a2", 1), ("a2", "a3", 2), ("a1", "zz", 7)) // zz dangles
      .toDF("atom1_id", "atom2_id", "bond_type")
      .write.mode("overwrite").parquet(s"$d/bond.parquet")
    // F-F: all-null column + composite FK source + featureless + empty
    // PK column deliberately NOT id-regex-named, to isolate the PK rule
    // from the ID-name omission heuristic
    Seq(("t1", 2001, Option.empty[String], "x"), ("t2", 2002, None, "y"))
      .toDF("tm_code", "year", "all_null", "payload")
      .write.mode("overwrite").parquet(s"$d/teams.parquet")
    Seq(("t1", 2001, 9.0)).toDF("ref_tm", "ref_year", "v")
      .write.mode("overwrite").parquet(s"$d/roster.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("eid",
            org.apache.spark.sql.types.IntegerType))))
      .write.mode("overwrite").parquet(s"$d/empty_t.parquet")
    // F-E: diacritic/case/whitespace variants
    Seq("Café ", "cafe", "CAFE", "café", "tea").toDF("drink")
      .write.mode("overwrite").parquet(s"$d/strings.parquet")
    d
  }

  private lazy val constraints = ConstraintRegistry(
    primaryKeys = Map(
      "molecule" -> Seq("molecule_id"), "atom" -> Seq("atom_id"),
      "teams" -> Seq("tm_code", "year"), "empty_t" -> Seq("eid")),
    foreignKeys = Map(
      "atom" -> Seq(ForeignKeyDef(Seq("molecule_id"), "molecule", Seq("molecule_id"))),
      "bond" -> Seq(
        ForeignKeyDef(Seq("atom1_id"), "atom", Seq("atom_id")),
        ForeignKeyDef(Seq("atom2_id"), "atom", Seq("atom_id"))),
      "roster" -> Seq(ForeignKeyDef(Seq("ref_tm", "ref_year"), "teams", Seq("tm_code", "year")))))

  private lazy val cat = new ParquetCatalog(spark, dir, constraints)

  test("F-B: two FKs to one parent produce two distinct edge types; dangling rows drop") {
    val g = RelGraph.build(cat.constraintSchema(), cat.allTables().toMap)
    val e1 = g.edges(EdgeType("bond", "atom1_id", "atom"))
    val e2 = g.edges(EdgeType("bond", "atom2_id", "atom"))
    assert(e1.count() == 3)  // a1, a2, a1 all resolve
    assert(e2.count() == 2)  // zz dangles
    // atom a4 -> m9 dangles too
    assert(g.edges(EdgeType("atom", "molecule_id", "molecule")).count() == 3)
  }

  test("F-C: schema-fixer hook injects FKs the catalog does not declare") {
    val fixer: Schema => Schema = s =>
      s.updated("bond", s("bond").copy(foreignKeys = s("bond").foreignKeys :+
        ForeignKeyDef(Seq("bond_type"), "molecule", Seq("molecule_id"))))
    val patched = new SchemaAnalyzer(cat, postGuessSchemaHook = fixer).guessSchema()
    assert(patched("bond").foreignKeys.length == 3)
    // and the un-patched analyzer sees only the declared two
    assert(new SchemaAnalyzer(cat).guessSchema()("bond").foreignKeys.length == 2)
  }

  test("F-F: all-NULL column is omitted; error when it is the target") {
    val a = new SchemaAnalyzer(cat)
    assert(a.guessColumnType("teams", "all_null") == OmitColumnDef())
    val e = intercept[RuntimeException] {
      new SchemaAnalyzer(cat, target = Some(("teams", "all_null"))).guessColumnType("teams", "all_null")
    }
    assert(e.getMessage.contains("only NULL values"))
  }

  test("F-F: composite PK members are not auto-omitted; composite FK members are not omitted") {
    val a = new SchemaAnalyzer(cat)
    // tm_code: composite-PK member, string, ratio 1.0 -> text (key=true),
    // NOT omitted by the single-col-PK rule
    assert(a.guessColumnType("teams", "tm_code") == TextColumnDef(key = true))
    // year: composite-PK member int, 'year' name regex -> numeric
    assert(a.guessColumnType("teams", "year") == NumericColumnDef(key = true))
    // roster.ref_tm: member of a COMPOSITE FK only -> not omitted by FK rule
    assert(a.guessColumnType("roster", "ref_tm") != OmitColumnDef())
  }

  test("F-F: empty table prunes from the graph; featureless table gets a __filler column") {
    val g = RelGraph.build(cat.constraintSchema(), cat.allTables().toMap).pruneEmpty
    assert(!g.nodes.contains("empty_t"))
    // convert a table whose only columns are omitted -> filler injected
    val ts = TableSchema(ListMap(
      "atom_id" -> OmitColumnDef(key = true),
      "molecule_id" -> OmitColumnDef(),
      "element" -> OmitColumnDef()))
    val (out, defs) = new TableConverter().convertTable(cat.table("atom"), ts)
    assert(out.columns.toSeq == Seq("__filler"))
    assert(defs == Map("__filler" -> NumericColumnDef()))
    assert(out.select("__filler").distinct().collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("F-D: financial shape — NULL-heavy categorical encodes NULL as code 0; " +
      "loan columns hit the name heuristics; dates decompose") {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("graft-fin").toString
    // enough rows that the NULL-inclusive distinct / non-null ratio stays
    // under the 0.2 categorical threshold (as in the real dataset)
    (1 to 30).map { i =>
      val sym = i % 3 match { case 0 => None; case 1 => Some("SIPO"); case 2 => Some("UVER") }
      (i, f"199${i % 3 + 6}-03-${i % 28 + 1}%02d 00:00:00", 500.0 * i, 6 * (i % 4 + 1), sym)
    }.toDF("loan_key", "date", "amount", "payments", "k_symbol")
      .select(col("loan_key"), col("date").cast("timestamp").as("date"),
        col("amount"), col("payments"), col("k_symbol"))
      .write.mode("overwrite").parquet(s"$fdir/loan.parquet")
    val fcat = new ParquetCatalog(spark, fdir,
      ConstraintRegistry(primaryKeys = Map("loan" -> Seq("loan_key"))))
    val a = new SchemaAnalyzer(fcat)
    // common-name regex: 'payments' (plural + 'pay'...): actually plural rule
    assert(a.guessColumnType("loan", "payments") == NumericColumnDef())
    assert(a.guessColumnType("loan", "amount") == NumericColumnDef())     // determined double
    assert(a.guessColumnType("loan", "date") == DateTimeColumnDef())      // determined ts
    // k_symbol: 2 distinct non-null + NULL => null-inclusive card 3,
    // ratio 3/20 under the 0.2 threshold => categorical
    assert(a.guessColumnType("loan", "k_symbol") == CategoricalColumnDef(3))
    // NULL-as-category: dictionary forces NULL to code 0
    val loan = fcat.table("loan")
    val dict = CategoricalCodes.dictionary(loan, col("k_symbol"), Seq(col("loan_key")))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(dict(None) == 0L)
    assert(dict(Some("SIPO")) == 1L && dict(Some("UVER")) == 2L) // first appearance
    // date decomposition through the TableConverter
    val ts = a.guessSchema()("loan")
    val (out, defs) = new TableConverter().convertTable(loan, ts, keep = Seq("loan_key"))
    assert(defs.keySet.contains("date_year") && defs.keySet.contains("date_dayofyear"))
    val y = out.filter(col("loan_key") === 1).select("date_year").collect()(0).getDouble(0)
    assert(y == 1997.0) // loan 1: 1 % 3 + 6 = 7 -> 1997
  }

  test("F-E: the 12 mappers give the golden distinct counts on diacritic variants") {
    val drinks = cat.table("strings")
    def dc(counter: DistinctCounter): Long =
      drinks.agg(counter.expr(col("drink"), org.apache.spark.sql.types.StringType))
        .collect()(0).getLong(0)
    assert(dc(DistinctCounter("db_distinct")) == 5)                       // all distinct
    assert(dc(DistinctCounter("fetchall_ci")) == 4)                       // CAFE==cafe... café separate, 'Café ' separate
    assert(dc(DistinctCounter("fetchall_strip_ci")) == 3)                 // {café, cafe, tea}
    assert(dc(DistinctCounter("fetchall_unidecode_strip_ci")) == 2)       // {cafe, tea}
  }
}
