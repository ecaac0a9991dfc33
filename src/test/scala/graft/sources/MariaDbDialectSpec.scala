package graft.sources

import java.sql.Types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** §1.2 MariaDB→Spark physical-type widening table
  * (reference ctu_dataset.py:369-401): every row of the survey's map
  * pinned individually, plus the two documented departures (DECIMAL kept
  * exact, TIME left to the stock mapping) and the write-side inverse. */
class MariaDbDialectSpec extends AnyFunSuite {
  private def md = new MetadataBuilder()

  // ---- signed integral family: one-to-one -------------------------------
  test("signed integrals map one-to-one") {
    assert(MariaDbDialect.widen("TINYINT").contains(ByteType))
    assert(MariaDbDialect.widen("SMALLINT").contains(ShortType))
    assert(MariaDbDialect.widen("MEDIUMINT").contains(IntegerType))
    assert(MariaDbDialect.widen("INT").contains(IntegerType))
    assert(MariaDbDialect.widen("INTEGER").contains(IntegerType))
    assert(MariaDbDialect.widen("BIGINT").contains(LongType))
  }

  // ---- unsigned integral family: widened ONE step (Spark has no unsigned)
  test("unsigned integrals widen one step") {
    assert(MariaDbDialect.widen("TINYINT UNSIGNED").contains(ShortType))
    assert(MariaDbDialect.widen("SMALLINT UNSIGNED").contains(IntegerType))
    assert(MariaDbDialect.widen("MEDIUMINT UNSIGNED").contains(LongType))
    assert(MariaDbDialect.widen("INT UNSIGNED").contains(LongType))
    assert(MariaDbDialect.widen("INTEGER UNSIGNED").contains(LongType))
    // BIGINT UNSIGNED max (2^64-1) exceeds Long: 20-digit exact decimal
    assert(MariaDbDialect.widen("BIGINT UNSIGNED").contains(DecimalType(20, 0)))
  }

  test("widen is case- and whitespace-insensitive (driver spellings vary)") {
    assert(MariaDbDialect.widen("tinyint unsigned").contains(ShortType))
    assert(MariaDbDialect.widen("  Int Unsigned  ").contains(LongType))
  }

  // ---- floating point ---------------------------------------------------
  test("float family") {
    assert(MariaDbDialect.widen("FLOAT").contains(FloatType))
    assert(MariaDbDialect.widen("FLOAT UNSIGNED").contains(FloatType))
    assert(MariaDbDialect.widen("DOUBLE").contains(DoubleType))
    assert(MariaDbDialect.widen("DOUBLE UNSIGNED").contains(DoubleType))
  }

  // ---- DECIMAL: deliberate departure from the reference's float64 cast --
  test("DECIMAL is left to the stock precision/scale read (kept exact)") {
    // reference ctu_dataset.py:384 casts DECIMAL→float64 (lossy); we keep
    // DecimalType(p,s) until feature conversion. widen returning None means
    // Spark reads the declared precision/scale from JDBC metadata.
    assert(MariaDbDialect.widen("DECIMAL").isEmpty)
    assert(MariaDbDialect.getCatalystType(Types.DECIMAL, "DECIMAL", 10, md).isEmpty)
  }

  // ---- temporal: stock mappings are already the survey's target ---------
  test("temporal types defer to stock mappings") {
    for (t <- Seq("DATE", "TIME", "DATETIME", "TIMESTAMP", "YEAR"))
      assert(MariaDbDialect.widen(t).isEmpty, t)
  }

  // ---- string family (incl. ENUM/SET wire form) -------------------------
  test("string family incl. ENUM and SET maps to StringType") {
    for (t <- Seq("CHAR", "VARCHAR", "TINYTEXT", "TEXT", "MEDIUMTEXT",
        "LONGTEXT", "ENUM", "SET"))
      assert(MariaDbDialect.widen(t).contains(StringType), t)
  }

  // ---- binary family ----------------------------------------------------
  test("binary family maps to BinaryType") {
    for (t <- Seq("BINARY", "VARBINARY", "TINYBLOB", "BLOB", "MEDIUMBLOB",
        "LONGBLOB"))
      assert(MariaDbDialect.widen(t).contains(BinaryType), t)
  }

  // ---- getCatalystType plumbing -----------------------------------------
  test("getCatalystType honors the UNSIGNED suffix invisible in sqlType") {
    // MariaDB Connector/J reports TINYINT UNSIGNED with sqlType TINYINT;
    // only the type NAME carries the suffix.
    assert(MariaDbDialect.getCatalystType(Types.TINYINT, "TINYINT UNSIGNED", 3, md)
      .contains(ShortType))
    assert(MariaDbDialect.getCatalystType(Types.BIGINT, "BIGINT UNSIGNED", 20, md)
      .contains(DecimalType(20, 0)))
  }

  test("BIT(1) keeps the generic boolean mapping; BIT(n>1) widens to Long") {
    assert(MariaDbDialect.getCatalystType(Types.BIT, "BIT", 1, md).isEmpty)
    // an n-bit field does not fit a Boolean — stock MySQLDialect maps it
    // to LongType and so do we (ADVICE r8: None would fall through to
    // JdbcUtils' generic BIT→Boolean default and truncate).
    assert(MariaDbDialect.getCatalystType(Types.BIT, "BIT", 8, md).contains(LongType))
    assert(MariaDbDialect.getCatalystType(Types.BIT, "BIT", 64, md).contains(LongType))
  }

  test("identifiers are backtick-quoted (MariaDB default sql_mode has no ANSI_QUOTES)") {
    assert(MariaDbDialect.quoteIdentifier("col1") == "`col1`")
    // embedded backticks are doubled, never left to terminate the quote
    assert(MariaDbDialect.quoteIdentifier("we`ird") == "`we``ird`")
  }

  // ---- write-side inverse (S6 copy direction) ---------------------------
  test("getJDBCType picks the narrowest MariaDB type per Catalyst type") {
    def ddl(dt: DataType): String = MariaDbDialect.getJDBCType(dt).get.databaseTypeDefinition
    assert(ddl(ByteType) == "TINYINT")
    assert(ddl(ShortType) == "SMALLINT")
    assert(ddl(IntegerType) == "INT")
    assert(ddl(LongType) == "BIGINT")
    assert(ddl(FloatType) == "FLOAT")
    assert(ddl(DoubleType) == "DOUBLE")
    assert(ddl(BooleanType) == "BIT(1)")
    assert(ddl(StringType) == "LONGTEXT")
    assert(ddl(BinaryType) == "BLOB")
    assert(ddl(TimestampType) == "DATETIME")
    assert(ddl(DateType) == "DATE")
  }

  // ---- URL gating + registration ----------------------------------------
  test("canHandle gates on jdbc:mariadb only (mysql stays with the stock dialect)") {
    assert(MariaDbDialect.canHandle("jdbc:mariadb://host:3306/db"))
    assert(MariaDbDialect.canHandle("JDBC:MariaDB://host/db"))
    // jdbc:mysql is deliberately NOT claimed: Spark's stock MySQLDialect
    // already widens unsigned types and carries MySQL-specific overrides
    // (query building, listSchemas, classifyException) we'd displace.
    assert(!MariaDbDialect.canHandle("jdbc:mysql://host:3306/db"))
    assert(!MariaDbDialect.canHandle("jdbc:derby:memory:x;create=true"))
    assert(!MariaDbDialect.canHandle("jdbc:postgresql://host/db"))
  }

  test("register is idempotent") {
    MariaDbDialect.register()
    MariaDbDialect.register() // second registration must not throw or stack
  }
}
