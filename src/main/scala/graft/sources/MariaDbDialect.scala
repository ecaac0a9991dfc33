package graft.sources

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** §1.2 physical-type ingest map: MariaDB column types → Spark Catalyst
  * types, the Spark-dialect restatement of the reference's
  * `MARIADB_TO_PANDAS` dtype table (db_transformer/data/ctu_dataset.py:
  * 369-401, applied at read time in `ctu_dataset.py:280-297`).
  *
  * The reference lands each MariaDB type on a pandas nullable dtype;
  * pandas HAS unsigned dtypes (UInt8..UInt64) so its map is one-to-one.
  * Spark has no unsigned integral types, so every unsigned type is
  * **widened one step** to the narrowest signed type that holds its full
  * range (SURVEY.md §1.2): TINYINT UNSIGNED → Short, SMALLINT UNSIGNED →
  * Int, MEDIUMINT/INT UNSIGNED → Long, BIGINT UNSIGNED → Decimal(20,0).
  * Two deliberate departures from the reference, both documented in the
  * survey:
  *
  *  - DECIMAL stays `DecimalType(p,s)` (the stock JDBC mapping; we return
  *    None and let Spark read the declared precision/scale) instead of the
  *    reference's lossy float64 cast (`ctu_dataset.py:384`) — exactness is
  *    kept until feature conversion ([[graft.convert.Converters]] casts to
  *    double there, matching the reference's end state).
  *  - TIME has no Catalyst type; the dialect leaves it to the stock
  *    TIME→Timestamp read and the seconds-since-midnight conversion
  *    happens at feature time (SURVEY §1.2 TimeColumnDef row), again
  *    value-preserving where the reference is representation-eager.
  *
  * Everything else is one-to-one with the reference table: FLOAT/DOUBLE →
  * Float/Double, CHAR/VARCHAR/TEXT/MEDIUMTEXT/LONGTEXT → String, ENUM and
  * SET → String (MariaDB's wire form; ENUM's categorical-ness is semantic
  * typing, assigned by [[graft.analyze.SchemaAnalyzer]], not physical),
  * BINARY/VARBINARY/BLOB/MEDIUMBLOB/LONGBLOB → Binary,
  * DATE → Date, DATETIME/TIMESTAMP → Timestamp.
  *
  * Registered (idempotently) for `jdbc:mariadb:` URLs only. `jdbc:mysql:`
  * is deliberately left to Spark's stock MySQLDialect, which already
  * performs the identical unsigned widening and additionally carries
  * MySQL-specific overrides this dialect has no reason to reimplement
  * (OFFSET-without-LIMIT query building, getUpdateColumnTypeQuery,
  * listSchemas, classifyException). Registering over it would trade a
  * complete dialect for a partial one with no type-mapping gain.
  */
object MariaDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:mariadb:")

  /** MariaDB's default sql_mode has no ANSI_QUOTES: a double-quoted
    * identifier is a string LITERAL, so the inherited ANSI quoting would
    * make `SELECT "col" FROM t` return the column name in every row.
    * Backtick-quote exactly like the stock MySQLDialect. */
  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** The widening table keyed on the driver-reported type name (MariaDB
    * Connector/J reports unsigned columns as e.g. "TINYINT UNSIGNED").
    * Pure and total over the reference's 28-entry map: returns None for
    * types where Spark's stock JDBC mapping is already the survey's
    * target (DECIMAL, DATE/TIME/DATETIME/TIMESTAMP and the string/binary
    * families) so declared precision/scale/size metadata is preserved. */
  def widen(typeName: String): Option[DataType] =
    typeName.trim.toUpperCase(Locale.ROOT) match {
      case "TINYINT"                                      => Some(ByteType)
      case "SMALLINT"                                     => Some(ShortType)
      case "MEDIUMINT" | "INT" | "INTEGER"                => Some(IntegerType)
      case "BIGINT"                                       => Some(LongType)
      case "TINYINT UNSIGNED"                             => Some(ShortType)
      case "SMALLINT UNSIGNED"                            => Some(IntegerType)
      case "MEDIUMINT UNSIGNED" | "INT UNSIGNED" |
           "INTEGER UNSIGNED"                             => Some(LongType)
      case "BIGINT UNSIGNED"                              => Some(DecimalType(20, 0))
      case "FLOAT"                                        => Some(FloatType)
      case "FLOAT UNSIGNED"                               => Some(FloatType)
      case "DOUBLE" | "DOUBLE UNSIGNED"                   => Some(DoubleType)
      case "CHAR" | "VARCHAR" | "TINYTEXT" | "TEXT" |
           "MEDIUMTEXT" | "LONGTEXT" | "ENUM" | "SET"     => Some(StringType)
      case "BINARY" | "VARBINARY" | "TINYBLOB" | "BLOB" |
           "MEDIUMBLOB" | "LONGBLOB"                      => Some(BinaryType)
      case _                                              => None
    }

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    // BIT(1): JdbcUtils' generic BIT→Boolean default is correct. BIT(n>1)
    // is an n-bit field — Boolean would truncate it, so map to Long like
    // the stock MySQLDialect. Everything else goes by name so the UNSIGNED
    // suffix (invisible in sqlType) is honored.
    if (sqlType == Types.BIT) { if (size > 1) Some(LongType) else None }
    else widen(typeName)

  /** Write-side DDL map for [[JdbcSource.writeTable]] (S6 copy direction,
    * reference helpers/database.py:12-55): the inverse of the read map,
    * choosing the narrowest MariaDB type that holds each Catalyst type. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case ByteType      => Some(JdbcType("TINYINT", Types.TINYINT))
    case ShortType     => Some(JdbcType("SMALLINT", Types.SMALLINT))
    case IntegerType   => Some(JdbcType("INT", Types.INTEGER))
    case LongType      => Some(JdbcType("BIGINT", Types.BIGINT))
    case FloatType     => Some(JdbcType("FLOAT", Types.FLOAT))
    case DoubleType    => Some(JdbcType("DOUBLE", Types.DOUBLE))
    case BooleanType   => Some(JdbcType("BIT(1)", Types.BIT))
    case StringType    => Some(JdbcType("LONGTEXT", Types.LONGVARCHAR))
    case BinaryType    => Some(JdbcType("BLOB", Types.BLOB))
    case TimestampType => Some(JdbcType("DATETIME", Types.TIMESTAMP))
    case DateType      => Some(JdbcType("DATE", Types.DATE))
    case _             => None
  }

  /** Idempotent global registration. `registerDialect` itself dedups
    * (it prepends after `filterNot(_ == dialect)`), so a single call is
    * atomic with respect to concurrent dialect resolution — no
    * unregister-first window where `jdbc:mariadb:` reads would resolve
    * to the generic fallback mapping. */
  def register(): Unit = JdbcDialects.registerDialect(this)
}
