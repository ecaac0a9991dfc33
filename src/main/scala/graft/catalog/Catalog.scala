package graft.catalog

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.schema.ForeignKeyDef

/** Include/exclude set filter, mirroring the reference's `SetFilter`
  * (reference: db_transformer/helpers/collections/set_filter.py:12-28):
  * result = (v ∩ include) − exclude, where a None include means "all".
  */
final case class SetFilter[T](include: Option[Set[T]] = None, exclude: Set[T] = Set.empty[T]) {
  def apply(values: Set[T]): Set[T] = {
    val kept = include.fold(values)(values.intersect)
    kept.diff(exclude)
  }
}

/** Sidecar PK/FK registry. Spark catalogs carry no constraints
  * (reference relies on SQLAlchemy introspection,
  * db_transformer/db/db_inspector.py:135-146), so constraints live here and
  * are supplied by config, inference, or a schema-fixer hook.
  */
final case class ConstraintRegistry(
    primaryKeys: Map[String, Seq[String]] = Map.empty,
    foreignKeys: Map[String, Seq[ForeignKeyDef]] = Map.empty) {

  def primaryKey(table: String): Seq[String] = primaryKeys.getOrElse(table, Nil)
  def fks(table: String): Seq[ForeignKeyDef] = foreignKeys.getOrElse(table, Nil)

  /** Layered override, mirroring the reference's `schema_fixer` hooks that
    * inject FKs the database does not declare
    * (data/dataset_defaults/utils.py:19-23). */
  def withFk(table: String, fk: ForeignKeyDef): ConstraintRegistry =
    copy(foreignKeys = foreignKeys.updated(table, fks(table) :+ fk))

  def withPk(table: String, pk: Seq[String]): ConstraintRegistry =
    copy(primaryKeys = primaryKeys.updated(table, pk))
}

object ConstraintRegistry {
  /** Constraints of the driver test star schema (FIXTURES.md F-A). */
  val testdata: ConstraintRegistry = ConstraintRegistry(
    primaryKeys = Map(
      "region"    -> Seq("r_regionkey"),
      "nation"    -> Seq("n_nationkey"),
      "customer"  -> Seq("c_custkey"),
      "supplier"  -> Seq("s_suppkey"),
      "part"      -> Seq("p_partkey"),
      "orders"    -> Seq("o_orderkey"),
      "lineitem"  -> Seq("l_orderkey", "l_linenumber"),
      "events"    -> Seq("event_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id")),
    foreignKeys = Map(
      "nation"   -> Seq(ForeignKeyDef(Seq("n_regionkey"), "region", Seq("r_regionkey"))),
      "customer" -> Seq(ForeignKeyDef(Seq("c_nationkey"), "nation", Seq("n_nationkey"))),
      "supplier" -> Seq(ForeignKeyDef(Seq("s_nationkey"), "nation", Seq("n_nationkey"))),
      "orders"   -> Seq(ForeignKeyDef(Seq("o_custkey"), "customer", Seq("c_custkey"))),
      // streaming-shaped entity key (FIXTURES.md F-A: events join the graph)
      "events"   -> Seq(ForeignKeyDef(Seq("user_id"), "customer", Seq("c_custkey"))),
      "lineitem" -> Seq(
        ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey")),
        ForeignKeyDef(Seq("l_partkey"), "part", Seq("p_partkey")),
        ForeignKeyDef(Seq("l_suppkey"), "supplier", Seq("s_suppkey")))))
}

/** Database inspector over a directory of parquet tables (one
  * `<table>.parquet` per table), the test/ingest layout. Mirrors the
  * reference's `DBInspector` surface (db/db_inspector.py:109-146):
  * table listing with include/exclude filters, per-table columns and
  * physical types, PK/FK lookup (from the sidecar registry).
  *
  * Scale note: listing is a driver-side filesystem op; table reads are lazy
  * `spark.read.parquet` scans that keep Catalyst's predicate pushdown and
  * column pruning intact.
  */
final class ParquetCatalog(
    val spark: SparkSession,
    val dir: String,
    val constraints: ConstraintRegistry = ConstraintRegistry.testdata,
    val tableFilter: SetFilter[String] = SetFilter[String](),
    val columnFilters: Map[String, SetFilter[String]] = Map.empty) {

  /** S1: list tables (db_inspector.py:109-115). */
  def listTables(): Seq[String] = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hadoopConf)
    val found = fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .toSet
    tableFilter(found).toSeq.sorted
  }

  def path(table: String): String = s"$dir/$table.parquet"

  /** S5: full-table scan (heterodata_builder.py:122-128). Lazy. */
  def table(name: String): DataFrame = spark.read.parquet(path(name))

  /** S2: columns + physical types (db_inspector.py:117-125). */
  def columns(name: String): StructType = {
    val full = table(name).schema
    columnFilters.get(name) match {
      case None    => full
      case Some(f) =>
        val kept = f(full.fieldNames.toSet)
        StructType(full.fields.filter(fld => kept.contains(fld.name)))
    }
  }

  /** S3 (db_inspector.py:135-136). */
  def primaryKey(name: String): Seq[String] = constraints.primaryKey(name)

  /** S4 (db_inspector.py:138-146). */
  def foreignKeys(name: String): Seq[ForeignKeyDef] = constraints.fks(name)

  /** All (table, column) pairs after filtering — the analyzer's omit
    * universe (db_inspector.py:72-83). */
  def tableColumnPairs(): Seq[(String, String)] =
    listTables().flatMap(t => columns(t).fieldNames.map(t -> _))

  /** S6: copy the database to another parquet directory, constraints
    * travelling as sidecar schema JSON (helpers/database.py:12-55 recreates
    * constraints then bulk-inserts; here: parquet rewrite, which preserves
    * types and is distributed). Per-table write jobs are submitted
    * CONCURRENTLY (the a5 prewarm device): a single table's rewrite cannot
    * fill the cluster through planning and commit, so back-to-back writes
    * of a many-table catalog leave cores idle — the scheduler interleaves
    * them, and the copy completes in the widest table's time, not the sum.
    * Each table targets its own directory, so commits never interfere. */
  def copyTo(outDir: String): Unit = {
    val tables = listTables()
    if (tables.sizeIs <= 1) {
      tables.foreach(t => table(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet"))
      return
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(tables.size, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val done = scala.concurrent.Future.sequence(tables.map { t =>
        scala.concurrent.Future {
          table(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
        }
      })
      scala.concurrent.Await.result(done, scala.concurrent.duration.Duration.Inf)
      ()
    } finally { pool.shutdown() }
  }

  /** Ordered map of every table's DataFrame (lazy plans). */
  def allTables(): ListMap[String, DataFrame] =
    ListMap(listTables().map(t => t -> table(t)): _*)

  /** Structural schema derived purely from the constraint registry: every
    * column becomes Omit with `key` flagging PK membership — enough for
    * graph building / BFS (which need only PKs + FKs), no data statistics.
    * The full semantic schema comes from
    * [[graft.analyze.SchemaAnalyzer.guessSchema]]. */
  def constraintSchema(): graft.schema.Schema = {
    import graft.schema.{OmitColumnDef, Schema => GSchema, TableSchema}
    GSchema(ListMap(listTables().map { t =>
      val pk = primaryKey(t).toSet
      val cols = ListMap(columns(t).fieldNames.map(c =>
        c -> (OmitColumnDef(key = pk.contains(c)): graft.schema.ColumnDef)): _*)
      t -> TableSchema(cols, foreignKeys(t))
    }: _*))
  }
}
