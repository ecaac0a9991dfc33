package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.VectorAgg
import graft.analyze.{Behavior, DistinctCounter, Olap, Quantiles}
import graft.functions.ZOrder
import graft.catalog.{ConstraintRegistry, ParquetCatalog}
import graft.convert.{CategoricalCodes, Converters, TableConverter}
import graft.dedup.Dedup
import graft.features.Features
import graft.functions.Normalizers
import graft.graph.RelGraph
import graft.joins.TemporalJoins
import graft.multimodal.Multimodal
import graft.sample.{BfsSampler, Sampling}
import graft.schema._
import graft.similarity.{Ivf, Quantize, Similarity}
import graft.streaming.EventStream
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the training-data-pipeline
  * additions) is registered here as a named query over the driver test
  * tables, with matching DuckDB oracle SQL where SQL-expressible.
  * Column names/types are aligned on both sides (the driver's compare
  * sorts columns by name and hashes values); floating aggregates are
  * rounded identically on both sides; every query carries an ORDER BY over
  * its full output column list so row order is deterministic under any
  * comparison scheme.
  */
object SparkEntry {

  /** The driver's events table is written with nanosecond-precision parquet
    * timestamps, which Spark only reads via the nanos-as-long legacy conf —
    * a runtime-mutable SQL conf, set here defensively so queries work on
    * any session the driver hands us. [[events]] converts back to a real
    * timestamp column (microsecond floor). */
  private def nanosOk(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // oracle parity: DuckDB's epoch()/hour() are TZ-naive; pin the session
    // zone so unix_timestamp/hour/window agree on any driver-provided session
    s.conf.set("spark.sql.session.timeZone", "UTC")
    // parquet timestamps without isAdjustedToUTC (naive timestamp[us]) must
    // read as TIMESTAMP (LTZ, = the pinned UTC session zone), not
    // TIMESTAMP_NTZ — every downstream instant function (unix_micros,
    // window, unix_timestamp) takes LTZ, and with the session zone pinned
    // the wall-clock values match DuckDB's naive reading exactly
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    s
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    nanosOk(s).read.parquet(s"$dir/$name.parquet")

  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, not `/`: ns-epoch longs exceed 2^53, so double
        // division can shift the resulting microsecond by 1. `div`
        // truncates toward zero, which equals the microsecond floor only
        // for POST-1970 timestamps — the testdata contract (pre-1970
        // events would need floor division to match DuckDB)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  private def catalog(s: SparkSession, dir: String): ParquetCatalog =
    new ParquetCatalog(nanosOk(s), dir, ConstraintRegistry.testdata)

  // Scratch space for queries that materialize through a sink (s6 copy,
  // s7 schema cache, orc1), deleted recursively at JVM exit. (Deletion
  // can't happen inside the query — the returned plan still reads it.)
  // One scratch ROOT per JVM (single shutdown hook); sink queries write
  // under per-query subdirs, so a re-executed query overwrites its own
  // subdir instead of accumulating a fresh catalog-sized copy (and a
  // fresh hook thread) per execution — disk use within one long-lived
  // JVM is bounded by one copy per sink query.
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(root.toFile)
    }))
    root
  }

  private def scratchDir(name: String): String = {
    val dir = scratchRoot.resolve(name)
    java.nio.file.Files.createDirectories(dir)
    dir.toFile.getAbsolutePath
  }

  /** One query definition: Spark plan + optional DuckDB oracle SQL. */
  private final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  // ====================================================================
  // §2.1 scans / sources  +  §2.4 counting aggregates
  // ====================================================================

  private val allTables = Seq("customer", "documents", "embeddings", "events",
    "lineitem", "nation", "orders", "part", "region", "supplier")

  private val qScan = Q("s5_scan_region",
    (s, d) => t(s, d, "region").orderBy("r_regionkey"),
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  private val qCounts = Q("s9_table_counts",
    (s, d) => allTables.map { n =>
      t(s, d, n).agg(count(lit(1)).as("n")).select(lit(n).as("table_name"), col("n"))
    }.reduce(_.unionAll(_)).orderBy("table_name"),
    Some(allTables.map(n => s"SELECT '$n' AS table_name, count(*) AS n FROM $n")
      .mkString("", " UNION ALL ", " ORDER BY table_name")))

  /** S6 database copy under the driver gate: copy the whole catalog to a
    * fresh parquet directory, then read counts and schema widths FROM THE
    * COPY — the oracle computes them from the originals, so equality
    * proves the distributed rewrite lost no rows and no columns. */
  private val qCopy = Q("s6_copy_roundtrip",
    (s, d) => {
      val out = scratchDir("graft_copy")
      catalog(s, d).copyTo(out)
      val copied = catalog(nanosOk(s), out)
      copied.listTables().map { n =>
        val df = copied.table(n)
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("table_name"), col("n_rows"),
            lit(df.columns.length).as("n_cols"))
      }.reduce(_.unionAll(_)).orderBy("table_name")
    },
    Some {
      val nCols = Map("region" -> 2, "nation" -> 3, "customer" -> 5,
        "supplier" -> 4, "part" -> 6, "orders" -> 6, "lineitem" -> 11,
        "events" -> 6, "documents" -> 5, "embeddings" -> 3)
      allTables.map(n =>
          s"SELECT '$n' AS table_name, count(*) AS n_rows, ${nCols(n)} AS n_cols FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY table_name")
    })

  /** Full TPC-H Q1 shape: the classic pricing-summary aggregate battery —
    * one scan, map-side partial aggregation, 3-column read schema. */
  private val qAgg1 = Q("q1_agg",
    (s, d) => {
      val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(disc), 2).as("sum_disc_price"),
          round(sum(disc * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity),4) AS sum_qty,
      round(sum(l_extendedprice),2) AS sum_base_price,
      round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      round(avg(l_quantity),4) AS avg_qty,
      round(avg(l_extendedprice),4) AS avg_price,
      round(avg(l_discount),6) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** TPC-H Q5-shaped multi-join analytic: 6-table star join with selective
    * filters — Catalyst broadcasts every dimension (region/nation/customer/
    * supplier), the two fact-side joins shuffle on their keys, and the
    * revenue aggregate combines map-side. The showcase "would this plan
    * survive 100×" query. */
  private val qQ5 = Q("q5_local_supplier_revenue",
    (s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(rev), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  // ====================================================================
  // §2.2 projections / filters / predicates
  // ====================================================================

  private val qProject = Q("p1_project_fk",
    (s, d) => t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey"),
    Some("""SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
      ORDER BY l_orderkey, l_partkey, l_suppkey"""))

  private val qNotNull = Q("p4_notnull_count",
    (s, d) => t(s, d, "orders").agg(count(col("o_custkey")).as("n_nonnull")),
    Some("SELECT count(o_custkey) AS n_nonnull FROM orders"))

  private val qInList = Q("p5_in_filter",
    (s, d) => t(s, d, "nation").filter(col("n_regionkey").isin(0, 2))
      .orderBy("n_nationkey"),
    Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
      WHERE n_regionkey IN (0, 2) ORDER BY n_nationkey"""))

  private val qOffset = Q("p6_offset_row",
    (s, d) => t(s, d, "orders").orderBy("o_orderkey").offset(41).limit(1),
    Some("SELECT * FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 41"))

  // ====================================================================
  // §2.3 joins / graph construction
  // ====================================================================

  private val qRowId = Q("w1_row_id",
    (s, d) => RelGraph.withRowId(t(s, d, "nation"), Seq("n_nationkey"))
      .select(col("n_nationkey"), col("n_name"), col(RelGraph.RowId).as("row_id"))
      .orderBy("row_id"),
    Some("""SELECT n_nationkey, n_name,
      row_number() OVER (ORDER BY n_nationkey) - 1 AS row_id
      FROM nation ORDER BY row_id"""))

  private val qFkEdges = Q("j1_fk_edges",
    (s, d) => {
      val o = RelGraph.withRowId(t(s, d, "orders").select("o_orderkey", "o_custkey"),
        Seq("o_orderkey"))
      val c = RelGraph.withRowId(t(s, d, "customer").select("c_custkey"), Seq("c_custkey"))
      RelGraph.fkEdges(o, c, ForeignKeyDef(Seq("o_custkey"), "customer", Seq("c_custkey")))
        .orderBy("src_id", "dst_id")
    },
    Some("""WITH o AS (SELECT o_custkey, row_number() OVER (ORDER BY o_orderkey)-1 AS src_id FROM orders),
      c AS (SELECT c_custkey, row_number() OVER (ORDER BY c_custkey)-1 AS dst_id FROM customer)
      SELECT src_id, dst_id FROM o JOIN c ON o.o_custkey = c.c_custkey
      ORDER BY src_id, dst_id"""))

  /** J6 under the driver gate: the nation→region FK graph with self-loop
    * edge types added (`T.AddSelfLoops()`), every typed edge emitted —
    * self loops are each row's own id on both ends, so the oracle is the
    * FK join plus one identity edge set per node type. */
  private val qSelfLoops = Q("j6_self_loops",
    (s, d) => {
      val n = RelGraph.withRowId(
        t(s, d, "nation").select("n_nationkey", "n_regionkey"), Seq("n_nationkey"))
      val r = RelGraph.withRowId(
        t(s, d, "region").select("r_regionkey"), Seq("r_regionkey"))
      val g = RelGraph(
        scala.collection.immutable.ListMap("nation" -> n, "region" -> r),
        scala.collection.immutable.ListMap(graft.graph.EdgeType("nation", "fk", "region") ->
          RelGraph.fkEdges(n, r,
            ForeignKeyDef(Seq("n_regionkey"), "region", Seq("r_regionkey")))))
        .withSelfLoops
      g.edges.toSeq.sortBy(_._1.toString).map { case (et, e) =>
        e.select(lit(et.toString).as("edge_type"),
          col("src_id"), col("dst_id"))
      }.reduce(_.unionAll(_)).orderBy("edge_type", "src_id", "dst_id")
    },
    Some("""WITH n AS (SELECT n_regionkey, row_number() OVER (ORDER BY n_nationkey)-1 AS id FROM nation),
      r AS (SELECT r_regionkey, row_number() OVER (ORDER BY r_regionkey)-1 AS id FROM region)
      SELECT * FROM (
        SELECT 'nation->fk->region' AS edge_type, n.id AS src_id, r.id AS dst_id
          FROM n JOIN r ON n.n_regionkey = r.r_regionkey
        UNION ALL SELECT 'nation->self->nation', id, id FROM n
        UNION ALL SELECT 'region->self->region', id, id FROM r) t
      ORDER BY edge_type, src_id, dst_id"""))

  /** F14 under the driver gate: synthetic timestamps spanning ±1268 years
    * (pure epoch-µs arithmetic, no calendar math — cross-engine exact)
    * clamped to the pandas-representable range. */
  private val qTsClamp = Q("f14_ts_clamp",
    (s, d) => t(s, d, "orders")
      .select(col("o_orderkey"),
        timestamp_micros((pmod(col("o_orderkey"), lit(41)) - 20)
          * 2000000000000000L).as("__ts"))
      .select(col("o_orderkey"),
        unix_micros(graft.convert.Converters.clampTimestamp(col("__ts")))
          .as("clamped_us"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        epoch_us(least(greatest(
          make_timestamp((o_orderkey % 41 - 20) * 2000000000000000),
          TIMESTAMP '1677-09-23 00:00:00'),
          TIMESTAMP '2262-04-10 00:00:00')) AS clamped_us
      FROM orders ORDER BY o_orderkey"""))

  /** P7 under the driver gate: a graph whose `region` node type is
    * filtered empty — pruning must drop the type AND its incident edge
    * type, leaving only `nation`; the surviving structure is the oracle. */
  private val qPruneEmpty = Q("p7_prune_empty",
    (s, d) => {
      val n = RelGraph.withRowId(
        t(s, d, "nation").select("n_nationkey", "n_regionkey"), Seq("n_nationkey"))
      val r = RelGraph.withRowId(
        t(s, d, "region").filter(col("r_regionkey") < 0).select("r_regionkey"),
        Seq("r_regionkey"))
      val g = RelGraph(
        scala.collection.immutable.ListMap("nation" -> n, "region" -> r),
        scala.collection.immutable.ListMap(graft.graph.EdgeType("nation", "fk", "region") ->
          RelGraph.fkEdges(n, r,
            ForeignKeyDef(Seq("n_regionkey"), "region", Seq("r_regionkey")))))
        .pruneEmpty
      val s2 = s
      import s2.implicits._
      g.nodes.keys.toSeq.sorted
        .map(tn => (tn, g.edges.count(_._1.src == tn).toLong))
        .toDF("table_name", "n_outgoing_edge_types")
        .orderBy("table_name")
    },
    Some("""SELECT 'nation' AS table_name, 0::BIGINT AS n_outgoing_edge_types"""))

  /** S7 under the driver gate: the schema sidecar written to a local
    * cache as JSON, re-read, and reported — the structure that survives
    * the round trip (tables, column counts, PK, FK fan-out) is restated
    * by the oracle from the known registry, so a serialization drop would
    * hash-mismatch. */
  private val qSchemaCache = Q("s7_schema_cache",
    (s, d) => {
      val schema = catalog(s, d).constraintSchema()
      val cache = java.nio.file.Paths.get(scratchDir("graft_schema"))
        .resolve("schema.json")
      java.nio.file.Files.write(cache,
        graft.schema.Schema.toJson(schema).getBytes("UTF-8"))
      val back = graft.schema.Schema.fromJson(
        new String(java.nio.file.Files.readAllBytes(cache), "UTF-8"))
      val s2 = s
      import s2.implicits._
      back.tables.toSeq.map { case (tn, ts) =>
        (tn, ts.columns.size.toLong, ts.primaryKey.mkString(","),
          ts.foreignKeys.size.toLong)
      }.toDF("table_name", "n_cols", "pk", "n_fks").orderBy("table_name")
    },
    Some("""SELECT * FROM (VALUES
        ('customer', 5::BIGINT, 'c_custkey', 1::BIGINT),
        ('documents', 5::BIGINT, 'doc_id', 0::BIGINT),
        ('embeddings', 3::BIGINT, 'vec_id', 0::BIGINT),
        ('events', 6::BIGINT, 'event_id', 1::BIGINT),
        ('lineitem', 11::BIGINT, 'l_orderkey,l_linenumber', 3::BIGINT),
        ('nation', 3::BIGINT, 'n_nationkey', 1::BIGINT),
        ('orders', 6::BIGINT, 'o_orderkey', 1::BIGINT),
        ('part', 6::BIGINT, 'p_partkey', 0::BIGINT),
        ('region', 2::BIGINT, 'r_regionkey', 0::BIGINT),
        ('supplier', 4::BIGINT, 's_suppkey', 1::BIGINT))
      AS t(table_name, n_cols, pk, n_fks) ORDER BY table_name"""))

  /** W7 under the driver gate: the reference's batch-size heuristic
    * applied to every table's live row count; the oracle restates the
    * formula in SQL (log2 of an integer ratio never lands on an exact
    * .5, so round() ties can't diverge cross-engine). */
  private val qBatchHeuristic = Q("w7_batch_heuristic",
    (s, d) => {
      val counts = allTables.map(n => n -> t(s, d, n).count())
      val s2 = s
      import s2.implicits._
      counts.map { case (n, c) =>
        (n, c, graft.pipeline.Blueprint.batchSizeHeuristic(c))
      }.toDF("table_name", "n", "batch_size")
        .orderBy("table_name")
    },
    Some(allTables.map(n =>
        s"""SELECT '$n' AS table_name, count(*) AS n,
          LEAST(16384, GREATEST(16,
            POWER(2, ROUND(LOG2(count(*) / 500.0)))))::INT AS batch_size
        FROM $n""")
      .mkString("", " UNION ALL ", " ORDER BY table_name")))

  private val qSemi = Q("j3_semi_frontier",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").orderBy("c_custkey")
    },
    Some("""SELECT * FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
      ORDER BY c_custkey"""))

  /** Full graph build (W1+J1+J5+A12): node row counts + edge counts per FK
    * edge type, forward and reversed. */
  private def graphStats(s: SparkSession, d: String): DataFrame = {
    val cat = catalog(s, d)
    val schema = cat.constraintSchema()
    // graph stats only need keys: project each table to PK ∪ FK ∪ referenced
    // columns before the row-id pass (row counts and edge joins are invariant
    // to the projection, and zipWithIndex width is pure cost)
    val keyCols: Map[String, Seq[String]] = schema.tables.map { case (tn, ts) =>
      val own = ts.primaryKey ++ ts.foreignKeys.flatMap(_.columns)
      val referenced = schema.tables.values.flatMap(_.foreignKeys)
        .filter(_.refTable == tn).flatMap(_.refColumns)
      tn -> (own ++ referenced).distinct
    }.toMap
    val tables = cat.allTables().map { case (tn, df) =>
      val cols = keyCols(tn) match { case Nil => df.columns.take(1).toSeq; case c => c }
      tn -> df.select(cols.map(col): _*)
    }
    // restrict the sidecar schema to the projected columns so PK-order holds
    val slim = Schema(schema.tables.map { case (tn, ts) =>
      tn -> ts.copy(columns = ts.columns.filter { case (c, _) => tables(tn).columns.contains(c) })
    })
    // cached nodes: each table's row-id lineage executes once across the
    // 10 node-count branches + 8 edge joins; reverse-edge counts are derived
    // from forward counts inside stats (transpose preserves cardinality).
    // The 26-row result is eagerly localCheckpoint-ed so the node cache can
    // be released before returning — the query leaks no cache entries.
    val g = RelGraph.build(slim, tables.toMap).withCachedNodes
    try g.stats(s, includeReverse = true).localCheckpoint(true).orderBy("entity", "kind")
    finally { g.unpersistNodes(); () }
  }

  private val graphEdgeJoins = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"))

  private val qGraphStats = Q("a12_graph_stats",
    graphStats,
    Some {
      val nodes = allTables.map(n =>
        s"SELECT '$n' AS entity, 'node_rows' AS kind, count(*) AS n FROM $n")
      val fwd = graphEdgeJoins.map { case (src, fkc, dst, refc) =>
        s"SELECT '$src->$fkc->$dst', 'edges', count(*) FROM $src JOIN $dst ON $fkc = $refc"
      }
      val rev = graphEdgeJoins.map { case (src, fkc, dst, refc) =>
        s"SELECT '$dst->rev_$fkc->$src', 'edges', count(*) FROM $src JOIN $dst ON $fkc = $refc"
      }
      (nodes ++ fwd ++ rev).mkString("", " UNION ALL ", " ORDER BY entity, kind")
    })

  // ====================================================================
  // §2.4 A5: statistics-driven schema autodetection — the reference's core
  // operator. The oracle SQL is GENERATED from the same decision tree:
  // per-column stats (non-null count, NULL-inclusive distinct) computed by
  // DuckDB from the data, thresholds inline, and the name heuristics
  // (ID-regex / numeric-name / plural) evaluated here through the very same
  // Scala regexes and embedded as literals (they depend only on the column
  // name, not the data).
  // ====================================================================

  /** Physical kind of each testdata column as SPARK sees it (events.ts is a
    * native timestamp[us] since the 2026-08-13 testdata regeneration; under
    * the pre-regeneration ns data it read as LongType via nanos-as-long).
    * Static fixture knowledge, like the table names in every other oracle. */
  private[graft] val physicalKinds: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "int", "c_name" -> "str", "c_nationkey" -> "int",
      "c_acctbal" -> "num", "c_mktsegment" -> "str"),
    "documents" -> Seq("doc_id" -> "int", "text" -> "str", "lang" -> "str",
      "source" -> "str", "n_chars" -> "int"),
    "embeddings" -> Seq("vec_id" -> "int", "embedding" -> "other", "label" -> "int"),
    "events" -> Seq("event_id" -> "int", "ts" -> "datetime", "user_id" -> "int",
      "event_type" -> "str", "value" -> "num", "props" -> "str"),
    "lineitem" -> Seq("l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
      "l_linenumber" -> "int", "l_quantity" -> "num", "l_extendedprice" -> "num",
      "l_discount" -> "num", "l_tax" -> "num", "l_returnflag" -> "str",
      "l_linestatus" -> "str", "l_shipdate" -> "datetime"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "str", "n_regionkey" -> "int"),
    "orders" -> Seq("o_orderkey" -> "int", "o_custkey" -> "int", "o_orderstatus" -> "str",
      "o_totalprice" -> "num", "o_orderdate" -> "datetime", "o_orderpriority" -> "str"),
    "part" -> Seq("p_partkey" -> "int", "p_name" -> "str", "p_brand" -> "str",
      "p_type" -> "str", "p_size" -> "int", "p_retailprice" -> "num"),
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "str"),
    "supplier" -> Seq("s_suppkey" -> "int", "s_name" -> "str", "s_nationkey" -> "int",
      "s_acctbal" -> "num"))

  private def analyzerOracleSql: String = {
    import graft.analyze.{SchemaAnalyzer => SA}
    val reg = ConstraintRegistry.testdata
    val parts = physicalKinds.toSeq.sortBy(_._1).flatMap { case (tn, cols) =>
      val pk = reg.primaryKey(tn)
      val fkCols = reg.fks(tn).filter(_.columns.length == 1).flatMap(_.columns).toSet
      cols.map { case (cn, kind) =>
        val key = pk.contains(cn)
        def fixed(cd: String) =
          s"SELECT '$tn' AS table_name, '$cn' AS column_name, '$cd' AS coldef, " +
            s"$key AS is_key, CAST(-1 AS BIGINT) AS cardinality"
        if (pk == Seq(cn)) fixed("omit")            // single-column PK
        else if (fkCols.contains(cn)) fixed("omit") // non-composite FK member
        else kind match {
          case "num"      => fixed("numeric")
          case "datetime" => fixed("datetime")
          case "other"    => fixed("omit")          // no heuristic applies
          case intOrStr =>
            val idName = SA.IdNameRegex.findFirstIn(cn).isDefined
            val hi = if (idName) "omit" else if (intOrStr == "int") "numeric" else "text"
            val lo =
              if (intOrStr == "int" &&
                (SA.CommonNumericNameRegex.findFirstIn(cn).isDefined || SA.isPluralName(cn)))
                "numeric"
              else "categorical"
            s"""SELECT '$tn' AS table_name, '$cn' AS column_name,
               CASE WHEN nn = 0 THEN 'omit'
                    WHEN card::DOUBLE / nn > ${SA.IgnoreThreshold} OR card > ${SA.MaxCardinality} THEN '$hi'
                    ELSE '$lo' END AS coldef,
               $key AS is_key,
               CASE WHEN coldef = 'categorical' THEN card ELSE CAST(-1 AS BIGINT) END AS cardinality
               FROM (SELECT count("$cn") AS nn,
                 (SELECT count(*) FROM (SELECT DISTINCT "$cn" FROM $tn)) AS card FROM $tn)"""
        }
      }
    }
    parts.mkString("", " UNION ALL ", " ORDER BY table_name, column_name")
  }

  private val qAnalyze = Q("a5_schema_analyze",
    (s, d) => new graft.analyze.SchemaAnalyzer(catalog(s, d)).guessSchemaDF()
      .orderBy("table_name", "column_name"),
    Some(analyzerOracleSql))

  // ====================================================================
  // §2.4 aggregations
  // ====================================================================

  private val qDistinctNullInc = Q("a2_distinct_nullinc",
    (s, d) => t(s, d, "customer").agg(
      DistinctCounter.DbDistinct.expr(col("c_mktsegment"), null).as("dc_mktsegment"),
      DistinctCounter.DbDistinct.expr(col("c_nationkey"), null).as("dc_nationkey")),
    Some("""SELECT
      (SELECT count(*) FROM (SELECT DISTINCT c_mktsegment FROM customer)) AS dc_mktsegment,
      (SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer)) AS dc_nationkey"""))

  private val qDistinctNorm = Q("a3_distinct_normalized",
    (s, d) => t(s, d, "part").agg(
      count_distinct(Normalizers("strip_ci")(col("p_type"))).as("dc_type_strip_ci"),
      count_distinct(Normalizers("noop")(col("p_type"))).as("dc_type_noop"),
      // F5: collation-forced distinct (no value rewriting)
      count_distinct(Normalizers.collated(col("p_type"), "UTF8_LCASE")).as("dc_type_lcase")),
    Some("""SELECT count(DISTINCT lower(trim(p_type))) AS dc_type_strip_ci,
      count(DISTINCT p_type) AS dc_type_noop,
      count(DISTINCT lower(p_type)) AS dc_type_lcase FROM part"""))

  private val qCatStats = Q("a6_stats_categorical",
    (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val qNumStats = Q("a6_stats_numeric",
    (s, d) => t(s, d, "lineitem").agg(
      round(avg("l_quantity"), 4).as("avg_q"),
      round(stddev_samp("l_quantity"), 4).as("sd_q"),
      round(min("l_quantity"), 4).as("min_q"),
      round(max("l_quantity"), 4).as("max_q")),
    Some("""SELECT round(avg(l_quantity),4) AS avg_q, round(stddev_samp(l_quantity),4) AS sd_q,
      round(min(l_quantity),4) AS min_q, round(max(l_quantity),4) AS max_q FROM lineitem"""))

  /** A7: message passing — per-order elementwise reduce of each lineitem's
    * 3-component feature vector, via the partial-aggregating vector UDAF.
    *
    * For the MEAN variant the features are integer-valued (quantity /
    * linenumber): integer sums are exact in double, so the mean is
    * bit-identical regardless of summation order — the oracle hash cannot
    * be flipped by partial-aggregation merge order. (Sums/maxes of
    * cent-valued doubles are boundary-safe at 4-decimal rounding; means of
    * them are not — they land exactly on .xxx5.) */
  private def propagateQuery(aggr: String, intFeatures: Boolean)(
      s: SparkSession, d: String): DataFrame = {
    // project to the needed columns BEFORE row-id assignment: zipWithIndex
    // serializes rows through an RDD, so width there is pure cost
    val ord = RelGraph.withRowId(t(s, d, "orders").select("o_orderkey"), Seq("o_orderkey"))
    val li = RelGraph.withRowId(
      t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount"),
      Seq("l_orderkey", "l_linenumber"))
    val edges = RelGraph.fkEdges(li, ord, ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey")))
    val feat =
      if (intFeatures) array(col("l_quantity"), col("l_linenumber").cast("double"),
        col("l_quantity") + col("l_linenumber"))
      else array(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val nodes = li.select(col(RelGraph.RowId).as("id"), feat.as("feat"))
    VectorAgg.propagate(nodes, edges, "id", "feat", aggr)
      .select(col("dst_id"),
        round(element_at(col("feat"), 1), 4).as("f0"),
        round(element_at(col("feat"), 2), 4).as("f1"),
        round(element_at(col("feat"), 3), 4).as("f2"))
      .orderBy("dst_id")
  }

  private def propagateOracle(f: String, intFeatures: Boolean): String = {
    val (c0, c1, c2) =
      if (intFeatures) ("l_quantity", "l_linenumber", "l_quantity + l_linenumber")
      else ("l_quantity", "l_extendedprice", "l_discount")
    s"""WITH ord AS (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey)-1 AS dst_id FROM orders)
      SELECT dst_id, round($f($c0),4) AS f0, round($f($c1::DOUBLE),4) AS f1,
      round($f($c2),4) AS f2 FROM lineitem JOIN ord ON l_orderkey = o_orderkey
      GROUP BY dst_id ORDER BY dst_id"""
  }

  private val qPropSum = Q("a7_propagate_sum",
    propagateQuery("sum", intFeatures = false), Some(propagateOracle("sum", false)))
  private val qPropMean = Q("a8_scatter_mean",
    propagateQuery("mean", intFeatures = true), Some(propagateOracle("avg", true)))
  private val qPropMax = Q("a7_propagate_max",
    propagateQuery("max", intFeatures = false), Some(propagateOracle("max", false)))

  private val qAttn = Q("a9_softmax_attention",
    (s, d) => VectorAgg.softmaxAggregate(t(s, d, "lineitem"),
        "l_orderkey", "l_discount", "l_quantity")
      .select(col("l_orderkey"), round(col("l_quantity_attn"), 4).as("q_attn"))
      .orderBy("l_orderkey"),
    Some("""WITH s1 AS (SELECT l_orderkey, l_quantity,
        exp(l_discount - max(l_discount) OVER (PARTITION BY l_orderkey)) AS e FROM lineitem),
      s2 AS (SELECT l_orderkey, l_quantity, e / sum(e) OVER (PARTITION BY l_orderkey) AS w FROM s1)
      SELECT l_orderkey, round(sum(w * l_quantity),4) AS q_attn FROM s2
      GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** A9 vector form: softmax-weighted aggregation of whole message VECTORS
    * per group (nn/aggr/attention.py:10-41). Integer-valued vector
    * components (quantity / linenumber) keep the weighted sums
    * summation-order-stable at 4-decimal rounding, like a8. */
  private val qVecAttn = Q("a9b_vector_attention",
    (s, d) => VectorAgg.softmaxAggregateVec(
        t(s, d, "lineitem").withColumn("vec",
          array(col("l_quantity"), col("l_linenumber").cast("double"))),
        "l_orderkey", "l_discount", "vec")
      .select(col("l_orderkey"),
        round(element_at(col("vec_attn"), 1), 4).as("a0"),
        round(element_at(col("vec_attn"), 2), 4).as("a1"))
      .orderBy("l_orderkey"),
    Some("""WITH s1 AS (SELECT l_orderkey, l_quantity, l_linenumber,
        exp(l_discount - max(l_discount) OVER (PARTITION BY l_orderkey)) AS e FROM lineitem),
      s2 AS (SELECT l_orderkey, l_quantity, l_linenumber,
        e / sum(e) OVER (PARTITION BY l_orderkey) AS w FROM s1)
      SELECT l_orderkey, round(sum(w * l_quantity),4) AS a0,
        round(sum(w * l_linenumber),4) AS a1
      FROM s2 GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** Skew-safe two-phase aggregation — semantically identical to the plain
    * groupBy (which IS the oracle), but a hot key spreads over 32 salt
    * buckets before the final reduce. */
  private val qSalted = Q("sk1_salted_aggregate",
    (s, d) => graft.agg.Skew.saltedSumCount(t(s, d, "lineitem"),
        Seq("l_returnflag"), "l_quantity", buckets = 32)
      .select(col("l_returnflag"), round(col("sum_l_quantity"), 4).as("sum_q"), col("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, round(sum(l_quantity),4) AS sum_q, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val qImpute = Q("a11_impute_stats",
    (s, d) => {
      val c = t(s, d, "customer")
      val mean = VectorAgg.meanOf(c, "c_acctbal")
      val mode = VectorAgg.modeOf(c, "c_mktsegment").toString
      import s.implicits._
      Seq((math.rint(mean * 10000) / 10000, mode)).toDF("mean_acctbal", "mode_segment")
    },
    Some("""SELECT round(avg(c_acctbal),4) AS mean_acctbal,
      (SELECT c_mktsegment FROM customer GROUP BY c_mktsegment
       ORDER BY count(*) DESC, c_mktsegment LIMIT 1) AS mode_segment FROM customer"""))

  // ====================================================================
  // §2.5 window-like operators
  // ====================================================================

  private val qFactorize = Q("w3_factorize",
    (s, d) => CategoricalCodes.dictionary(t(s, d, "orders"),
        col("o_orderpriority"), Seq(col("o_orderkey")))
      .orderBy("code"),
    Some("""WITH f AS (SELECT o_orderpriority AS value, min(o_orderkey) AS fk
        FROM orders GROUP BY o_orderpriority)
      SELECT value, row_number() OVER (ORDER BY fk) - 1 AS code FROM f ORDER BY code"""))

  private val qEncode = Q("f17_cat_encode",
    (s, d) => {
      val o = t(s, d, "orders")
      val dict = CategoricalCodes.dictionary(o, col("o_orderpriority"), Seq(col("o_orderkey")))
      CategoricalCodes.encode(o, "o_orderpriority", dict, "code")
        .select(col("o_orderkey"), col("code")).orderBy("o_orderkey")
    },
    Some("""WITH f AS (SELECT o_orderpriority AS value, min(o_orderkey) AS fk
        FROM orders GROUP BY o_orderpriority),
      dict AS (SELECT value, row_number() OVER (ORDER BY fk) - 1 AS code FROM f)
      SELECT o_orderkey, code FROM orders JOIN dict ON o_orderpriority = value
      ORDER BY o_orderkey"""))

  private val qTopK = Q("w5_topk_neighbors",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
          row_number() OVER (PARTITION BY l_orderkey
            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 3 ORDER BY l_orderkey, l_linenumber"""))

  /** W6: train/validation split masks. The md5-coin portable variant is
    * registered (a pure function of the key — engine-reproducible, so the
    * full per-row mask is oracle-checked); the `rand(seed)` variant
    * ([[graft.sample.Sampling.withSplitMasks]]) remains as the
    * RNG-stream fast path, spec-pinned in SamplingSpec. hex4(0.2) =
    * 0x3333 — the same quantization constant on both sides. */
  private val qSplit = Q("w6_random_split",
    (s, d) => Sampling.withSplitMasksPortable(
        t(s, d, "customer").select(col("c_custkey")), "c_custkey", 0.2)
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
        substring(md5(c_custkey::VARCHAR || ':42'), 1, 4) < '3333' AS val_mask,
        NOT (substring(md5(c_custkey::VARCHAR || ':42'), 1, 4) < '3333') AS train_mask
      FROM customer ORDER BY c_custkey"""))

  // ====================================================================
  // §2.6 set operations
  // ====================================================================

  private val qUnionDistinct = Q("so1_union_distinct",
    (s, d) => t(s, d, "customer").select(col("c_nationkey").as("x"))
      .unionAll(t(s, d, "supplier").select(col("s_nationkey").as("x")))
      .distinct().orderBy("x"),
    Some("""SELECT DISTINCT x FROM (SELECT c_nationkey AS x FROM customer
      UNION ALL SELECT s_nationkey AS x FROM supplier) ORDER BY x"""))

  // ====================================================================
  // §2.7 scalar functions
  // ====================================================================

  private val qNormalizers = Q("f4_normalizers",
    (s, d) => t(s, d, "part").select(
      col("p_partkey"),
      Normalizers("ci")(col("p_name")).as("n_ci"),
      Normalizers("rstrip")(col("p_name")).as("n_rstrip"),
      Normalizers("strip")(col("p_name")).as("n_strip"),
      Normalizers("unidecode")(col("p_name")).as("n_unidecode"),
      Normalizers("unidecode_strip_ci")(col("p_name")).as("n_all"))
      .orderBy("p_partkey"),
    // test strings are ASCII: unidecode == identity on both sides
    Some("""SELECT p_partkey, lower(p_name) AS n_ci, rtrim(p_name) AS n_rstrip,
      trim(p_name) AS n_strip, p_name AS n_unidecode,
      lower(trim(p_name)) AS n_all FROM part ORDER BY p_partkey"""))

  private val qDateFns = Q("f8_f11_datetime",
    (s, d) => {
      val c = col("o_orderdate")
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(c).cast("bigint").as("y"),
        dayofyear(c).cast("bigint").as("doy"),
        (hour(c) * 3600L + minute(c) * 60L + second(c)).cast("bigint").as("ssm"),
        unix_timestamp(c).cast("bigint").as("epoch_s"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, year(o_orderdate) AS y, dayofyear(o_orderdate) AS doy,
      (3600*hour(o_orderdate) + 60*minute(o_orderdate)
        + floor(second(o_orderdate)))::BIGINT AS ssm,
      epoch(o_orderdate)::BIGINT AS epoch_s FROM orders ORDER BY o_orderkey"""))

  /** F12: multi-label binarization in long form — (row, label) pairs; the
    * wide 0/1 matrix is `pivot` on top of this (cardinality-bounded). */
  private val qMultiLabel = Q("f12_multilabel_long",
    (s, d) => t(s, d, "part")
      .select(col("p_partkey"), explode(split(col("p_type"), " ")).as("tag"))
      .distinct().orderBy("p_partkey", "tag"),
    Some("""SELECT DISTINCT p_partkey, unnest(string_split(p_type, ' ')) AS tag
      FROM part ORDER BY p_partkey, tag"""))

  /** F15 + F9 via the TableConverter (no all-same pruning here so the
    * column set is static for the oracle; pruning is spec-tested). */
  private val qTableConvert = Q("f15_table_convert",
    (s, d) => {
      val ts = TableSchema(scala.collection.immutable.ListMap(
        "o_orderkey" -> NumericColumnDef(key = true),
        "o_totalprice" -> NumericColumnDef(),
        "o_orderdate" -> DateTimeColumnDef()))
      val (out, _) = new TableConverter(skipAllSame = false)
        .convertTable(t(s, d, "orders"), ts)
      out.select(col("o_orderkey"), round(col("o_totalprice"), 4).as("o_totalprice"),
        col("o_orderdate_year"), col("o_orderdate_dayofyear"),
        col("o_orderdate_seconds_since_midnight"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey::DOUBLE AS o_orderkey,
      round(coalesce(o_totalprice, 0.0),4) AS o_totalprice,
      year(o_orderdate)::DOUBLE AS o_orderdate_year,
      dayofyear(o_orderdate)::DOUBLE AS o_orderdate_dayofyear,
      coalesce(3600*hour(o_orderdate) + 60*minute(o_orderdate)
        + floor(second(o_orderdate)), 0.0)::DOUBLE AS o_orderdate_seconds_since_midnight
      FROM orders ORDER BY o_orderkey"""))

  private val qLegacyDates = Q("f16_legacy_date_segments",
    (s, d) => {
      val str = date_format(col("o_orderdate"), "yyyy-MM-dd")
      val parts = Converters.LegacyDateConverter
        .convert("o_orderdate", DateColumnDef(), str)
      t(s, d, "orders").select(
        col("o_orderkey") +: parts.map { case (sfx, e, _) => e.as(s"d$sfx") }: _*)
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
      year(o_orderdate)::DOUBLE AS d_year,
      month(o_orderdate)::DOUBLE AS d_month,
      dayofmonth(o_orderdate)::DOUBLE AS d_day,
      ((o_orderdate::DATE - DATE '0001-01-01') + 1)::DOUBLE AS d_ordinal,
      epoch(o_orderdate::DATE::TIMESTAMP)::DOUBLE AS d_timestamp
      FROM orders ORDER BY o_orderkey"""))

  /** Blueprint forward pass (§2.9): one mean-aggregation round over the
    * lineitem→orders edge type with the default (self+msg)/2 combine, then
    * a linear decode. Feature = order total and line quantity — the mean of
    * integer-valued quantities is summation-order-exact, so the whole pass
    * is SQL-restatable. */
  private val qBlueprint = Q("bp1_blueprint_forward",
    (s, d) => {
      import graft.pipeline.Blueprint
      import graft.graph.EdgeType
      val ord = RelGraph.withRowId(t(s, d, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey"))
      val li = RelGraph.withRowId(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey", "l_linenumber"))
      val edges = RelGraph.fkEdges(li, ord,
        ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey")))
      val nodes = Map(
        "orders" -> ord.select(col(RelGraph.RowId).as("id"),
          array(col("o_totalprice")).as("feat")),
        "lineitem" -> li.select(col(RelGraph.RowId).as("id"),
          array(col("l_quantity")).as("feat")))
      val out = Blueprint.forward(nodes,
        Map(EdgeType("lineitem", "l_orderkey", "orders") -> edges),
        Blueprint.Config(layers = 1, aggr = "mean"))
      Blueprint.decodeLinear(out("orders"), Array(1.0), bias = 0.0)
        .select(col("id"), round(col("score"), 4).as("score"))
        .orderBy("id")
    },
    Some("""WITH ord AS (SELECT o_orderkey, o_totalprice,
        row_number() OVER (ORDER BY o_orderkey)-1 AS id FROM orders),
      msg AS (SELECT o_orderkey, avg(l_quantity) AS m FROM lineitem
        JOIN ord ON l_orderkey = o_orderkey GROUP BY o_orderkey)
      SELECT id, round(CASE WHEN m IS NULL THEN o_totalprice
        ELSE (o_totalprice + m) / 2.0 END, 4) AS score
      FROM ord LEFT JOIN msg USING (o_orderkey) ORDER BY id"""))

  /** Closed-form ridge fit of the Blueprint linear decoder (the reference's
    * train-a-readout capability, main.py:307-323) — normal equations as one
    * distributed aggregation pass + a 3×3 driver solve; the oracle restates
    * the same system via Cramer's rule over the same DuckDB-side sums.
    *
    * Oracle-parity design: features (quantity, linenumber) and the label
    * floor(extendedprice) are all INTEGER-valued, so every normal-equation
    * sum is an exact integer in double (< 2^53) regardless of partial-agg
    * merge order — both engines solve from bit-identical inputs, and the
    * two solve algorithms (partial-pivot Gaussian here, Cramer in SQL)
    * agree to ~1e-13 relative, far inside 4-decimal rounding. floor(), not
    * round(): Spark's round canonicalizes doubles through BigDecimal
    * string form while DuckDB rounds the raw double — floor agrees on the
    * raw double in both. */
  private val qFitDecoder = Q("bp2_fit_decoder",
    (s, d) => {
      import graft.pipeline.Blueprint
      val li = t(s, d, "lineitem").select(
        array(col("l_quantity"), col("l_linenumber").cast("double")).as("feat"),
        floor(col("l_extendedprice")).as("y"))
      val (w, b) = Blueprint.fitLinearDecoder(li, "feat", "y", dim = 2, lambda = 1.0)
      import s.implicits._
      Seq((w(0), w(1), b)).toDF("__w0", "__w1", "__b")
        .select(round(col("__w0"), 4).as("w_quantity"),
          round(col("__w1"), 4).as("w_linenumber"),
          round(col("__b"), 4).as("bias"))
    },
    Some("""WITH s AS (SELECT
        sum(l_quantity*l_quantity)::DOUBLE + 1.0 AS a,
        sum(l_quantity*l_linenumber)::DOUBLE AS b,
        sum(l_quantity)::DOUBLE AS c,
        sum(l_linenumber*l_linenumber)::DOUBLE + 1.0 AS e,
        sum(l_linenumber)::DOUBLE AS f,
        count(*)::DOUBLE AS i,
        sum(l_quantity*floor(l_extendedprice))::DOUBLE AS r1,
        sum(l_linenumber*floor(l_extendedprice))::DOUBLE AS r2,
        sum(floor(l_extendedprice))::DOUBLE AS r3
      FROM lineitem),
      m AS (SELECT a, b, c, b AS d, e, f, c AS g, f AS h, i, r1, r2, r3,
        a*(e*i - f*f) - b*(b*i - f*c) + c*(b*f - e*c) AS det FROM s)
      SELECT
        round((r1*(e*i - f*h) - b*(r2*i - f*r3) + c*(r2*h - e*r3)) / det, 4) AS w_quantity,
        round((a*(r2*i - f*r3) - r1*(d*i - f*g) + c*(d*r3 - r2*g)) / det, 4) AS w_linenumber,
        round((a*(e*r3 - r2*h) - b*(d*r3 - r2*g) + r1*(d*h - e*g)) / det, 4) AS bias
      FROM m"""))

  /** One-vs-rest ridge-classifier fit (bp2's multi-target form): all three
    * l_returnflag classes share ONE X'X pass; the oracle repeats the
    * Cramer's-rule solve per class over indicator-label sums (integers →
    * exact in double, same parity argument as bp2). */
  private def fitClassifierOracle: String = {
    val classes = Seq("A", "N", "R")
    val classSums = classes.map { k =>
      s"""sum(CASE WHEN l_returnflag='$k' THEN l_quantity ELSE 0 END)::DOUBLE AS r1_$k,
        sum(CASE WHEN l_returnflag='$k' THEN l_linenumber ELSE 0 END)::DOUBLE AS r2_$k,
        sum(CASE WHEN l_returnflag='$k' THEN 1 ELSE 0 END)::DOUBLE AS r3_$k"""
    }.mkString(",\n      ")
    val blocks = classes.map { k =>
      s"""SELECT '$k' AS class,
        round((r1_$k*(e*i - f*h) - b*(r2_$k*i - f*r3_$k) + c*(r2_$k*h - e*r3_$k)) / det, 4) AS w_quantity,
        round((a*(r2_$k*i - f*r3_$k) - r1_$k*(d*i - f*g) + c*(d*r3_$k - r2_$k*g)) / det, 4) AS w_linenumber,
        round((a*(e*r3_$k - r2_$k*h) - b*(d*r3_$k - r2_$k*g) + r1_$k*(d*h - e*g)) / det, 4) AS bias
        FROM m"""
    }.mkString(" UNION ALL ")
    s"""WITH s AS (SELECT
        sum(l_quantity*l_quantity)::DOUBLE + 1.0 AS a,
        sum(l_quantity*l_linenumber)::DOUBLE AS b,
        sum(l_quantity)::DOUBLE AS c,
        sum(l_linenumber*l_linenumber)::DOUBLE + 1.0 AS e,
        sum(l_linenumber)::DOUBLE AS f,
        count(*)::DOUBLE AS i,
        $classSums
      FROM lineitem),
      m AS (SELECT *, b AS d, c AS g, f AS h,
        a*(e*i - f*f) - b*(b*i - f*c) + c*(b*f - e*c) AS det FROM s)
      SELECT * FROM ($blocks) ORDER BY class"""
  }

  private val qFitClassifier = Q("bp3_fit_classifier",
    (s, d) => {
      import graft.pipeline.Blueprint
      val li = t(s, d, "lineitem").select(
        array(col("l_quantity"), col("l_linenumber").cast("double")).as("feat"),
        col("l_returnflag").as("y"))
      val classes = Seq("A", "N", "R")
      val fits = Blueprint.fitClassDecoders(li, "feat", "y", dim = 2, classes, lambda = 1.0)
      import s.implicits._
      classes.zip(fits).map { case (k, (w, b)) => (k, w(0), w(1), b) }
        .toDF("class", "__w0", "__w1", "__b")
        .select(col("class"), round(col("__w0"), 4).as("w_quantity"),
          round(col("__w1"), 4).as("w_linenumber"), round(col("__b"), 4).as("bias"))
        .orderBy("class")
    },
    Some(fitClassifierOracle))

  /** bp4's oracle: the N-step GD recurrence unrolled into one CTE chain
    * per step — gradient CTE (the same per-row sigmoid expression and sum
    * order as [[graft.pipeline.Blueprint.fitLogisticGD]]'s agg pass) then
    * weight-update CTE (op order pinned to `w − lr·(g/n)`). Generated by
    * the same loop index so Spark and DuckDB run structurally identical
    * arithmetic; cross-engine drift is summation-order + exp ulps, orders
    * below the round-6 contract (bp2's Cramer-oracle device). */
  private def fitGdOracle(steps: Int, lr: Double): String = {
    val sig = (w: String) => s"1.0/(1.0+exp(-(x1*$w.w1 + x2*$w.w2 + $w.b)))"
    val chain = (1 to steps).map { i =>
      val p = sig("w")
      s"""g$i AS (SELECT sum(($p - y)*x1) AS g1, sum(($p - y)*x2) AS g2,
          sum($p - y) AS gb FROM d, w${i - 1} w),
        w$i AS (SELECT w.w1 - $lr*(g.g1/n.n) AS w1, w.w2 - $lr*(g.g2/n.n) AS w2,
          w.b - $lr*(g.gb/n.n) AS b FROM w${i - 1} w, g$i g, n)"""
    }.mkString(",\n      ")
    s"""WITH d AS (SELECT l_quantity::DOUBLE AS x1, l_linenumber::DOUBLE AS x2,
        CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y FROM lineitem),
      n AS (SELECT count(*)::DOUBLE AS n FROM d),
      w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS b),
      $chain
      SELECT round(w1, 6) AS w_quantity, round(w2, 6) AS w_linenumber,
        round(b, 6) AS bias FROM w$steps"""
  }

  /** Gradient-trained logistic readout (the reference's train-loop stage):
    * 3 full-batch GD steps, each ONE distributed agg pass. */
  private val qFitGd = Q("bp4_fit_gd",
    (s, d) => {
      import graft.pipeline.Blueprint
      val li = t(s, d, "lineitem").select(
        array(col("l_quantity"), col("l_linenumber").cast("double")).as("feat"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"))
      val (w, b) = Blueprint.fitLogisticGD(li, "feat", "y", dim = 2,
        steps = 3, lr = 0.01)
      import s.implicits._
      Seq((w(0), w(1), b)).toDF("__w0", "__w1", "__b")
        .select(round(col("__w0"), 6).as("w_quantity"),
          round(col("__w1"), 6).as("w_linenumber"),
          round(col("__b"), 6).as("bias"))
    },
    Some(fitGdOracle(steps = 3, lr = 0.01)))

  /** bp5's oracle: backprop through the one-hidden-layer network unrolled
    * step by step — per step, a forward CTE (hidden activations), an
    * output CTE (residual `dm`), a gradient CTE (the nine sums of
    * [[graft.pipeline.Blueprint.fitMlpGD]]'s single agg pass, same product
    * order), and an update CTE (`θ − lr·(g/n)`). Parameter naming:
    * `wIJ` = w1(feature I)(hidden J), `cJ` = b1(J), `vJ` = w2(J),
    * `vb` = b2. */
  private def fitMlpOracle(steps: Int, lr: Double): String = {
    val chain = (1 to steps).map { k =>
      s"""p$k AS (SELECT d.x1, d.x2, d.y, w.*,
          1/(1+exp(-((x1*w.w00 + x2*w.w10) + w.c0))) AS h0,
          1/(1+exp(-((x1*w.w01 + x2*w.w11) + w.c1))) AS h1
        FROM d, w${k - 1} w),
      q$k AS (SELECT *, 1/(1+exp(-((h0*v0 + h1*v1) + vb))) - y AS dm FROM p$k),
      g$k AS (SELECT
        sum(dm * v0 * (h0*(1-h0)) * x1) AS gw00,
        sum(dm * v1 * (h1*(1-h1)) * x1) AS gw01,
        sum(dm * v0 * (h0*(1-h0)) * x2) AS gw10,
        sum(dm * v1 * (h1*(1-h1)) * x2) AS gw11,
        sum(dm * v0 * (h0*(1-h0))) AS gc0,
        sum(dm * v1 * (h1*(1-h1))) AS gc1,
        sum(dm * h0) AS gv0, sum(dm * h1) AS gv1, sum(dm) AS gb FROM q$k),
      w$k AS (SELECT
        w.w00 - $lr*(g.gw00/n.n) AS w00, w.w01 - $lr*(g.gw01/n.n) AS w01,
        w.w10 - $lr*(g.gw10/n.n) AS w10, w.w11 - $lr*(g.gw11/n.n) AS w11,
        w.c0 - $lr*(g.gc0/n.n) AS c0, w.c1 - $lr*(g.gc1/n.n) AS c1,
        w.v0 - $lr*(g.gv0/n.n) AS v0, w.v1 - $lr*(g.gv1/n.n) AS v1,
        w.vb - $lr*(g.gb/n.n) AS vb FROM w${k - 1} w, g$k g, n)"""
    }.mkString(",\n      ")
    s"""WITH d AS (SELECT l_quantity::DOUBLE AS x1, l_linenumber::DOUBLE AS x2,
        CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y FROM lineitem),
      n AS (SELECT count(*)::DOUBLE AS n FROM d),
      w0 AS (SELECT 0.1 AS w00, -0.1 AS w01, 0.2 AS w10, -0.2 AS w11,
        0.0 AS c0, 0.0 AS c1, 0.1 AS v0, 0.2 AS v1, 0.0 AS vb),
      $chain
      SELECT round(w00, 6) AS w00, round(w01, 6) AS w01,
        round(w10, 6) AS w10, round(w11, 6) AS w11,
        round(c0, 6) AS c0, round(c1, 6) AS c1,
        round(v0, 6) AS v0, round(v1, 6) AS v1,
        round(vb, 6) AS vb FROM w$steps"""
  }

  /** Gradient-trained HIDDEN layer: 2 backprop steps through a 2-unit
    * sigmoid MLP, each step one distributed agg pass. */
  private val qFitMlp = Q("bp5_fit_mlp_gd",
    (s, d) => {
      import graft.pipeline.Blueprint
      val li = t(s, d, "lineitem").select(
        array(col("l_quantity"), col("l_linenumber").cast("double")).as("feat"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"))
      val p = Blueprint.fitMlpGD(li, "feat", "y", dim = 2, hidden = 2,
        steps = 2, lr = 0.05)
      import s.implicits._
      Seq((p.w1(0)(0), p.w1(0)(1), p.w1(1)(0), p.w1(1)(1),
          p.b1(0), p.b1(1), p.w2(0), p.w2(1), p.b2))
        .toDF("__a", "__b", "__c", "__d", "__e", "__f", "__g", "__h", "__i")
        .select(round(col("__a"), 6).as("w00"), round(col("__b"), 6).as("w01"),
          round(col("__c"), 6).as("w10"), round(col("__d"), 6).as("w11"),
          round(col("__e"), 6).as("c0"), round(col("__f"), 6).as("c1"),
          round(col("__g"), 6).as("v0"), round(col("__h"), 6).as("v1"),
          round(col("__i"), 6).as("vb"))
    },
    Some(fitMlpOracle(steps = 2, lr = 0.05)))

  /** bp6's oracle: the GNN layer unrolled step by step — per step a
    * message CTE (per-child hidden activation from the previous step's
    * weights), the SCATTER-SUM CTE (per-parent message sum, zero when
    * childless), the residual CTE, the readout-gradient aggregate over
    * parents, and the JOIN-BACK aggregate over child rows (the adjoint of
    * the scatter-sum), then the update CTE. Parameter naming: a1/a2 =
    * w1(feature)(0), c = b1(0), v = w2(0), vb = b2. */
  private def fitGnnOracle(steps: Int, lr: Double): String = {
    val chain = (1 to steps).map { k =>
      s"""h$k AS (SELECT l_orderkey, x1, x2,
          1/(1+exp(-((x1*w.a1 + x2*w.a2) + w.c))) AS h FROM ch, w${k - 1} w),
      ag$k AS (SELECT p.o_orderkey, p.y, coalesce(s.a, 0.0) AS a0
        FROM par p LEFT JOIN
          (SELECT l_orderkey, sum(h) AS a FROM h$k GROUP BY 1) s
          ON p.o_orderkey = s.l_orderkey),
      d$k AS (SELECT a.o_orderkey, a.y, a.a0,
          1/(1+exp(-((a0*w.v) + w.vb))) - y AS dm FROM ag$k a, w${k - 1} w),
      gd$k AS (SELECT sum(dm*a0) AS gv, sum(dm) AS gb FROM d$k),
      bk$k AS (SELECT
          sum(d.dm * w.v * (h.h*(1-h.h)) * h.x1) AS ga1,
          sum(d.dm * w.v * (h.h*(1-h.h)) * h.x2) AS ga2,
          sum(d.dm * w.v * (h.h*(1-h.h))) AS gc
        FROM h$k h JOIN d$k d ON h.l_orderkey = d.o_orderkey, w${k - 1} w),
      w$k AS (SELECT
          w.a1 - $lr*(b.ga1/n.n) AS a1, w.a2 - $lr*(b.ga2/n.n) AS a2,
          w.c - $lr*(b.gc/n.n) AS c, w.v - $lr*(g.gv/n.n) AS v,
          w.vb - $lr*(g.gb/n.n) AS vb
        FROM w${k - 1} w, gd$k g, bk$k b, n)"""
    }.mkString(",\n      ")
    s"""WITH ch AS (SELECT l_orderkey, l_quantity::DOUBLE AS x1,
          l_linenumber::DOUBLE AS x2 FROM lineitem),
      par AS (SELECT o_orderkey,
        CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y FROM orders),
      n AS (SELECT count(*)::DOUBLE AS n FROM par),
      w0 AS (SELECT 0.1 AS a1, 0.2 AS a2, 0.0 AS c, 0.1 AS v, 0.0 AS vb),
      $chain
      SELECT round(a1, 6) AS w_quantity, round(a2, 6) AS w_linenumber,
        round(c, 6) AS bias_msg, round(v, 6) AS w_readout,
        round(vb, 6) AS bias_out FROM w$steps"""
  }

  /** One trainable GNN layer: 2 backprop steps where the gradient flows
    * THROUGH the A7 scatter-sum (per-child message layer upstream of the
    * per-order aggregation), each step = one scatter-sum shuffle + two
    * scalar aggregates. */
  private val qFitGnn = Q("bp6_fit_gnn_gd",
    (s, d) => {
      import graft.pipeline.Blueprint
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        array(col("l_quantity"), col("l_linenumber").cast("double")).as("feat"))
      val ord = t(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
      val p = Blueprint.fitGnnGD(li, Seq("l_orderkey"), "feat",
        ord, Seq("o_orderkey"), "y", dim = 2, hidden = 1, steps = 2, lr = 0.05)
      import s.implicits._
      Seq((p.w1(0)(0), p.w1(1)(0), p.b1(0), p.w2(0), p.b2))
        .toDF("__a", "__b", "__c", "__d", "__e")
        .select(round(col("__a"), 6).as("w_quantity"),
          round(col("__b"), 6).as("w_linenumber"),
          round(col("__c"), 6).as("bias_msg"),
          round(col("__d"), 6).as("w_readout"),
          round(col("__e"), 6).as("bias_out"))
    },
    Some(fitGnnOracle(steps = 2, lr = 0.05)))

  /** bp7's oracle: the HETERO layer unrolled — per step TWO message CTEs
    * (one per edge type: lineitem→orders forward, orders→customer
    * REVERSE), each scatter-summed and LEFT-joined onto the parents, the
    * readout over the cross-type SUM, one readout-gradient aggregate, and
    * one join-back aggregate PER TYPE (the per-type adjoint). Naming:
    * a1/a2/c1 = type-0 (lineitem) message params, d1/c2 = type-1
    * (customer-via-reverse-edge) params, v/vb = the shared readout. */
  private def fitHeteroGnnOracle(steps: Int, lr: Double): String = {
    val chain = (1 to steps).map { k =>
      s"""h1$k AS (SELECT k, x1, x2,
          1/(1+exp(-((x1*w.a1 + x2*w.a2) + w.c1))) AS h FROM ch1, w${k - 1} w),
      h2$k AS (SELECT k, z1,
          1/(1+exp(-((z1*w.d1) + w.c2))) AS h FROM ch2, w${k - 1} w),
      ag$k AS (SELECT p.k, p.y,
          coalesce(s1.a, 0.0) AS a1s, coalesce(s2.a, 0.0) AS a2s
        FROM par p
        LEFT JOIN (SELECT k, sum(h) AS a FROM h1$k GROUP BY 1) s1 ON p.k = s1.k
        LEFT JOIN (SELECT k, sum(h) AS a FROM h2$k GROUP BY 1) s2 ON p.k = s2.k),
      d$k AS (SELECT a.k, a.y,  a.a1s, a.a2s,
          1/(1+exp(-(((a1s + a2s)*w.v) + w.vb))) - y AS dm FROM ag$k a, w${k - 1} w),
      gd$k AS (SELECT sum(dm*(a1s + a2s)) AS gv, sum(dm) AS gb FROM d$k),
      bk1$k AS (SELECT
          sum(d.dm * w.v * (h.h*(1-h.h)) * h.x1) AS ga1,
          sum(d.dm * w.v * (h.h*(1-h.h)) * h.x2) AS ga2,
          sum(d.dm * w.v * (h.h*(1-h.h))) AS gc1
        FROM h1$k h JOIN d$k d ON h.k = d.k, w${k - 1} w),
      bk2$k AS (SELECT
          sum(d.dm * w.v * (h.h*(1-h.h)) * h.z1) AS gd1,
          sum(d.dm * w.v * (h.h*(1-h.h))) AS gc2
        FROM h2$k h JOIN d$k d ON h.k = d.k, w${k - 1} w),
      w$k AS (SELECT
          w.a1 - $lr*(b1.ga1/n.n) AS a1, w.a2 - $lr*(b1.ga2/n.n) AS a2,
          w.c1 - $lr*(b1.gc1/n.n) AS c1,
          w.d1 - $lr*(b2.gd1/n.n) AS d1, w.c2 - $lr*(b2.gc2/n.n) AS c2,
          w.v - $lr*(g.gv/n.n) AS v, w.vb - $lr*(g.gb/n.n) AS vb
        FROM w${k - 1} w, gd$k g, bk1$k b1, bk2$k b2, n)"""
    }.mkString(",\n      ")
    s"""WITH ch1 AS (SELECT l_orderkey AS k, l_quantity::DOUBLE AS x1,
          l_linenumber::DOUBLE AS x2 FROM lineitem),
      ch2 AS (SELECT o_orderkey AS k, c_acctbal::DOUBLE / 10000.0 AS z1
        FROM orders JOIN customer ON o_custkey = c_custkey),
      par AS (SELECT o_orderkey AS k,
        CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y FROM orders),
      n AS (SELECT count(*)::DOUBLE AS n FROM par),
      w0 AS (SELECT 0.1 AS a1, 0.2 AS a2, 0.0 AS c1,
        0.1 AS d1, 0.0 AS c2, 0.1 AS v, 0.0 AS vb),
      $chain
      SELECT round(a1, 6) AS w_quantity, round(a2, 6) AS w_linenumber,
        round(c1, 6) AS bias_msg_li, round(d1, 6) AS w_acctbal,
        round(c2, 6) AS bias_msg_cust, round(v, 6) AS w_readout,
        round(vb, 6) AS bias_out FROM w$steps"""
  }

  /** §2.9 + verdict-11 task #2: JOINT multi-edge-type GNN training — two
    * edge groups (the lineitem→orders FK and the orders→customer REVERSE
    * edge, J5) each with its own message layer, aggregates SUMMED into one
    * shared readout (the reference's HeteroConv semantics,
    * nn/models/hetero_gnn.py:25-36), 2 backprop steps. */
  private val qFitHeteroGnn = Q("bp7_fit_hetero_gd",
    (s, d) => {
      import graft.pipeline.Blueprint
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        array(col("l_quantity"), col("l_linenumber").cast("double")).as("feat"))
      val custRev = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          array(col("c_acctbal").cast("double") / 10000.0).as("feat"))
      val ord = t(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
      val p = Blueprint.fitHeteroGnnGD(
        Seq(Blueprint.EdgeGroup(li, Seq("l_orderkey"), "feat", dim = 2),
          Blueprint.EdgeGroup(custRev, Seq("o_orderkey"), "feat", dim = 1)),
        ord, Seq("o_orderkey"), "y", hidden = 1, steps = 2, lr = 0.05)
      import s.implicits._
      Seq((p.w1(0)(0)(0), p.w1(0)(1)(0), p.b1(0)(0),
          p.w1(1)(0)(0), p.b1(1)(0), p.w2(0), p.b2))
        .toDF("__a", "__b", "__c", "__d", "__e", "__f", "__g")
        .select(round(col("__a"), 6).as("w_quantity"),
          round(col("__b"), 6).as("w_linenumber"),
          round(col("__c"), 6).as("bias_msg_li"),
          round(col("__d"), 6).as("w_acctbal"),
          round(col("__e"), 6).as("bias_msg_cust"),
          round(col("__f"), 6).as("w_readout"),
          round(col("__g"), 6).as("bias_out"))
    },
    Some(fitHeteroGnnOracle(steps = 2, lr = 0.05)))

  /** bp8's oracle: the ATTENTION layer unrolled — per step a message CTE
    * (h and the trainable score e = x·u), the stable per-parent softmax in
    * two window CTEs (subtract the group max, normalize by the group
    * exp-sum — A9's device), the α-weighted scatter-sum, the residual,
    * the readout-gradient aggregate, and ONE join-back aggregate whose
    * sums carry the softmax Jacobian as the per-edge scalar
    * dm·α·(h·v − a·v): u's gradient needs nothing beyond the same
    * join-back. Naming: a1/a2/c = message params, u1/u2 = attention
    * scorer, v/vb = readout. */
  private def fitAttnGnnOracle(steps: Int, lr: Double): String = {
    val chain = (1 to steps).map { k =>
      s"""h$k AS (SELECT k, x1, x2,
          1/(1+exp(-((x1*w.a1 + x2*w.a2) + w.c))) AS h,
          x1*w.u1 + x2*w.u2 AS e FROM ch, w${k - 1} w),
      ex$k AS (SELECT k, x1, x2, h,
          exp(e - max(e) OVER (PARTITION BY k)) AS st FROM h$k),
      al$k AS (SELECT k, x1, x2, h,
          st / sum(st) OVER (PARTITION BY k) AS al FROM ex$k),
      ag$k AS (SELECT p.k, p.y, coalesce(s.a, 0.0) AS a0
        FROM par p LEFT JOIN
          (SELECT k, sum(al*h) AS a FROM al$k GROUP BY 1) s ON p.k = s.k),
      d$k AS (SELECT a.k, a.y, a.a0,
          1/(1+exp(-((a0*w.v) + w.vb))) - y AS dm FROM ag$k a, w${k - 1} w),
      gd$k AS (SELECT sum(dm*a0) AS gv, sum(dm) AS gb FROM d$k),
      bk$k AS (SELECT
          sum(d.dm * w.v * a.al * (a.h*(1-a.h)) * a.x1) AS ga1,
          sum(d.dm * w.v * a.al * (a.h*(1-a.h)) * a.x2) AS ga2,
          sum(d.dm * w.v * a.al * (a.h*(1-a.h))) AS gc,
          sum(d.dm * a.al * (a.h*w.v - d.a0*w.v) * a.x1) AS gu1,
          sum(d.dm * a.al * (a.h*w.v - d.a0*w.v) * a.x2) AS gu2
        FROM al$k a JOIN d$k d ON a.k = d.k, w${k - 1} w),
      w$k AS (SELECT
          w.a1 - $lr*(b.ga1/n.n) AS a1, w.a2 - $lr*(b.ga2/n.n) AS a2,
          w.c - $lr*(b.gc/n.n) AS c,
          w.u1 - $lr*(b.gu1/n.n) AS u1, w.u2 - $lr*(b.gu2/n.n) AS u2,
          w.v - $lr*(g.gv/n.n) AS v, w.vb - $lr*(g.gb/n.n) AS vb
        FROM w${k - 1} w, gd$k g, bk$k b, n)"""
    }.mkString(",\n      ")
    s"""WITH ch AS (SELECT l_orderkey AS k, l_quantity::DOUBLE AS x1,
          l_linenumber::DOUBLE AS x2 FROM lineitem),
      par AS (SELECT o_orderkey AS k,
        CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y FROM orders),
      n AS (SELECT count(*)::DOUBLE AS n FROM par),
      w0 AS (SELECT 0.1 AS a1, 0.2 AS a2, 0.0 AS c,
        0.05 AS u1, 0.1 AS u2, 0.1 AS v, 0.0 AS vb),
      $chain
      SELECT round(a1, 6) AS w_quantity, round(a2, 6) AS w_linenumber,
        round(c, 6) AS bias_msg, round(u1, 6) AS u_quantity,
        round(u2, 6) AS u_linenumber, round(v, 6) AS w_readout,
        round(vb, 6) AS bias_out FROM w$steps"""
  }

  /** §2.9 + verdict-11 task #3: backprop THROUGH the A9 softmax attention
    * aggregation (the reference trains AttentionAggregation,
    * nn/aggr/attention.py:10-41) — trainable score e = x·u, per-parent
    * softmax weights, α-weighted scatter-sum, 2 backprop steps; the
    * attention gradient rides the same join-back as the scatter-sum
    * adjoint. */
  private val qFitAttnGnn = Q("bp8_fit_attn_gd",
    (s, d) => {
      import graft.pipeline.Blueprint
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        array(col("l_quantity"), col("l_linenumber").cast("double")).as("feat"))
      val ord = t(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
      val p = Blueprint.fitAttnGnnGD(li, Seq("l_orderkey"), "feat",
        ord, Seq("o_orderkey"), "y", dim = 2, hidden = 1, steps = 2, lr = 0.05)
      import s.implicits._
      Seq((p.w1(0)(0), p.w1(1)(0), p.b1(0), p.u(0), p.u(1), p.w2(0), p.b2))
        .toDF("__a", "__b", "__c", "__d", "__e", "__f", "__g")
        .select(round(col("__a"), 6).as("w_quantity"),
          round(col("__b"), 6).as("w_linenumber"),
          round(col("__c"), 6).as("bias_msg"),
          round(col("__d"), 6).as("u_quantity"),
          round(col("__e"), 6).as("u_linenumber"),
          round(col("__f"), 6).as("w_readout"),
          round(col("__g"), 6).as("bias_out"))
    },
    Some(fitAttnGnnOracle(steps = 2, lr = 0.05)))

  /** F20: embedding stub is hash-defined — rows-only check; the combinator
    * semantics are spec-tested. */
  private val qEmbedStub = Q("t4_text_embed_stub",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        round(element_at(TextAnalysis.embedTextStub(col("text"), 8), 1), 6).as("e0"))
      .orderBy("doc_id"),
    None)

  /** F20 (real path): table-driven embedding through [[TextAnalysis
    * .embedWithTable]] — broadcast (token → vec) join + per-document mean.
    * For oracle parity the embedding table is DERIVED from the corpus
    * vocabulary with SQL-expressible integer-valued vectors
    * (len(token), len(token)²), so the whole tokenize → lookup → average
    * pipeline is restatable in DuckDB and the sums stay exact in double. */
  private val qEmbedTable = Q("t4b_text_embed_table",
    (s, d) => {
      val docs = t(s, d, "documents")
      val vocab = docs
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(length(col("token")) > 0).distinct()
        .select(col("token"), array(length(col("token")).cast("double"),
          (length(col("token")) * length(col("token"))).cast("double")).as("vec"))
      TextAnalysis.embedWithTable(docs, "doc_id", "text", vocab, "token", "vec", dim = 2)
        .select(col("doc_id"),
          round(element_at(col("embedding"), 1), 4).as("e0"),
          round(element_at(col("embedding"), 2), 4).as("e1"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents),
      t2 AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
      a AS (SELECT doc_id, round(avg(length(tok)), 4) AS e0,
        round(avg(length(tok)*length(tok)), 4) AS e1 FROM t2 GROUP BY doc_id)
      SELECT doc_id, coalesce(e0, 0.0) AS e0, coalesce(e1, 0.0) AS e1
      FROM documents LEFT JOIN a USING (doc_id) ORDER BY doc_id"""))

  /** F13 on a DERIVED interval (testdata has no interval column):
    * timestamp subtraction yields a DayTimeIntervalType, converted to total
    * nanoseconds by field extraction. Reported in seconds at 6 decimals:
    * the true value has exactly micro precision, and both engines' double
    * error (≤1e-7) is well inside the 5e-7 rounding boundary. */
  private val qDuration = Q("f13_duration_nanos",
    (s, d) => {
      val interval = col("l_shipdate") - lit("1995-01-01 00:00:00").cast("timestamp")
      val Seq((_, nanos, _)) = Converters.DurationConverter
        .convert("dur", DurationColumnDef(), interval)
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(nanos / 1e9, 6).as("dur_s"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
      round((epoch(l_shipdate) - epoch(TIMESTAMP '1995-01-01')) * 1e9 / 1e9, 6) AS dur_s
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  private val qSoftmax = Q("f21_softmax_argmax",
    (s, d) => {
      val e = col("embedding")
      t(s, d, "embeddings").select(
        col("vec_id"),
        Similarity.argmaxArray(e).cast("bigint").as("argmax"),
        round(element_at(Similarity.softmaxArray(e),
          (Similarity.argmaxArray(e) + 1).cast("int")), 4).as("p_max"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id, (list_position(embedding, list_max(embedding)) - 1)::BIGINT AS argmax,
      round(1.0 / list_aggregate(list_transform(embedding,
        x -> exp(x::DOUBLE - list_max(embedding)::DOUBLE)), 'sum'), 4) AS p_max
      FROM embeddings ORDER BY vec_id"""))

  private val qMetrics = Q("f22_regression_metrics",
    (s, d) => {
      val p = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val y = col("l_extendedprice")
      t(s, d, "lineitem").agg(
        round(avg(abs(p - y)), 4).as("mae"),
        round(avg(pow(p - y, 2)), 2).as("mse"),
        round(sqrt(avg(pow(p - y, 2))) / avg(y), 6).as("nrmse"))
    },
    Some("""SELECT round(avg(abs(l_extendedprice*(1-l_discount) - l_extendedprice)),4) AS mae,
      round(avg(pow(l_extendedprice*(1-l_discount) - l_extendedprice, 2)),2) AS mse,
      round(sqrt(avg(pow(l_extendedprice*(1-l_discount) - l_extendedprice, 2)))
        / avg(l_extendedprice), 6) AS nrmse FROM lineitem"""))

  // ====================================================================
  // BFS sampling (§2.3 J3 / §3.3)
  // ====================================================================

  private val qBfs = Q("j3_bfs_sample",
    (s, d) => {
      val cat = catalog(s, d)
      val core = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      val schema = cat.constraintSchema()
      val coreSchema = Schema(schema.tables.filter { case (k, _) => core.contains(k) })
      new BfsSampler(coreSchema, core.map(n => n -> cat.table(n)).toMap, maxDepth = 3)
        .sampleStats("orders", 7)
    },
    Some("""WITH seed AS (SELECT * FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 7),
      cust AS (SELECT DISTINCT c.* FROM customer c WHERE c_custkey IN (SELECT o_custkey FROM seed)),
      li AS (SELECT DISTINCT l.* FROM lineitem l WHERE l_orderkey IN (SELECT o_orderkey FROM seed)),
      nat AS (SELECT DISTINCT n.* FROM nation n WHERE n_nationkey IN (SELECT c_nationkey FROM cust)),
      ord_all AS (SELECT DISTINCT * FROM (SELECT * FROM seed UNION
        SELECT o.* FROM orders o WHERE o_orderkey IN (SELECT l_orderkey FROM li))),
      prt AS (SELECT DISTINCT p.* FROM part p WHERE p_partkey IN (SELECT l_partkey FROM li)),
      sup AS (SELECT DISTINCT s.* FROM supplier s WHERE s_suppkey IN (SELECT l_suppkey FROM li))
      SELECT * FROM (
        SELECT 'customer' AS table_name, count(*) AS n FROM cust UNION ALL
        SELECT 'lineitem', count(*) FROM li UNION ALL
        SELECT 'nation', count(*) FROM nat UNION ALL
        SELECT 'orders', count(*) FROM ord_all UNION ALL
        SELECT 'part', count(*) FROM prt UNION ALL
        SELECT 'supplier', count(*) FROM sup) ORDER BY table_name"""))

  /** J3 + the virtual `_target_table` node and `_target_fk` edge the
    * reference attaches to every sample (data/dataset.py:271,356-362):
    * same BFS walk, plus one synthetic node row and one edge to the seed —
    * both counts derived from the seed DataFrame (an empty seed reports 0,
    * so the oracle is data-driven, not a constant). */
  private val qBfsTarget = Q("j3b_bfs_virtual_target",
    (s, d) => {
      val cat = catalog(s, d)
      val core = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      val schema = cat.constraintSchema()
      val coreSchema = Schema(schema.tables.filter { case (k, _) => core.contains(k) })
      new BfsSampler(coreSchema, core.map(n => n -> cat.table(n)).toMap, maxDepth = 3)
        .sampleStatsWithVirtualTarget("orders", 7)
        .orderBy("table_name")
    },
    qBfs.oracle.map(sql => sql.replace(
      "ORDER BY table_name",
      """UNION ALL SELECT '_target_table', count(*) FROM seed
        UNION ALL SELECT '_target_table->_target_fk->orders', count(*) FROM seed
        ORDER BY table_name""")))

  // ====================================================================
  // Dedup (training-data pipeline)
  // ====================================================================

  private val qExactDedup = Q("d1_exact_dedup_groups",
    (s, d) => Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
      .orderBy("keep_id"),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents
      GROUP BY lower(trim(text)) ORDER BY keep_id"""))

  /** Exact n-gram Jaccard with n=3: unigram jaccard is degenerate on a
    * 31-word vocabulary (74% of ALL pairs exceed 0.5 — a quadratic OUTPUT),
    * while shared 3-gram shingles only occur for genuinely duplicated text,
    * so the inverted-index join stays selective at any scale. */
  private val qNgramJaccard = Q("d3_ngram_jaccard",
    (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT id1, id2, round(inter::DOUBLE / (z1.sz + z2.sz - inter), 4) AS jaccard
      FROM pairs JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
      WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 0.5
      ORDER BY id1, id2"""))

  /** Near-dup clustering: the d3 pair set collapsed into connected
    * components, every document mapped to its canonical (minimum-id)
    * representative — iterative min-label propagation on the Spark side,
    * a recursive transitive-closure CTE on the DuckDB side; identical pair
    * input (d3's oracle already hash-matches) ⇒ identical clusters. */
  /** Shared CTE chain deriving (doc_id, rep, n_chars) clusters from the d3
    * pair pipeline — the d6 oracle selects it directly; d8 windows over it. */
  private val dupClusterCte =
    """t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
      jp AS (SELECT id1, id2 FROM cand
        JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
        WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 0.5),
      e AS (SELECT id1 AS a, id2 AS b FROM jp UNION SELECT id2, id1 FROM jp),
      reach AS (SELECT a, b FROM e
        UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
      rep AS (SELECT a AS doc_id, min(b) AS mn FROM reach GROUP BY a),
      cl AS (SELECT d.doc_id, least(coalesce(mn, d.doc_id), d.doc_id) AS rep, d.n_chars
        FROM documents d LEFT JOIN rep USING (doc_id))"""

  private val qDupClusters = Q("d6_dup_clusters",
    (s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      Dedup.dupClusters(docs, "doc_id", pairs).orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $dupClusterCte
      SELECT doc_id, rep FROM cl ORDER BY doc_id"""))

  /** Dedup-pipeline completion: which document SURVIVES each near-dup
    * cluster — highest n_chars wins, ties to the lowest id (a quality
    * policy, distinct from d6's structural min-id label). */
  private val qCanonical = Q("d8_canonical_pick",
    (s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      Dedup.canonicalPick(Dedup.dupClusters(docs, "doc_id", pairs),
          docs, "doc_id", "n_chars")
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE $dupClusterCte,
      rk AS (SELECT rep AS cluster_id, doc_id, n_chars,
          row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, doc_id) AS rn,
          count(*) OVER (PARTITION BY rep) AS n_members
        FROM cl)
      SELECT cluster_id, doc_id AS keep_id, n_chars AS keep_quality, n_members
      FROM rk WHERE rn = 1 ORDER BY cluster_id"""))

  /** MinHash+LSH and SimHash pipelines are hash-function-defined — no SQL
    * oracle can reproduce them; the driver applies the rows-only check and
    * the ScalaTest specs assert recall/precision on planted duplicates. */
  private val qMinhash = Q("d2_minhash_neardups",
    (s, d) => Dedup.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    None)

  /** Degenerate-parameter MinHash anchor (the sim4/sim7 device applied to
    * LSH banding): at threshold 1.0 a pair survives the verify only with
    * IDENTICAL shingle sets, and identical sets yield identical minhash
    * signatures, so EVERY band collides — candidate recall is exactly 1 by
    * construction, no probabilistic argument needed. The full pipeline
    * (shingle → signature → band → bucket-join → verify) therefore computes
    * precisely the exact-Jaccard self-join at threshold 1.0, which the d3
    * CTE restates in SQL. The big rows-only `d2` stays the scale exercise
    * at the working threshold. */
  private val qMinhashAnchor = Q("d2b_minhash_exact_anchor",
    (s, d) => Dedup.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, threshold = 1.0)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT id1, id2, round(inter::DOUBLE / (z1.sz + z2.sz - inter), 4) AS jaccard
      FROM pairs JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
      WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 1.0
      ORDER BY id1, id2"""))

  private val qSimhash = Q("d4_simhash_neardups",
    (s, d) => Dedup.simhashNearDups(t(s, d, "documents"), "doc_id", "text",
        maxDistance = 10)
      .orderBy("id1", "id2"),
    None)

  /** The 128-bit scale path at the same maxDistance: full-recall banding
    * keeps chunks ≥ 11 bits (vs 5-6 for 64-bit at d=10), so the bucket
    * join stays selective — the variant to reach for at large d. */
  private val qSimhash128 = Q("d4b_simhash128_neardups",
    (s, d) => Dedup.simhashNearDups128(t(s, d, "documents"), "doc_id", "text",
        maxDistance = 10)
      .orderBy("id1", "id2"),
    None)

  /** Portable-hash MinHash anchor at the WORKING threshold: the whole
    * pipeline — shingle → k md5-minima signature → 2-row band keys →
    * bucket self-join → exact-Jaccard verify — restated in SQL, because
    * h_i(s) = substr(md5(i ':' s), 1, 16) is computable by any engine and
    * fixed-width hex minima order identically as strings. Complements d2b:
    * that anchor pins the pipeline at the degenerate threshold (recall 1
    * by construction); this one checks the PROBABILISTIC banding itself —
    * DuckDB independently computes which pairs collide in a band. */
  private val qMinhashPortable = Q("d2c_minhash_portable",
    (s, d) => Dedup.minhashNearDupsPortable(t(s, d, "documents"), "doc_id", "text",
        k = 8, bands = 4, shingleN = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id1", "id2"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      sz AS (SELECT doc_id, len(toks)::INTEGER AS sz FROM s),
      inv AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      mh AS (SELECT doc_id, i, min(substr(md5(i::VARCHAR || ':' || sh), 1, 16)) AS mh
        FROM inv CROSS JOIN range(8) r(i) GROUP BY doc_id, i),
      band AS (SELECT doc_id, (i // 2)::INTEGER AS b, string_agg(mh, '|' ORDER BY i) AS key
        FROM mh GROUP BY doc_id, (i // 2)::INTEGER),
      cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
        FROM band a JOIN band c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id),
      inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS inter
        FROM inv x JOIN inv y ON x.sh = y.sh
        JOIN cand ON cand.id1 = x.doc_id AND cand.id2 = y.doc_id
        GROUP BY x.doc_id, y.doc_id)
      SELECT id1, id2, round(inter::DOUBLE / (z1.sz + z2.sz - inter), 4) AS jaccard
      FROM inter JOIN sz z1 ON id1 = z1.doc_id JOIN sz z2 ON id2 = z2.doc_id
      WHERE inter::DOUBLE / (z1.sz + z2.sz - inter) >= 0.5
      ORDER BY id1, id2"""))

  /** Portable SimHash signatures as 64-char bit strings: every vote —
    * md5 hex digit decode, bit extract, majority, tie→0 — recomputed
    * independently by the oracle. Pins the signature math that d4/d4b's
    * hash-defined (xxhash64) variants can only spec-test. */
  private val qSimhashPortable = Q("d4c_simhash_portable",
    (s, d) => Dedup.simhashPortable(t(s, d, "documents"), "doc_id", "text")
      .select(col("doc_id"), lpad(bin(col("simhash")), 64, "0").as("sig64"))
      .orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents WHERE text IS NOT NULL),
      th AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
      v AS (SELECT doc_id, b,
          sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - b // 4, 1)) - 1)
                >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th CROSS JOIN range(64) r(b) GROUP BY doc_id, b)
      SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC) AS sig64
      FROM v GROUP BY doc_id ORDER BY doc_id"""))

  /** Pigeonhole-banding FULL-RECALL proof on real data: the engine's
    * banded chunk join (5 chunks at d=4) vs the oracle's brute-force
    * all-pairs Hamming join over the same portable signatures — equal
    * output means the banding missed nothing, turning the pigeonhole
    * recall argument into a checked fact. The oracle's O(n²) scan is the
    * gate-SF restatement; the engine side stays the banded scale shape. */
  private val qSimhashPortablePairs = Q("d4d_simhash_portable_pairs",
    (s, d) => Dedup.simhashPortableNearDups(t(s, d, "documents"), "doc_id", "text",
        maxDistance = 4)
      .select(col("id1"), col("id2"), col("hamming").cast("bigint").as("hamming"))
      .orderBy("id1", "id2"),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents WHERE text IS NOT NULL),
      th AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
      v AS (SELECT doc_id, b,
          sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - b // 4, 1)) - 1)
                >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th CROSS JOIN range(64) r(b) GROUP BY doc_id, b),
      sig AS (SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC) AS sig64
        FROM v GROUP BY doc_id)
      SELECT a.doc_id AS id1, c.doc_id AS id2,
        (SELECT count(*) FROM range(64) r(p)
          WHERE substr(a.sig64, (p+1)::INTEGER, 1) <> substr(c.sig64, (p+1)::INTEGER, 1))::BIGINT AS hamming
      FROM sig a JOIN sig c ON a.doc_id < c.doc_id
      WHERE (SELECT count(*) FROM range(64) r(p)
          WHERE substr(a.sig64, (p+1)::INTEGER, 1) <> substr(c.sig64, (p+1)::INTEGER, 1)) <= 4
      ORDER BY id1, id2"""))

  private val qEmbDedup = Q("d5_embedding_neardups",
    // the synthetic embeddings are near-orthogonal random vectors (max
    // pairwise cos ~0.51), so the "near-dup" bar is set low enough to
    // exercise the bucket-join + verify path end-to-end; 3 OR-ed signature
    // tables exercise the recall-amplified path (DedupSpec measures recall)
    (s, d) => Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.25, nPlanes = 4, nTables = 3)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
      .orderBy("id1", "id2"),
    None)

  /** d5's contract-sized SCALE path: nPlanes derived from the corpus
    * count via [[Similarity.nPlanesFor]] — the sizing the d5 scaladoc
    * promises but d5 deliberately pins (fixed nPlanes keeps its
    * hash-defined output stable round-over-round while pair work grows
    * ~n²/2^nPlanes: 36× at the r10 sf1 sweep). Here the benchmark
    * exercises the actual contract: in-bucket pair work stays
    * ~n·targetBucket/2 at any corpus size. Rows-only (hash-defined);
    * `d5b` anchors the identical pipeline under the oracle at nPlanes=0
    * ≡ exhaustive. The count() sizing pass is one cheap scan — the same
    * bounded-driver-state class as Lloyd centroids. */
  private val qEmbDedupScaled = Q("d5c_embedding_neardups_scaled",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val nPlanes = Similarity.nPlanesFor(emb.count())
      Dedup.embeddingNearDups(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.25, nPlanes = nPlanes, nTables = 3)
        .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
        .orderBy("id1", "id2")
    },
    None)

  /** SemDeDup-style semantic dedup, the cluster-then-prune curation step:
    * cells from the deterministic IVF Lloyd trainer, within-cell pairs
    * only, keep-min-id prune at the cosine threshold. Rows-only (cell
    * assignment is centroid-defined — no SQL restatement); `sem1b` is the
    * oracle anchor at nCells=1 and DedupSpec pins cells-vs-global
    * semantics. */
  private val qSemDedup = Q("sem1_semantic_dedup",
    (s, d) => Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        nCells = 8, threshold = 0.25, iters = 1)
      .orderBy("vec_id"),
    None)

  /** Degenerate-parameter anchor for sem1 (the d2b/sim2b device): at
    * nCells = 1 every vector shares the one cell, so the within-cell prune
    * provably equals the global threshold prune — keep(i) ⟺ no j<i with
    * cos ≥ τ, restated below via the d5b pair CTE. */
  private val qSemDedupAnchor = Q("sem1b_semantic_dedup_anchor",
    (s, d) => Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        nCells = 1, threshold = 0.25, iters = 1)
      .orderBy("vec_id"),
    Some("""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
      dropped AS (SELECT DISTINCT id2 FROM p WHERE cos >= 0.25)
      SELECT e.vec_id, d.id2 IS NULL AS keep
      FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.id2
      ORDER BY e.vec_id"""))

  /** Degenerate-parameter embedding-LSH anchor (the d2b/sim2b device): at
    * nPlanes = 0 the single signature table has one constant bucket, so the
    * candidate set is provably ALL id1<id2 pairs and the pipeline computes
    * exactly the exhaustive cosine threshold join the SQL below restates.
    * `d5` stays the rows-only scale exercise (banded buckets, 3 OR-ed
    * tables). */
  private val qEmbDedupAnchor = Q("d5b_embedding_exact_anchor",
    (s, d) => Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.25, nPlanes = 0, nTables = 1)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
      .orderBy("id1", "id2"),
    Some("""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      SELECT id1, id2, round(cos, 4) AS cos FROM p
      WHERE cos >= 0.25 ORDER BY id1, id2"""))

  // ====================================================================
  // Similarity search
  // ====================================================================

  private val qBruteTopK = Q("sim1_bruteforce_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 3, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        round(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]), 6) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
      SELECT query_id, neighbor_id, cos FROM ranked WHERE rn <= 3
      ORDER BY query_id, neighbor_id"""))

  /** Cosine range search: every neighbor above the similarity radius per
    * query — threshold cut, no top-k window at all. */
  private val qRangeSearch = Q("sim8_range_search",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.rangeSearch(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", minCos = 0.2, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        round(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]), 6) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id)
      SELECT query_id, neighbor_id, cos FROM scored WHERE cos >= 0.2
      ORDER BY query_id, neighbor_id"""))

  /** IVF with nProbe = nCells degenerates to exhaustive search, so the
    * brute-force SQL oracle checks the whole quantize→probe→rank pipeline;
    * nProbe < nCells is the production approximate path (spec-tested for
    * cluster recall). */
  private val qIvfTopK = Q("sim3_ivf_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nCells = 8, iters = 2)
      Ivf.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 3, cents, nProbe = 8, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    qBruteTopK.oracle)

  private val qLshTopK = Q("sim2_lsh_topk",
    (s, d) => Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 3, nPlanes = 6, dim = 64)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "neighbor_id"),
    None)

  /** Degenerate-parameter LSH anchor (the d2b/sim4 device): nPlanes = 0
    * yields the constant signature, so every vector lands in ONE bucket and
    * the bucketed search degenerates to the exhaustive all-pairs top-k —
    * recall 1 by construction, output ≡ brute-force cosine top-k, restated
    * below in SQL. `sim2` stays the rows-only scale exercise at nPlanes=6. */
  private val qLshAnchor = Q("sim2b_lsh_exact_anchor",
    (s, d) => Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 3, nPlanes = 0, dim = 64)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "neighbor_id"),
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
      SELECT query_id, neighbor_id, round(cos, 4) AS cos FROM ranked
      WHERE rn <= 3 ORDER BY query_id, neighbor_id"""))

  // ====================================================================
  // Text analysis
  // ====================================================================

  private val qTextQuality = Q("t1_text_quality",
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars_q"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"),
      TextAnalysis.bpeishTokenCount(col("text")).cast("bigint").as("n_bpeish"),
      round(TextAnalysis.meanWordLen(col("text")), 4).as("mean_wlen"),
      round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"))
      .orderBy("doc_id"),
    Some {
      val sw = TextAnalysis.englishStopwords.map(w => s"'$w'").mkString("[", ",", "]")
      """SELECT doc_id, length(text)::BIGINT AS n_chars_q,
      (CASE WHEN length(trim(text)) = 0 THEN 0
        ELSE len(string_split(trim(text), ' ')) END)::BIGINT AS n_tokens,
      len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0))::BIGINT AS n_bpeish,
      CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
        round(list_aggregate(list_transform(string_split(trim(text), ' '),
          x -> length(x)), 'sum')::DOUBLE / len(string_split(trim(text), ' ')), 4) END AS mean_wlen,
      CASE WHEN length(text) = 0 THEN 0.0 ELSE
        round((length(text) - length(translate(text, '.,!?;:''"()-', '')))::DOUBLE
          / length(text), 4) END AS punct_ratio,
      CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
        round(len(list_filter(string_split(lower(trim(text)), ' '),
          x -> list_contains(""" + sw + """, x)))::DOUBLE
          / len(string_split(lower(trim(text)), ' ')), 4) END AS stopword_ratio
      FROM documents ORDER BY doc_id"""
    })

  private val qLangId = Q("t2_lang_id",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id"),
    Some {
      def score(lang: String): String = {
        val prof = TextAnalysis.langProfiles(lang).map(w => s"'$w'").mkString("[", ",", "]")
        s"len(list_filter(list_distinct(string_split(lower(trim(text)), ' ')), x -> list_contains($prof, x)))"
      }
      val langs = Seq("de", "en", "es", "fr")
      val scores = langs.map(l => s"${score(l)} AS s_$l").mkString(", ")
      val best = "greatest(" + langs.map(l => s"s_$l").mkString(", ") + ")"
      val cases = langs.map(l => s"WHEN s_$l = __best AND __best > 0 THEN '$l'").mkString(" ")
      s"""WITH sc AS (SELECT doc_id, text, $scores FROM documents),
        sc2 AS (SELECT doc_id, text, $best AS __best, s_de, s_en, s_es, s_fr FROM sc)
        SELECT doc_id, CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
          $cases ELSE 'und' END AS lang_pred
        FROM sc2 ORDER BY doc_id"""
    })

  private val qFingerprint = Q("t3_fingerprint",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(lower(trim(text))) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  // ====================================================================
  // Multimodal plumbing
  // ====================================================================

  private val qMedia = Q("mm1_media_stats",
    (s, d) => {
      val media = Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text", "text/plain")
      Multimodal.byteStats(media)
        .select(col("media_id"), col("n_bytes"), md5(col("data")).as("content_md5"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
      md5(text) AS content_md5 FROM documents ORDER BY media_id"""))

  // ====================================================================
  // Streaming-shaped transforms (batch-checked)
  // ====================================================================

  /** Deterministic two-band PNG corpus keyed off the nation table —
    * geometry and band colors are closed-form in the keys, PNG encode
    * runs executor-side: the shared fixture for the real-decode queries
    * mm2 and mm3 (and the matching CTE head of both oracles). */
  private def twoBandPngMedia(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("id"),
        (lit(4) + pmod(col("n_nationkey"), lit(5))).cast("int").as("w"),
        (lit(3) + pmod(col("n_regionkey"), lit(4))).cast("int").as("h"),
        pmod(col("n_nationkey") * 37, lit(256)).cast("int").as("r1"),
        pmod(col("n_nationkey") * 59, lit(256)).cast("int").as("g1"),
        pmod(col("n_nationkey") * 83, lit(256)).cast("int").as("b1"),
        pmod(col("n_nationkey") * 101, lit(256)).cast("int").as("r2"),
        pmod(col("n_nationkey") * 131, lit(256)).cast("int").as("g2"),
        pmod(col("n_nationkey") * 151, lit(256)).cast("int").as("b2"))
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)]
      .map { case (id, w, h, r1, g1, b1, r2, g2, b2) =>
        (id, Multimodal.encodeTwoBandPng(w, h, (r1, g1, b1), (r2, g2, b2)))
      }
      .toDF("media_id", "data")
  }

  /** Shared oracle CTE: the same two-band construction in closed form. */
  private val twoBandPngCte =
    """s AS (SELECT n_nationkey::BIGINT AS media_id,
        (4 + n_nationkey % 5)::INT AS width,
        (3 + n_regionkey % 4)::INT AS height,
        (n_nationkey * 37) % 256 AS r1, (n_nationkey * 59) % 256 AS g1,
        (n_nationkey * 83) % 256 AS b1, (n_nationkey * 101) % 256 AS r2,
        (n_nationkey * 131) % 256 AS g2, (n_nationkey * 151) % 256 AS b2
        FROM nation)"""

  /** Batched mapPartitions decode through the DEFAULT codec — which since
    * round 9 is the real `javax.imageio` path ([[Multimodal.imageBatchCodec]]):
    * features [w, h, mean_r, mean_g, mean_b] come only from actual PNG
    * decode, and the oracle knows them in closed form (PNG lossless; the
    * means take one correctly-rounded double division and one rounding to
    * float on both sides, so values are bit-identical). What's exercised
    * beyond mm3: the batch-iterator plumbing and the float feature-vector
    * contract a JNI/ONNX codec would plug into. */
  private val qDecode = Q("mm2_decode_batched",
    (s, d) => {
      Multimodal.decodeBatched(twoBandPngMedia(s, d), dim = 5, batchSize = 8)
        .select(col("media_id"),
          element_at(col("features"), 1).cast("double").as("f_w"),
          element_at(col("features"), 2).cast("double").as("f_h"),
          element_at(col("features"), 3).cast("double").as("f_r"),
          element_at(col("features"), 4).cast("double").as("f_g"),
          element_at(col("features"), 5).cast("double").as("f_b"))
        .orderBy("media_id")
    },
    Some(s"""WITH $twoBandPngCte
      SELECT media_id, width::DOUBLE AS f_w, height::DOUBLE AS f_h,
        (((height // 2) * r1 + (height - height // 2) * r2)::DOUBLE / height)::FLOAT4::DOUBLE AS f_r,
        (((height // 2) * g1 + (height - height // 2) * g2)::DOUBLE / height)::FLOAT4::DOUBLE AS f_g,
        (((height // 2) * b1 + (height - height // 2) * b2)::DOUBLE / height)::FLOAT4::DOUBLE AS f_b
      FROM s ORDER BY media_id"""))

  /** REAL image decode (javax.imageio): deterministic two-band PNGs are
    * encoded per nation row executor-side, then decoded back by
    * [[Multimodal.decodeImageStats]] — the reported geometry and
    * per-channel means come ONLY from actual PNG decode, while the oracle
    * knows them in closed form from the construction (PNG is lossless;
    * integer pixel sums / one IEEE division are bit-identical to DuckDB's
    * rational formula because correctly-rounded division of equal exact
    * rationals is unique). */
  private val qImageDecode = Q("mm3_image_decode",
    (s, d) => Multimodal.decodeImageStats(twoBandPngMedia(s, d)).orderBy("media_id"),
    Some(s"""WITH $twoBandPngCte
      SELECT media_id, width, height,
        ((height // 2) * r1 + (height - height // 2) * r2)::DOUBLE / height AS mean_r,
        ((height // 2) * g1 + (height - height // 2) * g2)::DOUBLE / height AS mean_g,
        ((height // 2) * b1 + (height - height // 2) * b2)::DOUBLE / height AS mean_b
      FROM s ORDER BY media_id"""))

  /** Perceptual image near-dup (aHash + pigeonhole-banded Hamming join)
    * over the real-decode PNG fixture. The hash comes ONLY from actual
    * `javax.imageio` decode; the oracle re-derives each image's 8×8
    * average-hash bits in closed form from the two-band construction
    * (integer gray + strict integer mean test — no float anywhere), then
    * brute-forces all pairs. Banding guarantees full recall at the
    * threshold, so the LSH side must equal the brute-force side exactly. */
  private val qAhashNearDups = Q("mm4_ahash_neardups",
    (s, d) => Multimodal.ahashNearDups(twoBandPngMedia(s, d), maxDistance = 8)
      .orderBy("id1", "id2"),
    Some(s"""WITH $twoBandPngCte,
      jj AS (SELECT unnest(generate_series(0, 7)) AS j),
      rb AS (SELECT media_id, j,
          CASE WHEN (j * height) // 8 < height // 2
            THEN (r1 + g1 + b1) // 3 ELSE (r2 + g2 + b2) // 3 END AS gray
        FROM s CROSS JOIN jj),
      tot AS (SELECT media_id, 8 * sum(gray) AS sum64 FROM rb GROUP BY 1),
      bits AS (SELECT rb.media_id, j,
          CASE WHEN 64 * gray > sum64 THEN 1 ELSE 0 END AS b
        FROM rb JOIN tot USING (media_id)),
      ham AS (SELECT a.media_id AS id1, c.media_id AS id2,
          8 * sum(CASE WHEN a.b != c.b THEN 1 ELSE 0 END) AS hamming
        FROM bits a JOIN bits c ON a.j = c.j AND a.media_id < c.media_id
        GROUP BY 1, 2)
      SELECT id1, id2, hamming::INT AS hamming FROM ham
      WHERE hamming <= 8 ORDER BY id1, id2"""))

  /** Stateful running totals (mapGroupsWithState) — on a bounded input the
    * final state per key equals the plain aggregate, which IS the oracle. */
  private val qRunningTotals = Q("st2_running_totals",
    (s, d) => EventStream.runningTotals(events(s, d), "event_type", "value")
      .toDF()
      .select(col("key"), col("n"), round(col("total"), 4).as("total"))
      .orderBy("key"),
    Some("""SELECT event_type AS key, count(*) AS n, round(sum(value),4) AS total
      FROM events GROUP BY event_type ORDER BY key"""))

  private val qSessions = Q("st3_sessionize",
    (s, d) => EventStream.sessionizeBatch(events(s, d), "user_id", "ts",
        gapSeconds = 1800)
      .orderBy("user_id", "session_id"),
    // floor(epoch(...)) everywhere: Spark's unix_timestamp truncates
    // sub-second parts, so the oracle's gap test and bounds must too
    Some("""WITH e AS (SELECT user_id, ts,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
      s AS (SELECT user_id, ts, CASE WHEN prev IS NULL
          OR floor(epoch(ts)) - floor(epoch(prev)) > 1800 THEN 1 ELSE 0 END AS new_s FROM e),
      c AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS session_id FROM s)
      SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        floor(epoch(min(ts)))::BIGINT AS start_s, floor(epoch(max(ts)))::BIGINT AS end_s
      FROM c GROUP BY user_id, session_id ORDER BY user_id, session_id"""))

  private val qHourly = Q("st1_hourly_events",
    (s, d) => EventStream.hourlyStats(events(s, d))
      .orderBy("wstart", "event_type"),
    Some("""SELECT epoch(date_trunc('hour', ts))::BIGINT AS wstart, event_type,
      count(*) AS n, round(sum(value),4) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY wstart, event_type"""))

  // ====================================================================
  // Temporal joins, rolling features, splits, quantiles (round 5)
  // ====================================================================

  /** Backward as-of join: each click picks the user's latest purchase
    * at-or-before it (merge-as-of: one window over a tagged union — no
    * inequality join). The oracle restates it as max-timestamp-then-max-id
    * subqueries, which DuckDB can afford at sf0.01. */
  private val qAsof = Q("aj1_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"),
          col("value").as("p_value"))
      TemporalJoins.asofJoin(clicks, purchases, "user_id", "user_id", "ts", "ts",
          carry = Seq("p_event_id", "p_value"), tieBreak = "p_event_id")
        .select(col("event_id"), col("p_event_id"),
          round(col("p_value"), 4).as("p_value"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts
        FROM events WHERE event_type='click'),
      r AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        event_id AS p_event_id, value FROM events WHERE event_type='purchase'),
      m AS (SELECT l.event_id, max(r.ts) AS mt FROM l LEFT JOIN r
        ON r.user_id=l.user_id AND r.ts<=l.ts GROUP BY 1),
      b AS (SELECT l.event_id AS event_id, max(r.p_event_id) AS p_event_id
        FROM l JOIN m ON l.event_id=m.event_id
        JOIN r ON r.user_id=l.user_id AND r.ts=m.mt GROUP BY 1)
      SELECT l.event_id, b.p_event_id, round(r2.value, 4) AS p_value
      FROM l LEFT JOIN b ON l.event_id=b.event_id
      LEFT JOIN r r2 ON r2.p_event_id=b.p_event_id
      ORDER BY l.event_id"""))

  /** Range join: clicks within each purchase's 24h window, per user —
    * bucketed equi-join on (user, day-bucket), exact containment filter,
    * then left-join back so empty windows report 0. */
  private val qRangeJoin = Q("rj1_range_join",
    (s, d) => {
      val dayUs = 86400000000L
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts"),
          col("value"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("w_id"), col("user_id"),
          unix_micros(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + dayUs)
      val matched = TemporalJoins.rangeJoinBucketed(clicks, windows,
        "c_user", "user_id", "c_ts", "lo", "hi", bucketWidth = dayUs)
      val aggd = matched.groupBy(col("w_id"))
        .agg(count(lit(1)).as("n_clicks"), sum(col("value")).as("__sv"))
      windows.select(col("w_id")).join(aggd, Seq("w_id"), "left")
        .select(col("w_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          round(coalesce(col("__sv"), lit(0.0)), 4).as("sum_value"))
        .orderBy("w_id")
    },
    Some("""WITH p AS (SELECT event_id AS w_id, user_id,
        date_trunc('microseconds', ts) AS lo,
        date_trunc('microseconds', ts) + INTERVAL 24 HOUR AS hi
        FROM events WHERE event_type='purchase'),
      c AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type='click')
      SELECT p.w_id, count(c.ts) AS n_clicks,
        round(coalesce(sum(c.value),0),4) AS sum_value
      FROM p LEFT JOIN c ON c.user_id=p.user_id AND c.ts >= p.lo AND c.ts < p.hi
      GROUP BY 1 ORDER BY 1"""))

  /** Rolling per-user features over the event sequence + typed JSON field
    * extraction — one window sort serves lag, trailing mean and sequence
    * number. */
  private val qRolling = Q("fe1_rolling_features",
    (s, d) => Features.rolling(events(s, d), "user_id", "ts", "value",
        tie = "event_id", k = 3)
      .select(col("event_id"), round(col("prev_value"), 4).as("prev_value"),
        round(col("avg3"), 4).as("avg3"), col("seq"),
        Features.jsonField(col("props"), "$.k", "int").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
        round(lag(value) OVER w, 4) AS prev_value,
        round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3,
        row_number() OVER w AS seq,
        json_extract_string(props, '$.k')::INTEGER AS k
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""))

  /** Recency-weighted rolling feature: finite-window EWMA (α = 1/2 —
    * exact binary weights, so the lag-chain arithmetic is bit-identical
    * cross-engine) over each user's event stream. */
  private val qEwma = Q("fe3_ewma",
    (s, d) => Features.ewma(events(s, d), "user_id", "ts", "value",
        tie = "event_id", k = 4)
      .select(col("event_id"), round(col("ewma"), 6).as("ewma"))
      .orderBy("event_id"),
    Some("""SELECT event_id, round((
        coalesce(value * 1.0, 0.0)
        + coalesce(lag(value, 1) OVER w * 0.5, 0.0)
        + coalesce(lag(value, 2) OVER w * 0.25, 0.0)
        + coalesce(lag(value, 3) OVER w * 0.125, 0.0))
      / ((CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END)
        + (CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 0.5 ELSE 0.0 END)
        + (CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 0.125 ELSE 0.0 END)),
      6) AS ewma
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""))

  /** Calendar-spine densification: each user's hourly activity with
    * missing hours materialized as zero rows, spine bounded per key. */
  private val qGapFill = Q("gf1_gap_fill",
    (s, d) => Features.fillHourlyGaps(events(s, d), "user_id", "ts", "value")
      .select(col("user_id"), col("bucket_start"), col("n"),
        round(col("sum_value"), 4).as("sum_value"))
      .orderBy("user_id", "bucket_start"),
    Some("""WITH h AS (SELECT user_id, date_trunc('hour', ts) AS h,
        count(*) AS n, sum(value) AS v FROM events GROUP BY 1, 2),
      b AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM h GROUP BY 1),
      s AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM b)
      SELECT s.user_id, epoch(s.h)::BIGINT AS bucket_start,
        coalesce(n, 0) AS n, round(coalesce(v, 0.0), 4) AS sum_value
      FROM s LEFT JOIN h ON s.user_id = h.user_id AND s.h = h.h
      ORDER BY 1, 2"""))

  /** Unpivot/melt: lineitem's four numeric measures to long form — pure
    * row-local stack, values carried verbatim (bit-identical, no rounding
    * device needed). */
  private val qUnpivot = Q("a21_unpivot",
    (s, d) => Olap.unpivot(
        t(s, d, "lineitem").filter(col("l_orderkey") < 1000),
        Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("l_orderkey", "l_linenumber", "column"),
    Some("""SELECT l_orderkey, l_linenumber, c AS column, v AS value
      FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS c, l_quantity AS v
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
          FROM lineitem WHERE l_orderkey < 1000) t
      ORDER BY l_orderkey, l_linenumber, c"""))

  /** k-anonymity audit over (nation, market-segment) quasi-identifiers —
    * group sizes under k = 10 are re-identification risks. */
  private val qKAnonymity = Q("dq4_k_anonymity",
    (s, d) => graft.analyze.DataQuality.kAnonymity(
      t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10),
    Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS gs
        FROM customer GROUP BY 1, 2)
      SELECT count(*)::BIGINT AS n_groups,
        sum(CASE WHEN gs < 10 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups,
        coalesce(sum(CASE WHEN gs < 10 THEN gs END), 0)::BIGINT AS n_rows_at_risk,
        min(gs)::BIGINT AS min_group_size
      FROM g"""))

  /** ORC sink/source round-trip: lineitem through ORC and back, then an
    * aggregate the oracle computes straight off parquet — value equality
    * proves the second columnar format preserves the data. */
  private val qOrcRoundTrip = Q("orc1_orc_roundtrip",
    (s, d) => {
      val dir = scratchDir("graft_orc")
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      graft.sources.Ingest.viaOrc(li, s"$dir/lineitem_orc")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** JSONL sink/source round-trip: the documents corpus through
    * line-delimited JSON (THE LLM-corpus interchange format) and back,
    * then a text-fidelity aggregate (md5 extrema + distinct content
    * count) the oracle computes straight off parquet — value equality
    * proves the JSON encode/decode preserved every byte of every text. */
  private val qJsonlRoundTrip = Q("jsonl1_jsonl_roundtrip",
    (s, d) => {
      val dir = scratchDir("graft_jsonl")
      graft.sources.Ingest.viaJsonl(t(s, d, "documents"), s"$dir/documents_jsonl")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text"))).as("n_distinct_texts"),
          min(md5(col("text"))).as("md5_min"),
          max(md5(col("text"))).as("md5_max"),
          count_distinct(col("lang"), col("source")).as("n_lang_source"))
    },
    Some("""SELECT count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        count(DISTINCT md5(text)) AS n_distinct_texts,
        min(md5(text)) AS md5_min, max(md5(text)) AS md5_max,
        count(DISTINCT (lang, source)) AS n_lang_source
      FROM documents"""))

  /** CSV round-trip of quoted free text — the third interchange format
    * beside parquet/ORC/JSONL: embedded commas and quotes must survive
    * Spark's CSV quoting verbatim or the md5 fidelity aggregate (same
    * device as jsonl1) diverges from the parquet truth. */
  private val qCsvRoundTrip = Q("csv1_csv_roundtrip",
    (s, d) => {
      val dir = scratchDir("graft_csv")
      graft.sources.Ingest.viaCsv(t(s, d, "documents"), s"$dir/documents_csv")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text"))).as("n_distinct_texts"),
          min(md5(col("text"))).as("md5_min"),
          max(md5(col("text"))).as("md5_max"),
          count_distinct(col("lang"), col("source")).as("n_lang_source"))
    },
    Some("""SELECT count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        count(DISTINCT md5(text)) AS n_distinct_texts,
        min(md5(text)) AS md5_min, max(md5(text)) AS md5_max,
        count(DISTINCT (lang, source)) AS n_lang_source
      FROM documents"""))

  /** S8/S6 under the ORACLE gate: the documents corpus through the REAL
    * JDBC sink and range-partitioned JDBC source — embedded Derby, the
    * same in-process execution path (dialect DDL, batched INSERTs,
    * range-predicate parallel read) a remote MariaDB would take, with
    * zero egress — then the jsonl1-style fidelity aggregate the oracle
    * computes straight off parquet. The partition bounds are deliberately
    * narrower than the id range at larger SFs: Spark's JDBC partitioner
    * puts out-of-range rows in the edge partitions, so the read is
    * correct at every scale (and that property is what this pins). */
  private val qJdbcRoundTrip = Q("jdbc1_derby_roundtrip",
    (s, d) => {
      val src = graft.sources.JdbcSource.embedded(
        "jdbc:derby:memory:graft_verify;create=true",
        "org.apache.derby.jdbc.EmbeddedDriver")
      src.writeTable(t(s, d, "documents"), "documents_rt")
      src.tablePartitioned(s, "documents_rt", "doc_id", 0, 400, 4)
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text"))).as("n_distinct_texts"),
          min(md5(col("text"))).as("md5_min"),
          max(md5(col("text"))).as("md5_max"),
          count_distinct(col("lang"), col("source")).as("n_lang_source"))
    },
    Some("""SELECT count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        count(DISTINCT md5(text)) AS n_distinct_texts,
        min(md5(text)) AS md5_min, max(md5(text)) AS md5_max,
        count(DISTINCT (lang, source)) AS n_lang_source
      FROM documents"""))

  /** l-diversity privacy audit: within (nation, segment) groups the
    * sensitive attribute is the customer's account-balance bracket —
    * groups where fewer than l = 9 brackets appear leak attribute
    * information even when k-anonymous. */
  private val qLDiversity = Q("dq5_l_diversity",
    (s, d) => graft.analyze.DataQuality.lDiversity(
      t(s, d, "customer")
        .withColumn("bal_bracket", floor(col("c_acctbal") / 1000)),
      Seq("c_nationkey", "c_mktsegment"), "bal_bracket", l = 9),
    Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS gs,
        count(DISTINCT floor(c_acctbal / 1000)) AS div
        FROM customer GROUP BY 1, 2)
      SELECT count(*)::BIGINT AS n_groups,
        sum(CASE WHEN div < 9 THEN 1 ELSE 0 END)::BIGINT AS n_low_diversity_groups,
        coalesce(sum(CASE WHEN div < 9 THEN gs END), 0)::BIGINT AS n_rows_at_risk,
        min(div)::BIGINT AS min_diversity
      FROM g"""))

  /** Deterministic k-per-group sample: 5 orders per priority class by
    * md5 coin — stable across engines, restated as the same row_number. */
  private val qGroupSample = Q("w10_group_sample",
    (s, d) => Sampling.topKPerGroup(
        t(s, d, "orders").select(col("o_orderpriority"), col("o_orderkey")),
        "o_orderpriority", "o_orderkey", k = 5)
      .orderBy("o_orderpriority", "o_orderkey"),
    Some("""SELECT o_orderpriority, o_orderkey FROM (
        SELECT o_orderpriority, o_orderkey,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY md5(o_orderkey::VARCHAR || ':42'), o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 5 ORDER BY o_orderpriority, o_orderkey"""))

  /** HGT-style budget sample: one hop from a 50-customer frontier into
    * two node types (their orders, their nations), collapsed to unique
    * nodes, ≤10 kept per TYPE by the namespaced md5 coin — restated as
    * the same row_number-over-md5 (the w10 device, node-deduped). */
  private val qBudgetSample = Q("w12_budget_sample",
    (s, d) => {
      val f = t(s, d, "customer")
        .filter(col("c_custkey") <= 50)
        .select(col("c_custkey"), col("c_nationkey"))
      val ordCand = t(s, d, "orders")
        .join(f.select(col("c_custkey").as("o_custkey")), "o_custkey")
        .select(lit("orders").as("node_type"),
          col("o_orderkey").cast("string").as("node_key"))
      val natCand = f.select(lit("nation").as("node_type"),
        col("c_nationkey").cast("string").as("node_key"))
      Sampling.budgetSample(ordCand.unionAll(natCand),
          "node_type", "node_key", budget = 10)
        .orderBy("node_type", "node_key")
    },
    Some("""WITH f AS (SELECT c_custkey, c_nationkey FROM customer
          WHERE c_custkey <= 50),
        cand AS (
          SELECT 'orders' AS node_type, o_orderkey::VARCHAR AS node_key
          FROM orders JOIN f ON o_custkey = c_custkey
          UNION ALL
          SELECT 'nation', c_nationkey::VARCHAR FROM f),
        u AS (SELECT DISTINCT node_type, node_key FROM cand),
        r AS (SELECT node_type, node_key,
          row_number() OVER (PARTITION BY node_type
            ORDER BY md5(node_type || ':' || node_key || ':hgt:42'),
            node_key) AS rn FROM u)
        SELECT node_type, node_key FROM r WHERE rn <= 10
        ORDER BY node_type, node_key"""))

  /** Zipf-law fit over the corpus vocabulary (top-100 terms): slope and
    * intercept of the ln-freq vs ln-rank least-squares line. */
  private val qZipf = Q("zipf1_zipf_slope",
    (s, d) => graft.text.TextAnalysis.zipfSlope(t(s, d, "documents"), "text", 100)
      .select(col("n_terms"), round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept")),
    Some("""WITH tok AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tk
        FROM documents),
      c AS (SELECT tk, count(*) AS c FROM tok WHERE length(tk) > 0 GROUP BY tk),
      r AS (SELECT row_number() OVER (ORDER BY c DESC, tk) AS rnk, c FROM c),
      p AS (SELECT ln(rnk) AS x, ln(c) AS y FROM r WHERE rnk <= 100),
      s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        sum(x*y) AS sxy, sum(x*x) AS sxx FROM p)
      SELECT n::BIGINT AS n_terms,
        round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS intercept
      FROM s"""))

  /** Snapshot diff between orders and a deterministically mutated "next
    * load" (status rewritten for the md5<10 slice, md5<04 dropped, fresh
    * negated keys inserted — the up1 device), every key classified. */
  private val qSnapshotDiff = Q("dv1_snapshot_diff",
    (s, d) => {
      val old = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"))
      val changed = Sampling.hashSample(old, "o_orderkey", "10")
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"))
      val removedKeys = Sampling.hashSample(old, "o_orderkey", "04")
        .select(col("o_orderkey"))
      val added = Sampling.hashSample(old, "o_orderkey", "02")
        .select((-col("o_orderkey")).as("o_orderkey"),
          lit("N").as("o_orderstatus"))
      val next = graft.sources.Merge.upsert(
          old.join(removedKeys, Seq("o_orderkey"), "left_anti"),
          changed.join(removedKeys, Seq("o_orderkey"), "left_anti"),
          Seq("o_orderkey"))
        .unionAll(added)
      graft.sources.Merge.snapshotDiff(old, next, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders),
      rm AS (SELECT o_orderkey FROM orders
        WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '04'),
      n AS (
        SELECT o_orderkey,
          CASE WHEN substr(md5(o_orderkey::VARCHAR),1,2) < '10'
            THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM rm)
        UNION ALL
        SELECT -o_orderkey, 'N' FROM orders
        WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '02')
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        CASE WHEN o.o_orderkey IS NULL THEN 'added'
          WHEN n.o_orderkey IS NULL THEN 'removed'
          WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
            THEN 'unchanged'
          ELSE 'changed' END AS change
      FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey
      ORDER BY o_orderkey"""))

  /** Epoch up-sampling for a pretraining mix: rare languages repeated
    * (de ×2.5, fr ×3) by the deterministic md5 coin — copy counts are a
    * pure function of (doc_id, seed), restated row-for-row in SQL. */
  private val qUpsample = Q("rs1_epoch_upsample",
    (s, d) => Sampling.upsample(
        t(s, d, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", Map("de" -> 2.5, "fr" -> 3.0))
      .orderBy("doc_id", "copy_id"),
    Some("""WITH w AS (SELECT doc_id, lang,
        (CASE lang WHEN 'de' THEN 2 WHEN 'fr' THEN 3 ELSE 1 END
         + CASE WHEN substring(md5(doc_id::VARCHAR || ':up:42'), 1, 4) <
             (CASE lang WHEN 'de' THEN '8000' ELSE '0000' END)
           THEN 1 ELSE 0 END)::BIGINT AS n
        FROM documents)
      SELECT doc_id, lang, unnest(generate_series(0::BIGINT, n - 1)) AS copy_id
      FROM w WHERE n > 0 ORDER BY doc_id, copy_id"""))

  /** Count-min sketch heavy-hitter counts via Spark's native
    * `count_min_sketch` aggregate (codegen'd, mergeable — the bounded-
    * state sibling of the bloom probe and HLL distinct): one pass builds
    * the sketch, the driver reads estimates for the known key set. At
    * eps = 0.001 the 2719-cell rows make collisions among 5 keys
    * practically impossible and the seed is fixed, so the deterministic
    * estimates EQUAL the exact counts — which is the oracle (a mismatch
    * would mean the sketch path broke, exactly what the gate should
    * catch). */
  private val qCmsCounts = Q("cms1_sketch_counts",
    (s, d) => {
      val skBytes = events(s, d)
        .agg(count_min_sketch(col("event_type"), lit(0.001), lit(0.99),
          lit(42)).as("sk"))
        .collect()(0).getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      val s2 = s
      import s2.implicits._
      Seq("click", "error", "purchase", "signup", "view")
        .map(t => (t, cms.estimateCount(t)))
        .toDF("event_type", "estimate")
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS estimate FROM events
      GROUP BY 1 ORDER BY 1"""))

  /** Asymmetric containment near-dups (quote/subset detection): ordered
    * pairs where ≥ 80% of A's shingles live in B — the exact all-pairs
    * restatement is the oracle (DuckDB can afford it at sf0.01). */
  private val qContainment = Q("d10_containment_pairs",
    (s, d) => Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 4).as("containment"))
      .orderBy("id_a", "id_b"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS st FROM t)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(len(list_intersect(a.st, b.st))::DOUBLE / len(a.st), 4)
          AS containment
      FROM s a JOIN s b ON a.doc_id != b.doc_id
      WHERE len(list_intersect(a.st, b.st))::DOUBLE / len(a.st) >= 0.8
      ORDER BY id_a, id_b"""))

  /** Image dup CLUSTERS: the mm4 perceptual pair set collapsed into
    * connected components with a min-id representative — the multimodal
    * composition of the text dedup pipeline (same `dupClusters` CC
    * device as d6, fed by real-decode aHash pairs); the oracle re-derives
    * the pairs in closed form and runs the same transitive closure
    * recursively. */
  private val qImageDupClusters = Q("mm6_image_dup_clusters",
    (s, d) => {
      val media = twoBandPngMedia(s, d)
      val pairs = Multimodal.ahashNearDups(media, maxDistance = 8)
      Dedup.dupClusters(media.select(col("media_id")), "media_id", pairs)
        .orderBy("media_id")
    },
    Some(s"""WITH RECURSIVE $twoBandPngCte,
      jj AS (SELECT unnest(generate_series(0, 7)) AS j),
      rb AS (SELECT media_id, j,
          CASE WHEN (j * height) // 8 < height // 2
            THEN (r1 + g1 + b1) // 3 ELSE (r2 + g2 + b2) // 3 END AS gray
        FROM s CROSS JOIN jj),
      tot AS (SELECT media_id, 8 * sum(gray) AS sum64 FROM rb GROUP BY 1),
      bits AS (SELECT rb.media_id, j,
          CASE WHEN 64 * gray > sum64 THEN 1 ELSE 0 END AS b
        FROM rb JOIN tot USING (media_id)),
      hp AS (SELECT a.media_id AS id1, c.media_id AS id2
        FROM bits a JOIN bits c ON a.j = c.j AND a.media_id < c.media_id
        GROUP BY 1, 2
        HAVING 8 * sum(CASE WHEN a.b != c.b THEN 1 ELSE 0 END) <= 8),
      e AS (SELECT id1 AS a, id2 AS b FROM hp
        UNION SELECT id2, id1 FROM hp),
      reach AS (SELECT a, b FROM e
        UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
      mn AS (SELECT a AS media_id, min(b) AS m FROM reach GROUP BY a)
      SELECT s.media_id, least(coalesce(m, s.media_id), s.media_id) AS rep
      FROM s LEFT JOIN mn USING (media_id) ORDER BY media_id"""))

  /** REAL audio decode (javax.sound.sampled WAV/PCM): deterministic
    * 16-bit PCM ramp signals are WAV-encoded per nation row executor-side,
    * then decoded back by [[Multimodal.decodeWavStats]] — sample rate,
    * channel count, and exact integer sample statistics come ONLY from
    * actual WAV parse + sample reads, while the oracle knows them in
    * closed form from the generation formula (PCM is lossless and the
    * stats are pure integer arithmetic). The audio sibling of mm3. */
  private val qWavDecode = Q("mm5_wav_decode",
    (s, d) => {
      import s.implicits._
      val media = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("id"),
          (lit(64) + pmod(col("n_nationkey"), lit(5)) * 16).cast("int").as("ns"))
        .as[(Long, Int)]
        .map { case (k, ns) =>
          val samples = Array.tabulate(ns)(i =>
            (((k.toInt * 1717 + i * 313) % 65536) - 32768).toShort)
          (k, Multimodal.encodePcm16Wav(8000, samples))
        }
        .toDF("media_id", "data")
      Multimodal.decodeWavStats(media).orderBy("media_id")
    },
    Some("""WITH n AS (SELECT n_nationkey::BIGINT AS media_id,
          n_nationkey AS k, (64 + (n_nationkey % 5) * 16) AS ns FROM nation),
      i AS (SELECT media_id, k, ns,
          unnest(generate_series(0, ns - 1)) AS i FROM n),
      s AS (SELECT media_id, ns,
          ((k * 1717 + i * 313) % 65536) - 32768 AS v FROM i)
      SELECT media_id, 8000 AS sample_rate, 1 AS channels,
        ns::BIGINT AS n_samples, min(v)::INT AS s_min, max(v)::INT AS s_max,
        sum(v)::BIGINT AS s_sum, sum(abs(v))::BIGINT AS s_sumabs
      FROM s GROUP BY media_id, ns ORDER BY media_id"""))

  /** Substring-level (span) duplication profile — Lee et al. 2022's
    * exact-substring-dedup measurement at word-8-gram granularity: per
    * doc, how many start positions carry an n-gram that occurs anywhere
    * else in the corpus. Positional grams (duplicates kept), NOT the
    * distinct shingle sets of d3. */
  private val qRepeatedSpans = Q("dupspan1_repeated_spans",
    (s, d) => Dedup.repeatedSpanStats(t(s, d, "documents"), "doc_id", "text",
        n = 8)
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
      p AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM t WHERE len(w) >= 8),
      g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram FROM p),
      dg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      tot AS (SELECT gram, sum(c) AS ct FROM dg GROUP BY 1)
      SELECT dg.doc_id, sum(c)::BIGINT AS n_spans,
        sum(CASE WHEN ct > 1 THEN c ELSE 0 END)::BIGINT AS n_dup_spans,
        round(sum(CASE WHEN ct > 1 THEN c ELSE 0 END)::DOUBLE / sum(c), 4)
          AS dup_ratio
      FROM dg JOIN tot USING (gram) GROUP BY 1 ORDER BY 1"""))

  /** Span removal applied (the other half of dupspan1): every non-first
    * occurrence of a duplicated 8-gram has its token range stripped, and
    * the cleaned text is reassembled — exact-substring dedup as a
    * transform, not just a measurement. */
  private val qRemoveSpans = Q("dupspan3_remove_spans",
    (s, d) => Dedup.removeRepeatedSpans(t(s, d, "documents"), "doc_id", "text",
        n = 8)
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'),
            x -> x <> '') AS wo,
          string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
      p AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM t WHERE len(w) >= 8),
      g AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS gram FROM p),
      r AS (SELECT doc_id, i,
          row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn FROM g),
      m AS (SELECT DISTINCT doc_id, unnest(generate_series(i, i + 7)) AS tp
        FROM r WHERE rn >= 2),
      tok AS (SELECT doc_id, unnest(wo) AS tok,
          unnest(generate_series(1, len(wo))) AS tp FROM t),
      kept AS (SELECT tok.doc_id, tok.tp, tok.tok FROM tok
        LEFT JOIN m ON tok.doc_id = m.doc_id AND tok.tp = m.tp
        WHERE m.doc_id IS NULL),
      agg AS (SELECT doc_id, count(*) AS n_kept,
          string_agg(tok, ' ' ORDER BY tp) AS text_clean FROM kept GROUP BY 1)
      SELECT t.doc_id, len(t.wo)::BIGINT AS n_tokens,
        (len(t.wo) - coalesce(n_kept, 0))::BIGINT AS n_removed,
        coalesce(text_clean, '') AS text_clean
      FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  /** Corpus-wide most-repeated 8-grams (the boilerplate/template report
    * behind span-removal thresholds); deterministic (n_occ desc, gram)
    * order before the top-20 cut — TakeOrderedAndProject, no global
    * sort. */
  private val qTopRepeatedSpans = Q("dupspan2_top_repeated",
    (s, d) => Dedup.topRepeatedSpans(t(s, d, "documents"), "doc_id", "text",
        n = 8, k = 20),
    Some("""WITH t AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
      p AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM t WHERE len(w) >= 8),
      g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram FROM p)
      SELECT gram, count(*)::BIGINT AS n_occ,
        count(DISTINCT doc_id)::BIGINT AS n_docs
      FROM g GROUP BY 1 HAVING count(*) > 1
      ORDER BY n_occ DESC, gram LIMIT 20"""))

  /** Repeated-sentence removal per document — first occurrences kept in
    * order; the oracle rebuilds the same first-occurrence sequence from
    * zipped unnest positions. */
  private val qSentenceDedup = Q("t10_sentence_dedup",
    (s, d) => TextAnalysis.dedupSentences(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH s AS (SELECT doc_id,
        list_filter(list_transform(string_split_regex(text, '[.!?]+'),
          x -> trim(x)), x -> length(x) > 0) AS segs
        FROM documents),
      e AS (SELECT doc_id, unnest(segs) AS seg,
        unnest(range(1, len(segs) + 1)) AS pos FROM s),
      f AS (SELECT doc_id, seg, min(pos) AS p FROM e GROUP BY 1, 2),
      g AS (SELECT doc_id, count(*)::BIGINT AS n_unique,
        string_agg(seg, '. ' ORDER BY p) AS text_clean FROM f GROUP BY 1)
      SELECT s.doc_id,
        CASE WHEN segs IS NULL THEN NULL ELSE len(segs)::BIGINT END AS n_sentences,
        CASE WHEN segs IS NULL THEN NULL
          ELSE coalesce(g.n_unique, 0) END AS n_unique,
        CASE WHEN segs IS NULL THEN NULL
          ELSE coalesce(g.text_clean, '') END AS text_clean
      FROM s LEFT JOIN g USING (doc_id) ORDER BY doc_id"""))

  /** Cross-source contamination matrix over the corpus: shared distinct
    * 3-gram shingles per source pair, containment-normalized. */
  private val qSourceOverlap = Q("cont2_source_overlap",
    (s, d) => TextAnalysis.sourceOverlap(t(s, d, "documents"),
        "source", "text", n = 3)
      .orderBy("source_a", "source_b"),
    Some("""WITH t AS (SELECT source, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      s AS (SELECT source, unnest(list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END)) AS sh FROM t),
      d AS (SELECT DISTINCT source, sh FROM s),
      sz AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
          count(*) AS n_shared
        FROM d a JOIN d b ON a.sh = b.sh AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b, n_shared,
        round(n_shared::DOUBLE / least(za.n, zb.n), 6) AS overlap_frac
      FROM p JOIN sz za ON za.source = p.source_a
        JOIN sz zb ON zb.source = p.source_b
      ORDER BY source_a, source_b"""))

  /** Whole-catalog FK integrity audit: all 8 declared FKs checked —
    * the oracle repeats each count pair with NOT-EXISTS subqueries. */
  private def fkAuditOracle: String = {
    val fks = Seq(
      ("nation", "n_regionkey", "region", "r_regionkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("events", "user_id", "customer", "c_custkey"),
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"))
    fks.map { case (c, ck, p, pk) =>
      s"""SELECT '$c' AS child_table, '$ck' AS fk_columns, '$p' AS parent_table,
        (SELECT count(*) FROM $c WHERE $ck IS NOT NULL) AS n_checked,
        (SELECT count(*) FROM $c WHERE $ck IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM $p WHERE $p.$pk = $c.$ck)) AS n_dangling"""
    }.mkString("", " UNION ALL ",
      " ORDER BY child_table, fk_columns")
  }

  private val qFkAudit = Q("dq6_fk_audit",
    (s, d) => graft.analyze.DataQuality.fkAudit(catalog(s, d))
      .orderBy("child_table", "fk_columns"),
    Some(fkAuditOracle))

  /** Rank features per event type: percent rank + quartile over the
    * (value, event_id)-totalized order — rank definitions are standard
    * SQL, so the restatement is verbatim. */
  private val qRankFeatures = Q("fe4_rank_features",
    (s, d) => Features.rankFeatures(events(s, d), "event_type", "value",
        tie = "event_id")
      .select(col("event_id"), round(col("pct_rank"), 6).as("pct_rank"),
        col("tile"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
        round(percent_rank() OVER w, 6) AS pct_rank,
        ntile(4) OVER w AS tile
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_id"""))

  /** Propositionalization over orders→lineitem: the FastProp battery
    * (count + sum/mean/min/max per numeric + mode per categorical) per
    * parent key, joined back to orders — one partial-aggregating shuffle
    * for the numeric battery, one grouped-mode pass for the categorical.
    * Float parity: l_quantity is integer-valued (sums exact, mean =
    * exact-int/int — identical division both engines); extendedprice
    * SUM rounds at 4dp (boundary-safe for cent-valued doubles — the a7
    * device); min/max are value-picks, no summation order to disagree
    * on. */
  private val qPropositionalize = Q("fp1_propositionalize",
    (s, d) => graft.features.Propositionalize.features(
        t(s, d, "orders").select("o_orderkey"), t(s, d, "lineitem"),
        ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey")),
        numericCols = Seq("l_quantity", "l_extendedprice"),
        catCols = Seq("l_returnflag"), prefix = "li")
      .select(col("o_orderkey"), col("li_n"),
        col("li_l_quantity_sum").cast("double").as("q_sum"),
        round(col("li_l_quantity_mean"), 4).as("q_mean"),
        round(col("li_l_extendedprice_sum"), 4).as("p_sum"),
        col("li_l_extendedprice_min").as("p_min"),
        col("li_l_extendedprice_max").as("p_max"),
        col("li_l_returnflag_mode").as("flag_mode"))
      .orderBy("o_orderkey"),
    Some("""WITH agg AS (SELECT l_orderkey, count(*) AS li_n,
        sum(l_quantity)::DOUBLE AS q_sum,
        round(avg(l_quantity), 4) AS q_mean,
        round(sum(l_extendedprice), 4) AS p_sum,
        min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max
        FROM lineitem GROUP BY 1),
      m AS (SELECT l_orderkey, l_returnflag,
        row_number() OVER (PARTITION BY l_orderkey
          ORDER BY count(*) DESC, l_returnflag) AS rn
        FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1, 2)
      SELECT o_orderkey, coalesce(li_n, 0)::BIGINT AS li_n, q_sum, q_mean,
        p_sum, p_min, p_max, m.l_returnflag AS flag_mode
      FROM orders o
      LEFT JOIN agg ON o.o_orderkey = agg.l_orderkey
      LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON o.o_orderkey = m.l_orderkey
      ORDER BY o_orderkey"""))

  /** Depth-2 propositionalization (the reference's FastProp runs over
    * the BFS data model to max_depth, getml_xgboost.py:420): featurize
    * lineitem→orders first, then feed the ENRICHED orders table to the
    * customer hop — aggregate-of-aggregate features (total/mean lineitem
    * count per customer, max per-order quantity sum). Two aggregate
    * passes total. Float parity: counts and quantity sums are exact
    * integers in double; the only cent-valued battery column
    * (o_totalprice) appears as a SUM, rounded 4dp (a7 boundary rule);
    * li mean = exact-int/int. */
  private val qPropositionalizeDeep = Q("fp2_propositionalize_deep",
    (s, d) => {
      import graft.features.Propositionalize
      val ordersFeat = Propositionalize.features(
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        t(s, d, "lineitem"),
        ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey")),
        numericCols = Seq("l_quantity"), prefix = "li")
      Propositionalize.features(
          t(s, d, "customer").select("c_custkey"), ordersFeat,
          ForeignKeyDef(Seq("o_custkey"), "customer", Seq("c_custkey")),
          numericCols = Seq("li_n", "li_l_quantity_sum", "o_totalprice"),
          prefix = "ord")
        .select(col("c_custkey"), col("ord_n"),
          col("ord_li_n_sum").cast("double").as("li_total"),
          round(col("ord_li_n_mean"), 4).as("li_mean"),
          col("ord_li_l_quantity_sum_max").as("qsum_max"),
          round(col("ord_o_totalprice_sum"), 4).as("price_sum"))
        .orderBy("c_custkey")
    },
    Some("""WITH li AS (SELECT l_orderkey, count(*) AS li_n,
          sum(l_quantity) AS li_qsum FROM lineitem GROUP BY 1),
        o AS (SELECT o_custkey, o_totalprice,
          coalesce(li_n, 0) AS li_n, li_qsum
          FROM orders LEFT JOIN li ON o_orderkey = l_orderkey),
        agg AS (SELECT o_custkey, count(*) AS ord_n,
          sum(li_n)::DOUBLE AS li_total,
          round(avg(li_n), 4) AS li_mean,
          max(li_qsum) AS qsum_max,
          round(sum(o_totalprice), 4) AS price_sum
          FROM o GROUP BY 1)
      SELECT c_custkey, coalesce(ord_n, 0)::BIGINT AS ord_n, li_total,
        li_mean, qsum_max, price_sum
      FROM customer LEFT JOIN agg ON c_custkey = o_custkey
      ORDER BY c_custkey"""))

  /** Per-language min-max scaling of document length — group-relative
    * normalization; bit-identical division from identical min/max. */
  private val qGroupScaling = Q("sc2_grouped_scaling",
    (s, d) => Features.scaleByGroup(t(s, d, "documents"), "lang", "n_chars")
      .select(col("doc_id"), round(col("scaled"), 6).as("scaled"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
        round(CASE WHEN mx = mn THEN 0.0
          ELSE (n_chars - mn)::DOUBLE / (mx - mn) END, 6) AS scaled
      FROM (SELECT doc_id, n_chars::DOUBLE AS n_chars,
        min(n_chars::DOUBLE) OVER (PARTITION BY lang) AS mn,
        max(n_chars::DOUBLE) OVER (PARTITION BY lang) AS mx
        FROM documents) t
      ORDER BY doc_id"""))

  /** Robust median/MAD outlier profile per return flag — the anomaly gate
    * run on numeric features before training; medians rounded before use
    * so both engines flag identical rows. */
  private val qMadOutliers = Q("an1_mad_outliers",
    (s, d) => graft.analyze.Quantiles.madOutliers(
        t(s, d, "lineitem"), "l_returnflag", "l_extendedprice", k = 3.0)
      .orderBy("l_returnflag"),
    Some("""WITH m AS (SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS med
        FROM lineitem GROUP BY 1),
      d AS (SELECT l.l_returnflag, abs(l.l_extendedprice - m.med) AS dev, m.med
        FROM lineitem l JOIN m USING (l_returnflag)),
      md AS (SELECT l_returnflag, round(quantile_cont(dev, 0.5), 4) AS mad
        FROM d GROUP BY 1)
      SELECT d.l_returnflag, count(*) AS n,
        sum(CASE WHEN dev > 3.0 * 1.4826 * md.mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        min(d.med) AS median, min(md.mad) AS mad
      FROM d JOIN md USING (l_returnflag)
      GROUP BY 1 ORDER BY 1"""))

  /** Deterministic k-fold CV assignment — every order keeps its fold
    * across runs and engines (the md5 16-bit coin mod k). */
  private val qKFold = Q("w11_kfold",
    (s, d) => Sampling.kFold(
        t(s, d, "orders").select(col("o_orderkey")), "o_orderkey", k = 5)
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        ('0x' || substring(md5(o_orderkey::VARCHAR || ':cv'), 1, 4))::INT % 5 AS fold
      FROM orders ORDER BY o_orderkey"""))

  /** Sentence segmentation stats per document (RE2-safe split — the same
    * pattern runs in both engines; token-mean is an exact integer/integer
    * division, bit-identical with no rounding device). */
  private val qSentences = Q("snt1_sentence_stats",
    (s, d) => TextAnalysis.sentenceStats(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH s AS (SELECT doc_id,
        list_filter(list_transform(string_split_regex(text, '[.!?]+'),
          x -> trim(x)), x -> length(x) > 0) AS segs
        FROM documents)
      SELECT doc_id, len(segs)::BIGINT AS n_sentences,
        CASE WHEN len(segs) = 0 THEN 0.0
          ELSE list_sum(list_transform(segs,
            x -> len(string_split_regex(x, '\s+'))))::DOUBLE / len(segs)
        END AS avg_sentence_tokens
      FROM s ORDER BY doc_id"""))

  /** Gopher-style repetition signals over documents. */
  private val qRepetition = Q("t5_repetition_stats",
    (s, d) => TextAnalysis.repetitionStats(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      n AS (SELECT doc_id, w, len(w) AS n_tok, len(list_distinct(w)) AS n_uniq FROM t),
      tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
      cnt AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1,2),
      mx AS (SELECT doc_id, max(c) AS mc FROM cnt GROUP BY 1),
      g AS (SELECT doc_id, CASE WHEN len(w) < 2 THEN NULL
          ELSE len(list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1]))) END AS n_uniq2 FROM t)
      SELECT n.doc_id, n.n_tok, n.n_uniq,
        round(1.0 - n.n_uniq / n.n_tok::DOUBLE, 4) AS dup_word_frac,
        round(mx.mc / n.n_tok::DOUBLE, 4) AS top_word_frac,
        round(1.0 - g.n_uniq2 / (n.n_tok - 1)::DOUBLE, 4) AS dup_bigram_frac
      FROM n LEFT JOIN mx ON n.doc_id=mx.doc_id LEFT JOIN g ON n.doc_id=g.doc_id
      ORDER BY n.doc_id"""))

  /** Top-3 TF-IDF terms per document (smoothed idf, term-tiebroken rank). */
  private val qTfidf = Q("t6_tfidf_topk",
    (s, d) => TextAnalysis.tfidfTopK(t(s, d, "documents"), "doc_id", "text", 3)
      .orderBy("doc_id", "rk"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS term FROM t),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT count(*) AS n FROM t),
      sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
          tf.tf * ln((n.n + 1) / (df.df + 1.0)) AS score
        FROM tf JOIN df ON tf.term=df.term CROSS JOIN n),
      rk AS (SELECT *, row_number() OVER
          (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM sc)
      SELECT doc_id, term, tf, df, round(score, 4) AS score, rk
      FROM rk WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** Leakage-free group split: md5-prefix assignment per customer, rows
    * follow their group (orders counted per split through the FK). */
  private val qGroupSplit = Q("w8_group_split",
    (s, d) => {
      val c = Sampling.groupSplit(t(s, d, "customer"), "c_custkey")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("split"))
        .agg(count_distinct(col("c_custkey")).as("n_groups"),
          count(col("o_orderkey")).as("n_rows"))
        .orderBy("split")
    },
    Some("""WITH s AS (SELECT c_custkey, CASE
          WHEN substr(md5(c_custkey::VARCHAR),1,2) < 'cd' THEN 'train'
          ELSE 'test' END AS split FROM customer)
      SELECT s.split, count(DISTINCT s.c_custkey) AS n_groups,
        count(o.o_orderkey) AS n_rows
      FROM s LEFT JOIN orders o ON o.o_custkey = s.c_custkey
      GROUP BY 1 ORDER BY 1"""))

  /** Exact column quantiles in long form; `Quantiles.approx` is the
    * sketch-based 100 TB path (same output shape, not oracle-checkable). */
  private val qQuantiles = Q("a13_quantiles",
    (s, d) => Quantiles.exact(t(s, d, "lineitem"),
        Seq("l_extendedprice", "l_quantity"), Seq(0.25, 0.5, 0.75, 0.95))
      .select(col("col"), col("p"), round(col("q"), 4).as("q"))
      .orderBy("col", "p"),
    Some("""WITH q AS (
        SELECT 'l_extendedprice' AS col,
          quantile_cont(l_extendedprice, [0.25,0.5,0.75,0.95]) AS qs FROM lineitem
        UNION ALL
        SELECT 'l_quantity', quantile_cont(l_quantity, [0.25,0.5,0.75,0.95]) FROM lineitem)
      SELECT col, unnest([0.25,0.5,0.75,0.95])::DOUBLE AS p,
        round(unnest(qs), 4) AS q FROM q ORDER BY col, p"""))

  /** Interval join (the streaming-capable twin of rj1): purchase×click
    * pairs within 24h per user. The batch plan (key equi-join + range
    * filter) is what the oracle checks; EventStreamSpec drives the same
    * function as a watermarked stream-stream join. */
  private val qIntervalJoin = Q("st4_interval_join",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      EventStream.intervalJoin(purchases, clicks, "p_user", "c_user",
          "p_ts", "c_ts", lower = "0 seconds", upper = "24 hours")
        .select(col("p_id"), col("c_id"))
        .orderBy("p_id", "c_id")
    },
    Some("""SELECT p.event_id AS p_id, c.event_id AS c_id
      FROM events p JOIN events c ON c.user_id = p.user_id
        AND p.event_type='purchase' AND c.event_type='click'
        AND date_trunc('microseconds', c.ts) >= date_trunc('microseconds', p.ts)
        AND date_trunc('microseconds', c.ts) <
          date_trunc('microseconds', p.ts) + INTERVAL 24 HOUR
      ORDER BY p_id, c_id"""))

  /** BM25 ranking of documents for a fixed query term set (k1=1.2, b=0.75;
    * only docs matching ≥1 term appear). */
  private val qBm25 = Q("t7_bm25",
    (s, d) => TextAnalysis.bm25(t(s, d, "documents"), "doc_id", "text",
        Seq("table", "query", "fast"))
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS term FROM t),
      lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      stats AS (SELECT avg(dl::DOUBLE) AS avgdl FROM lens),
      n AS (SELECT count(*) AS n FROM t),
      q AS (SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ('table','query','fast') GROUP BY 1,2),
      dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        WHERE term IN ('table','query','fast') GROUP BY 1),
      sc AS (SELECT q.doc_id,
          ln(1.0 + (n.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
          (q.tf * (1.2 + 1.0) / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / stats.avgdl))) AS s
        FROM q JOIN dfq ON q.term=dfq.term JOIN lens ON q.doc_id=lens.doc_id
        CROSS JOIN n CROSS JOIN stats)
      SELECT doc_id, round(sum(s), 4) AS bm25 FROM sc
      GROUP BY 1 ORDER BY doc_id"""))

  /** PQ ANN with an unbounded shortlist: exact re-rank over every
    * candidate ≡ brute force (the correctness anchor, like sim3's
    * nProbe=nCells); PqSpec measures the bounded-shortlist approximate
    * path's recall on clustered data. */
  private val qPqTopK = Q("sim4_pq_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val cb = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = 2)
      graft.similarity.Pq.pqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3, cb, refine = Int.MaxValue, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    qBruteTopK.oracle)

  /** IVF-PQ composition at full probe + unbounded shortlist ≡ brute force
    * (anchor); PqSpec measures the pruned/bounded path. Quantizer quality
    * is irrelevant to the anchor (exactness comes from the re-rank), so
    * training is minimal here — ksub=8/iters=1 halves the codegen width
    * and quantizer cost vs sim4's realistic parameters. */
  private val qIvfPqTopK = Q("sim5_ivfpq_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nCells = 8, iters = 1)
      val cb = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 8, iters = 1)
      graft.similarity.Pq.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3, cents, cb,
          nProbe = 8, refine = Int.MaxValue, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    qBruteTopK.oracle)

  /** Deterministic content-hash sample (~10%: md5 prefix < '1a' = 26/256):
    * a pure filter that pushes toward the scan and agrees across engines
    * and data arrivals. */
  private val qHashSample = Q("s10_hash_sample",
    (s, d) => Sampling.hashSample(t(s, d, "orders"), "o_orderkey", "1a")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey FROM orders
      WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '1a' ORDER BY o_orderkey"""))

  /** Shipping-priority analytic query (TPC-H Q3 shape): segment-filtered
    * customer×orders×lineitem, revenue per order, top-10 — the
    * filter-join-aggregate-topN slice. Ordering is on the ROUNDED revenue
    * (identical on both engines) with an id tiebreak, so the LIMIT
    * boundary is deterministic. */
  /** TPC-H Q6 shape — the pushdown showcase: a single filtered scan whose
    * three predicates all reach the parquet reader, one map-side partial
    * sum, a 1-row result. The canonical "is the scan actually pruned"
    * benchmark query. */
  private val qQ6 = Q("q6_forecast_revenue",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue")),
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24"""))

  /** TPC-H Q10 shape — returned-item customer ranking: 3-way join,
    * per-customer revenue, top 20. Revenue is ROUNDED BEFORE ranking
    * (with a key tiebreak) so both engines cut the same top 20 even when
    * summation order shifts an ulp. */
  private val qQ10 = Q("q10_returned_items",
    (s, d) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  private val qQ3 = Q("q3_shipping_priority",
    (s, d) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING" &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") >= lit("1996-06-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          unix_timestamp(col("o_orderdate")).as("odate_s"), col("o_orderpriority"))
    },
    Some("""SELECT l_orderkey, revenue, odate_s, o_orderpriority FROM (
        SELECT l_orderkey,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          floor(epoch(o_orderdate))::BIGINT AS odate_s, o_orderpriority
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate >= TIMESTAMP '1996-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10)
      ORDER BY revenue DESC, l_orderkey"""))

  /** Incremental ingestion dedup: drop arriving documents whose content
    * fingerprint already exists in the historical set — a fingerprint
    * LEFT ANTI join (the registry's anti-join shape). At 100 TB the
    * history side is a bucketed fingerprint table; here it is a
    * deterministic hash-sample of the corpus standing in for "yesterday's
    * data". */
  private val qIncrementalDedup = Q("d7_incremental_dedup",
    (s, d) => {
      val docs = t(s, d, "documents")
      val fp = TextAnalysis.fingerprint(col("text"))
      val history = Sampling.hashSample(docs, "doc_id", "40")
        .select(fp.as("fp")).distinct()
      docs.withColumn("fp", fp)
        .join(history, Seq("fp"), "left_anti")
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    Some("""WITH hist AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
        FROM documents WHERE substr(md5(doc_id::VARCHAR),1,2) < '40')
      SELECT d.doc_id FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM hist
        WHERE hist.fp = md5(lower(trim(d.text))))
      ORDER BY doc_id"""))

  /** PageRank over the orders→customer FK graph (bipartite: rank flows to
    * heavily-ordered customers). Iterative float fixpoint — no SQL
    * restatement; PageRankSpec pins closed-form fixpoints, mass
    * conservation and dangling redistribution. */
  private val qPageRank = Q("pr1_pagerank",
    (s, d) => {
      val orders = t(s, d, "orders")
      val vertices = orders.select(col("o_orderkey").as("id"))
        .unionAll(t(s, d, "customer").select((col("c_custkey") + 1000000L).as("id")))
      val edges = orders.select(col("o_orderkey").as("src"),
        (col("o_custkey") + 1000000L).as("dst"))
      graft.graph.PageRank.run(vertices, "id", edges, iters = 5)
        .filter(col("id") >= 1000000L) // report the customer side
        .select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy("id")
    },
    None)

  /** lp1's oracle: both engines run the SAME two synchronous
    * label-propagation rounds over the order–customer FK graph — the
    * neighbor-mode update (count desc, min-label tiebreak) is pure integer
    * arithmetic, so the unrolled SQL restatement is exact, no rounding
    * device needed. */
  private def labelPropOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""n$k AS (SELECT e.dst, l.label, count(*) AS c
        FROM e JOIN l${k - 1} l ON e.src = l.id GROUP BY 1, 2),
      m$k AS (SELECT dst AS id, label AS newl FROM (
        SELECT dst, label,
          row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
        FROM n$k) t WHERE rn = 1),
      l$k AS (SELECT l.id, coalesce(m.newl, l.label) AS label
        FROM l${k - 1} l LEFT JOIN m$k m USING (id))"""
    }.mkString(",\n      ")
    s"""WITH v AS (SELECT o_orderkey::BIGINT AS id FROM orders
        UNION ALL SELECT c_custkey + 1000000 FROM customer),
      e AS (SELECT o_orderkey::BIGINT AS src, (o_custkey + 1000000)::BIGINT AS dst FROM orders
        UNION ALL SELECT o_custkey + 1000000, o_orderkey FROM orders),
      l0 AS (SELECT id, id AS label FROM v),
      $rounds
      SELECT id, label FROM l$iters ORDER BY id"""
  }

  /** Label-propagation communities over the order–customer graph: two
    * synchronous min-tiebreak rounds, fully oracle-checked (16.5k rows at
    * sf0.01 — every label hash-compared). */
  private val qLabelProp = Q("lp1_label_prop",
    (s, d) => {
      val orders = t(s, d, "orders")
      val vertices = orders.select(col("o_orderkey").cast("long").as("id"))
        .unionAll(t(s, d, "customer")
          .select((col("c_custkey") + 1000000L).as("id")))
      val edges = orders.select(col("o_orderkey").cast("long").as("src"),
          (col("o_custkey") + 1000000L).as("dst"))
        .unionAll(orders.select((col("o_custkey") + 1000000L).as("src"),
          col("o_orderkey").cast("long").as("dst")))
      graft.graph.LabelProp.run(vertices, "id", edges, iters = 2)
        .orderBy("id")
    },
    Some(labelPropOracle(2)))

  /** pr1's oracle anchor: the same iterate-to-fixpoint loop on a literal
    * 4-cycle, where every iteration's arithmetic is EXACT — (1−d) is exact
    * by Sterbenz, /4 and ·0.25 are power-of-two scalings, and the two
    * addends sum to the representable 1/4 — so ranks stay bit-exactly
    * 0.25 and the closed-form expected output IS the oracle. The big
    * rows-only pr1 stays the scale exercise; this row moves the loop's
    * SEMANTICS (damping, contribution split, convergence plumbing) under
    * the driver gate. */
  private val qPageRankAnchor = Q("pr1b_pagerank_anchor",
    (s, d) => {
      import s.implicits._
      val vertices = (1L to 4L).toDF("id")
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
      graft.graph.PageRank.run(vertices, "id", edges, iters = 5, validate = true)
        .select(col("id"), col("rank").as("pr"))
        .orderBy("id")
    },
    Some("""SELECT * FROM (VALUES (1::BIGINT, 0.25::DOUBLE),
      (2::BIGINT, 0.25::DOUBLE), (3::BIGINT, 0.25::DOUBLE),
      (4::BIGINT, 0.25::DOUBLE)) AS t(id, pr) ORDER BY id"""))

  /** Weighted PageRank on a literal micro-graph, 2 iterations unrolled in
    * SQL — weights chosen so every per-source weight sum and fraction is
    * an exact binary value, making both engines' arithmetic identical
    * step for step (every vertex has out-edges, so the dangling term is
    * exactly 0 each round). */
  private val qWeightedPr = Q("wpr1_weighted_pagerank",
    (s, d) => {
      import s.implicits._
      val v = (1L to 4L).toDF("id")
      val e = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 2.0),
        (3L, 1L, 1.0), (4L, 1L, 5.0)).toDF("src", "dst", "w")
      graft.graph.PageRank.runWeighted(v, "id", e, "w", iters = 2)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .orderBy("id")
    },
    Some("""WITH v AS (SELECT * FROM (VALUES (1::BIGINT), (2), (3), (4)) t(id)),
      e AS (SELECT * FROM (VALUES (1::BIGINT, 2::BIGINT, 3.0::DOUBLE),
        (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0)) t(src, dst, w)),
      f AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS frac FROM e),
      r0 AS (SELECT id, 0.25 AS rank FROM v),
      c1 AS (SELECT f.dst AS id, sum(r.rank * f.frac) AS s
        FROM f JOIN r0 r ON f.src = r.id GROUP BY 1),
      r1 AS (SELECT v.id, (1 - 0.85)/4 + 0.85 * (coalesce(c.s, 0.0) + 0.0) AS rank
        FROM v LEFT JOIN c1 c ON v.id = c.id),
      c2 AS (SELECT f.dst AS id, sum(r.rank * f.frac) AS s
        FROM f JOIN r1 r ON f.src = r.id GROUP BY 1),
      r2 AS (SELECT v.id, (1 - 0.85)/4 + 0.85 * (coalesce(c.s, 0.0) + 0.0) AS rank
        FROM v LEFT JOIN c2 c ON v.id = c.id)
      SELECT id, round(rank, 6) AS pr FROM r2 ORDER BY id"""))

  /** kc1's oracle anchor: the distributed peel on a literal triangle+tail
    * graph whose unique fixpoint is closed-form (peel 5 then 4; the
    * triangle survives at k=2 with degree 2 each) — integer degrees, no
    * float anywhere, expected output stated as VALUES. */
  private val qKCoreAnchor = Q("kc1b_kcore_anchor",
    (s, d) => {
      import s.implicits._
      val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
        .toDF("u", "v")
      graft.graph.KCore.vertices(e, "u", "v", k = 2).orderBy("id")
    },
    Some("""SELECT * FROM (VALUES (1::BIGINT, 2::BIGINT),
      (2::BIGINT, 2::BIGINT), (3::BIGINT, 2::BIGINT)) AS t(id, degree)
      ORDER BY id"""))

  /** Hierarchical rollup with explicit subtotal labels and grouping_id —
    * ONE aggregate over the expanded grouping sets. */
  private val qRollup = Q("a14_rollup",
    (s, d) => Olap.rollupAgg(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        Seq(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("sum_qty"), col("n"), col("gid"))
      .orderBy("gid", "flag", "status"),
    Some("""SELECT coalesce(l_returnflag,'(all)') AS flag,
        coalesce(l_linestatus,'(all)') AS status,
        sum(l_quantity) AS sum_qty, count(*) AS n,
        GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, flag, status"""))

  /** Full cube over both dimensions — rollup's every-subset sibling, ONE
    * aggregate over the expanded grouping sets (4 sets vs rollup's 3). */
  private val qCube = Q("a22_cube",
    (s, d) => Olap.cubeAgg(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        Seq(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("sum_qty"), col("n"), col("gid"))
      .orderBy("gid", "flag", "status"),
    Some("""SELECT coalesce(l_returnflag,'(all)') AS flag,
        coalesce(l_linestatus,'(all)') AS status,
        sum(l_quantity) AS sum_qty, count(*) AS n,
        GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY gid, flag, status"""))

  /** Event-type counts pivoted wide per user (enumerated domain — no
    * domain-discovery scan). */
  private val qPivot = Q("a15_pivot",
    (s, d) => Olap.pivotCounts(events(s, d), "user_id", "event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
        count(*) FILTER (WHERE event_type='click') AS click,
        count(*) FILTER (WHERE event_type='error') AS error,
        count(*) FILTER (WHERE event_type='purchase') AS purchase,
        count(*) FILTER (WHERE event_type='signup') AS signup,
        count(*) FILTER (WHERE event_type='view') AS view
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** Fixed-width histogram with clamped edges and a complete bucket spine. */
  private val qHistogram = Q("a16_histogram",
    (s, d) => Olap.histogram(t(s, d, "lineitem"), "l_extendedprice",
        lo = 0.0, hi = 110000.0, nBuckets = 10)
      .orderBy("bucket"),
    Some("""WITH b AS (SELECT least(greatest(
          floor((l_extendedprice - 0.0)/11000.0)::BIGINT, 0), 9) AS bucket
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1)
      SELECT r.range AS bucket, (0.0 + r.range*11000.0)::DOUBLE AS lo,
        coalesce(c.n, 0) AS n
      FROM range(0,10) r LEFT JOIN c ON c.bucket = r.range ORDER BY bucket"""))

  // ====================================================================
  // Behavioral analytics / data layout / sampling / contamination (round 6)
  // ====================================================================

  /** Ordered signup→click→purchase funnel over the first day: one fold
    * per user, no stage-count joins (the SQL restatement IS the n-join
    * form — the engine's one-shuffle fold must agree with it exactly).
    * The day slice keeps stage counts strictly decaying, so the
    * strict-order semantics are actually discriminated, not saturated. */
  private val qFunnel = Q("fn1_funnel",
    (s, d) => Behavior.funnel(
        events(s, d).filter(col("ts") < lit("2024-01-02").cast("timestamp")),
        "user_id", "event_type", "ts", Seq("signup", "click", "purchase"))
      .orderBy("stage"),
    Some("""WITH e AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-02'),
      s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        WHERE event_type='signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
        JOIN s1 USING (user_id)
        WHERE e.event_type='click' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
        JOIN s2 USING (user_id)
        WHERE e.event_type='purchase' AND e.ts > s2.t2 GROUP BY 1)
      SELECT 0 AS stage, 'signup' AS name, (SELECT count(*) FROM s1) AS users
      UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s2)
      UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s3)
      ORDER BY stage"""))

  /** Cohort retention: first-event-date cohorts × whole-week offsets,
    * distinct active users per cell. */
  private val qCohort = Q("coh1_cohort_retention",
    (s, d) => Behavior.cohortRetention(events(s, d), "user_id", "ts")
      .orderBy("cohort_day", "week_offset"),
    Some("""WITH f AS (SELECT user_id, min(ts::DATE) AS cohort_day
        FROM events GROUP BY 1)
      SELECT f.cohort_day::VARCHAR AS cohort_day,
        (date_diff('day', f.cohort_day, e.ts::DATE) // 7)::INT AS week_offset,
        count(DISTINCT e.user_id) AS users
      FROM events e JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** SCD2 dimension history from the purchase change log: per-user value
    * tier versioned with half-open validity intervals; consecutive
    * same-tier purchases collapse into one version. */
  private val qScd2 = Q("scd1_scd2_history",
    (s, d) => Features.scd2(
        events(s, d).filter(col("event_type") === "purchase")
          .withColumn("tier", floor(col("value") / 25)),
        "user_id", "ts", "tier", "event_id")
      .orderBy("user_id", "valid_from_us"),
    Some("""WITH p AS (SELECT user_id, ts, event_id,
          floor(value / 25)::BIGINT AS tier
        FROM events WHERE event_type='purchase'),
      w AS (SELECT *, lag(tier) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM p),
      c AS (SELECT user_id, ts, event_id, tier FROM w
        WHERE prev IS DISTINCT FROM tier),
      v AS (SELECT user_id, tier, epoch_us(ts) AS valid_from_us,
          epoch_us(lead(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us
        FROM c)
      SELECT user_id, tier, valid_from_us, valid_to_us,
        valid_to_us IS NULL AS is_current
      FROM v ORDER BY user_id, valid_from_us"""))

  /** Key-skew diagnosis on the orders→customer FK: the profile a pipeline
    * reads before choosing salting / AQE settings. */
  private val qKeyProfile = Q("sk2_key_profile",
    (s, d) => graft.agg.Skew.keyProfile(t(s, d, "orders"), "o_custkey"),
    Some("""WITH c AS (SELECT o_custkey, count(*) AS c FROM orders GROUP BY 1),
      t AS (SELECT sum(c)::BIGINT AS n, count(*) AS n_keys,
        max(c) AS max_key_rows, stddev_samp(c) AS sd, avg(c) AS mean FROM c)
      SELECT t.n AS n_rows, t.n_keys, t.max_key_rows,
        round(t.max_key_rows / t.n::DOUBLE, 6) AS max_share,
        round(t.sd / t.mean, 4) AS count_cv,
        round(-sum((c.c / t.n::DOUBLE) * ln(c.c / t.n::DOUBLE)), 4) AS entropy_nats
      FROM c CROSS JOIN t
      GROUP BY t.n, t.n_keys, t.max_key_rows, t.sd, t.mean"""))

  /** Engine-portable stratified downsample (md5 coin): rebalance the
    * corpus by language — keep 25% of en, 50% of de, all the rest. */
  private val qStratified = Q("w9_stratified_sample",
    (s, d) => Sampling.stratifiedSamplePortable(t(s, d, "documents"),
        "lang", "doc_id", Map("en" -> 0.25, "de" -> 0.5))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang FROM documents
      WHERE substr(md5(doc_id::VARCHAR || ':42'), 1, 4) <
        CASE lang WHEN 'en' THEN '4000' WHEN 'de' THEN '8000' ELSE 'g' END
      ORDER BY doc_id"""))

  /** Benchmark-contamination scan: share of each document's 3-gram
    * shingles found in a (hash-sampled) benchmark set — the
    * decontamination gate of a training-data pipeline. The sampled docs
    * themselves score 1.0 by construction. */
  private val qContamination = Q("cont1_contamination",
    (s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.contamination(docs,
          Sampling.hashSample(docs, "doc_id", "20"), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      ds AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      bs AS (SELECT DISTINCT sh FROM (SELECT unnest(toks) AS sh FROM s
        WHERE substr(md5(doc_id::VARCHAR),1,2) < '20')),
      pd AS (SELECT d.doc_id, count(*) AS n_shingles,
          sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
        FROM ds d LEFT JOIN bs b ON d.sh = b.sh GROUP BY 1)
      SELECT doc.doc_id, pd.n_shingles, pd.n_hit,
        round(pd.n_hit / pd.n_shingles::DOUBLE, 4) AS contaminated_frac
      FROM documents doc LEFT JOIN pd ON doc.doc_id = pd.doc_id
      ORDER BY doc.doc_id"""))

  /** Z-order (Morton) clustering key over (o_custkey, o_orderkey): 64
    * interleave-prefix buckets, each covering a compact rectangle of key
    * space — the min/max spans per bucket are exactly the file statistics
    * data skipping would prune on. Native codegen expression on the Spark
    * side; generated bit-arithmetic restatement on the oracle side. */
  private def zorderSql(aExpr: String, bExpr: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($aExpr) >> $i) & 1) * ${1L << (2 * i)}",
      s"((($bExpr) >> $i) & 1) * ${1L << (2 * i + 1)}")).mkString("(", " + ", ")")

  private val qZOrder = Q("zo1_zorder_stats",
    (s, d) => t(s, d, "orders")
      .groupBy(shiftright(ZOrder.z(col("o_custkey"), col("o_orderkey"), 10), 14)
        .as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_custkey")).as("min_ck"), max(col("o_custkey")).as("max_ck"),
        min(col("o_orderkey")).as("min_ok"), max(col("o_orderkey")).as("max_ok"))
      .orderBy("zbucket"),
    Some(s"""SELECT ${zorderSql("o_custkey & 1023", "o_orderkey & 1023", 10)} >> 14
        AS zbucket,
        count(*) AS n, min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
        min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Triangle count of the co-purchase graph (parts sharing an order):
    * degree-oriented wedge enumeration on the Spark side — bounded m^1.5
    * wedges at any skew — against the naive 3-way self-join restatement
    * (same count by definition, affordable at oracle SF). */
  private val qTriangles = Q("tc1_triangle_count",
    (s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      graft.graph.Triangles.count(e, "u", "v")
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      SELECT count(*) AS triangles FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v"""))

  /** Latest-wins MERGE: a 10% update batch (status 'U') plus a 4% batch of
    * brand-new keys (status 'N') upserted into orders — one tagged union +
    * one per-key window against the FULL-JOIN/coalesce restatement. */
  private val qUpsert = Q("up1_merge_upsert",
    (s, d) => {
      val cur = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"))
      val changed = Sampling.hashSample(cur, "o_orderkey", "10")
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"))
      // fresh keys are negated, not offset: an offset collides with real
      // orderkeys once SF grows past the offset/6M mark, a negative key never
      val fresh = Sampling.hashSample(cur, "o_orderkey", "04")
        .select((-col("o_orderkey")).as("o_orderkey"),
          lit("N").as("o_orderstatus"))
      graft.sources.Merge.upsert(cur, changed.unionAll(fresh), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },
    Some("""WITH u AS (SELECT o_orderkey, 'U' AS o_orderstatus FROM orders
        WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '10'
        UNION ALL
        SELECT -o_orderkey, 'N' FROM orders
        WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '04')
      SELECT coalesce(u.o_orderkey, o.o_orderkey) AS o_orderkey,
        coalesce(u.o_orderstatus, o.o_orderstatus) AS o_orderstatus
      FROM orders o FULL JOIN u ON o.o_orderkey = u.o_orderkey
      ORDER BY o_orderkey"""))

  /** Declarative data-quality gate: six expectations over orders — five
    * compiled into ONE conditional-aggregate scan, plus one anti-join
    * referential check (the parent deliberately filtered so violations are
    * non-zero and the count is actually discriminated). */
  private val qDataQuality = Q("dq1_expectations",
    (s, d) => {
      import graft.analyze.DataQuality._
      run(t(s, d, "orders"), Seq(
        NotNull("o_custkey"),
        Unique(Seq("o_orderkey")),
        InRange("o_totalprice", 1000, 300000),
        InSet("o_orderstatus", Seq("O", "F")),
        Matches("o_orderpriority", "^[1-3]-"),
        RefIntegrity("o_custkey",
          t(s, d, "customer").filter(col("c_custkey") < 1000), "c_custkey")))
        .orderBy("expectation")
    },
    Some("""WITH a AS (SELECT
        sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_nn,
        (count(o_orderkey) - count(DISTINCT o_orderkey))::BIGINT AS v_uq,
        sum(CASE WHEN o_totalprice IS NOT NULL
          AND (o_totalprice < 1000 OR o_totalprice > 300000)
          THEN 1 ELSE 0 END)::BIGINT AS v_rg,
        sum(CASE WHEN o_orderstatus IS NOT NULL
          AND o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END)::BIGINT AS v_st,
        sum(CASE WHEN o_orderpriority IS NOT NULL
          AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
          THEN 1 ELSE 0 END)::BIGINT AS v_re
        FROM orders),
      r AS (SELECT count(*)::BIGINT AS v_fk FROM orders o
        LEFT JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 1000) c
        ON o.o_custkey = c.c_custkey
        WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
      SELECT expectation, violations FROM (
        SELECT 'not_null(o_custkey)' AS expectation, v_nn AS violations FROM a
        UNION ALL SELECT 'unique(o_orderkey)', v_uq FROM a
        UNION ALL SELECT 'in_range(o_totalprice,1000.0,300000.0)', v_rg FROM a
        UNION ALL SELECT 'in_set(o_orderstatus)', v_st FROM a
        UNION ALL SELECT 'matches(o_orderpriority)', v_re FROM a
        UNION ALL SELECT 'ref_integrity(o_custkey)', v_fk FROM r)
      ORDER BY expectation"""))

  /** Pairwise Pearson correlations over lineitem numerics — one aggregate
    * pass computes every pair, exploded to long form. */
  private val qCorrelation = Q("a17_correlation",
    (s, d) => {
      val li = t(s, d, "lineitem")
      val a = li.agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c1"),
        corr(col("l_quantity"), col("l_discount")).as("c2"),
        corr(col("l_extendedprice"), col("l_discount")).as("c3"))
      a.select(explode(array(
          struct(lit("l_quantity").as("x"), lit("l_extendedprice").as("y"),
            round(col("c1"), 4).as("corr")),
          struct(lit("l_quantity").as("x"), lit("l_discount").as("y"),
            round(col("c2"), 4).as("corr")),
          struct(lit("l_extendedprice").as("x"), lit("l_discount").as("y"),
            round(col("c3"), 4).as("corr")))).as("r"))
        .select(col("r.x").as("x"), col("r.y").as("y"), col("r.corr").as("corr"))
        .orderBy("x", "y")
    },
    Some("""WITH a AS (SELECT
        corr(l_quantity, l_extendedprice) AS c1,
        corr(l_quantity, l_discount) AS c2,
        corr(l_extendedprice, l_discount) AS c3 FROM lineitem)
      SELECT x, y, corr FROM (
        SELECT 'l_quantity' AS x, 'l_extendedprice' AS y, round(c1,4) AS corr FROM a
        UNION ALL SELECT 'l_quantity', 'l_discount', round(c2,4) FROM a
        UNION ALL SELECT 'l_extendedprice', 'l_discount', round(c3,4) FROM a)
      ORDER BY x, y"""))

  /** Equal-frequency quartiles of l_extendedprice: percentile boundaries
    * (4-decimal-rounded, the cross-engine-stable compare) bucket the scan;
    * per-bin count/lo/hi. The feature-binning step of a training
    * pipeline. */
  private val qEqualFreqBins = Q("qd1_equal_freq_bins",
    (s, d) => Quantiles.equalFrequencyBins(t(s, d, "lineitem"),
        "l_extendedprice", k = 4)
      .orderBy("bin"),
    Some("""WITH b AS (SELECT quantile_cont(l_extendedprice,
          [0.25,0.5,0.75]::DOUBLE[]) AS q
        FROM lineitem WHERE l_extendedprice IS NOT NULL)
      SELECT (1 + len(list_filter(b.q, x -> l.l_extendedprice > round(x,4))))::INT
          AS bin,
        count(*) AS n, round(min(l_extendedprice),2) AS lo,
        round(max(l_extendedprice),2) AS hi
      FROM lineitem l CROSS JOIN b
      WHERE l.l_extendedprice IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** Corpus-level heavy hitters: top-10 tokens with deterministic count-
    * then-term tiebreak — stopword discovery / vocabulary pruning. Partial
    * (map-side) aggregation does the heavy lifting; only (term, n) pairs
    * shuffle. */
  private val qHeavyHitters = Q("freq1_heavy_hitters",
    (s, d) => t(s, d, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(10),
    Some("""WITH tok AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS term
        FROM documents WHERE text IS NOT NULL)
      SELECT term, count(*) AS n FROM tok
      GROUP BY 1 ORDER BY n DESC, term LIMIT 10"""))

  /** Per-language document-length quantiles: grouped exact percentiles in
    * long form — the stratified distribution profile. */
  private val qGroupedQuantiles = Q("a18_grouped_quantiles",
    (s, d) => Quantiles.groupedExact(t(s, d, "documents"), "lang", "n_chars",
        Seq(0.25, 0.5, 0.75))
      .orderBy("lang", "p"),
    Some("""SELECT lang, p, q FROM (
        SELECT lang, 0.25::DOUBLE AS p, round(quantile_cont(n_chars, 0.25), 4) AS q
        FROM documents GROUP BY lang
        UNION ALL SELECT lang, 0.5::DOUBLE, round(quantile_cont(n_chars, 0.5), 4)
        FROM documents GROUP BY lang
        UNION ALL SELECT lang, 0.75::DOUBLE, round(quantile_cont(n_chars, 0.75), 4)
        FROM documents GROUP BY lang)
      ORDER BY lang, p"""))

  /** MMR-diversified ANN: widened brute-force shortlist re-ranked for
    * diversity (λ = 0.7). Greedy selection is sequential per query —
    * rows-only (SimilaritySpec pins the greedy reference); the shortlist
    * itself is the oracle-checked sim1 pipeline. */
  private val qMmr = Q("sim6_mmr_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val shortlist = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
        emb, "vec_id", "embedding", k = 15, roundDigits = 6)
      Similarity.mmrRerank(shortlist, emb, "vec_id", "embedding",
          m = 5, lambda = 0.7)
        .orderBy("query_id", "rank")
    },
    None)

  /** Degenerate-parameter MMR anchor: λ = 1 zeroes the diversity term, so
    * by mmrRerank's own contract the greedy selection reduces to plain
    * relevance order with the (cos desc, id) tiebreak — i.e. the top-m of
    * the brute-force shortlist, restated in SQL as a rank cut. `sim6`
    * stays the rows-only diversity exercise at λ = 0.7. */
  private val qMmrAnchor = Q("sim6b_mmr_exact_anchor",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val shortlist = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
        emb, "vec_id", "embedding", k = 15, roundDigits = 6)
      Similarity.mmrRerank(shortlist, emb, "vec_id", "embedding",
          m = 5, lambda = 1.0)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        round(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]), 6) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
      SELECT query_id, neighbor_id, cos, rn AS rank FROM ranked
      WHERE rn <= 5 ORDER BY query_id, rank"""))

  /** Sliding-window token chunking (window 32, stride 24): the
    * context-length-bounded training-sample cutter. Pure per-row explode —
    * zero shuffles; the DuckDB restatement is generate_series over the
    * same start arithmetic. */
  private val qChunks = Q("chunk1_sliding_windows",
    (s, d) => graft.text.Chunker.slidingChunks(t(s, d, "documents"),
        "doc_id", "text", window = 32, stride = 24)
      .orderBy("doc_id", "chunk_id"),
    Some("""WITH tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
      st AS (SELECT doc_id, ts,
          unnest(generate_series(1, greatest(1, len(ts) - 8), 24)) AS s
        FROM tok)
      SELECT doc_id, ((s - 1) // 24 + 1)::BIGINT AS chunk_id,
        len(ts[s : s + 31])::BIGINT AS n_tokens,
        array_to_string(ts[s : s + 31], ' ') AS chunk
      FROM st ORDER BY doc_id, chunk_id"""))

  /** Whole-word blocklist redaction over documents: scrub + per-doc hit
    * count in one scan (content filtering for pretraining corpora). */
  private val qRedact = Q("red1_blocklist_redact",
    (s, d) => graft.text.Chunker.redactBlocklist(t(s, d, "documents"),
        "doc_id", "text", Seq("hash", "join", "scan"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
        len(regexp_extract_all(text, '(?i)\b(hash|join|scan)\b'))::BIGINT AS n_redacted,
        regexp_replace(text, '(?i)\b(hash|join|scan)\b', '[REDACTED]', 'g') AS redacted
      FROM documents ORDER BY doc_id"""))

  /** Corpus-trained bigram-LM surprisal (add-1 smoothing) — the
    * perplexity-style quality score; the model is plain aggregation, so
    * the whole learned pipeline restates as SQL. */
  private val qSurprisal = Q("lm1_bigram_surprisal",
    (s, d) => graft.text.LangModel.bigramSurprisal(t(s, d, "documents"),
        "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
          AND len(string_split(lower(trim(text)), ' ')) >= 2),
      bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM (SELECT doc_id, ts,
            unnest(generate_series(1, len(ts) - 1)) AS i FROM tok)),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      v AS (SELECT count(DISTINCT t) AS v
        FROM (SELECT unnest(ts) AS t FROM tok)),
      sc AS (SELECT bg.doc_id, -ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.v)) AS s
        FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
      SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        round(avg(s), 4) AS surprisal
      FROM sc GROUP BY 1 ORDER BY doc_id"""))

  /** Character-distribution entropy per document — the gibberish/
    * boilerplate band filter; only integer counts feed the logs. */
  private val qCharEntropy = Q("t8_char_entropy",
    (s, d) => graft.text.TextAnalysis.charEntropy(t(s, d, "documents"),
        "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH ch AS (SELECT doc_id, substr(text, i, 1) AS c
        FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
          FROM documents WHERE text IS NOT NULL AND length(text) > 0)),
      cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2)
      SELECT doc_id, sum(n)::BIGINT AS n_chars_seen,
        count(*)::BIGINT AS n_distinct_chars,
        round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) AS entropy
      FROM cnt GROUP BY 1 ORDER BY doc_id"""))

  /** Greedy sequence packing: docs laid end-to-end per language, each
    * assigned to the fixed-capacity training sequence where it starts
    * (concat-and-chunk packing; one prefix-sum window per bucket). */
  private val qPack = Q("pack1_sequence_packing",
    (s, d) => graft.text.Chunker.packGreedy(t(s, d, "documents"),
        "doc_id", "text", 64, "lang")
      .orderBy("lang", "doc_id"),
    Some("""WITH tok AS (SELECT lang, doc_id,
        len(string_split(lower(trim(text)), ' ')) AS n_tokens
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
      c AS (SELECT lang, doc_id, n_tokens,
        (sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) AS st
        FROM tok)
      SELECT lang, doc_id, n_tokens::BIGINT AS n_tokens,
        (st // 64)::BIGINT AS seq_id, (st % 64)::BIGINT AS seq_offset
      FROM c ORDER BY lang, doc_id"""))

  /** Deterministic balanced sharding: docs dealt round-robin over the
    * (token count desc, id) rank; the per-shard summary is the balance
    * proof (doc counts ±1, token mass within a few %). */
  private val qBalancedShards = Q("shard1_balanced_shards",
    (s, d) => graft.text.Chunker.balancedShards(t(s, d, "documents"),
        "doc_id", "text", nShards = 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        min("n_tokens").as("min_tokens"), max("n_tokens").as("max_tokens"))
      .orderBy("shard"),
    Some("""WITH c AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0
        ELSE len(string_split(trim(text), ' ')) END::INT AS n_tokens
        FROM documents),
      r AS (SELECT doc_id, n_tokens,
          row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rk FROM c)
      SELECT ((rk - 1) % 8)::INT AS shard, count(*)::BIGINT AS n_docs,
        sum(n_tokens)::BIGINT AS total_tokens, min(n_tokens)::INT AS min_tokens,
        max(n_tokens)::INT AS max_tokens
      FROM r GROUP BY 1 ORDER BY 1"""))

  /** Length-bucketed batching: similar-length docs batched together,
    * per-batch padding-waste report (the padded-inference economics). */
  private val qLenBatches = Q("lb1_length_batches",
    (s, d) => graft.text.Chunker.lengthBatches(t(s, d, "documents"),
        "doc_id", "text", 8, 16)
      .orderBy("len_bucket", "batch_id"),
    Some("""WITH tok AS (SELECT doc_id,
        len(string_split(lower(trim(text)), ' ')) AS n
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
      b AS (SELECT doc_id, n, ((n + 15) // 16 * 16)::BIGINT AS len_bucket FROM tok),
      r AS (SELECT *, row_number() OVER
          (PARTITION BY len_bucket ORDER BY doc_id) AS rn FROM b),
      g AS (SELECT len_bucket, ((rn - 1) // 8)::BIGINT AS batch_id,
          count(*)::BIGINT AS n_docs, max(n)::BIGINT AS max_tokens,
          sum(n)::BIGINT AS sum_tokens
        FROM r GROUP BY 1, 2)
      SELECT len_bucket, batch_id, n_docs, max_tokens, sum_tokens,
        round(1.0 - sum_tokens / (n_docs * max_tokens)::DOUBLE, 4) AS waste_frac
      FROM g ORDER BY len_bucket, batch_id"""))

  /** Temperature-flattened (α=0.5) multi-source mixing at half the corpus
    * budget: rare sources upweighted, dominant ones down; integer-sqrt
    * weights keep the keep-fractions engine-exact (see
    * `Sampling.temperatureMix`), the per-row coin is the portable md5
    * device, so the whole learned sampling plan restates as SQL. */
  private val qTempMix = Q("mix1_temperature_mix",
    (s, d) => {
      val docs = t(s, d, "documents")
      val kept = Sampling.temperatureMix(docs, "source", "doc_id", 0.5)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("source")
    },
    Some("""WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      s AS (SELECT sum(floor(sqrt(n))::BIGINT)::BIGINT AS s,
          sum(n)::BIGINT AS tot FROM n),
      f AS (SELECT n.source, n.n,
          least(1.0::DOUBLE, (round(0.5 * s.tot)::BIGINT * floor(sqrt(n.n))::BIGINT)::DOUBLE
            / (s.s * n.n)::DOUBLE) AS f
        FROM n CROSS JOIN s),
      th AS (SELECT source, n, CASE WHEN f >= 1.0 THEN 'g'
          ELSE printf('%04x', least(65535, round(f * 65536)::BIGINT)) END AS th
        FROM f),
      kept AS (SELECT d.source, count(*)::BIGINT AS k
        FROM documents d JOIN th ON d.source = th.source
        WHERE substr(md5(d.doc_id::VARCHAR || ':42'), 1, 4) < th.th
        GROUP BY 1)
      SELECT th.source, th.n::BIGINT AS n_docs,
        coalesce(kept.k, 0)::BIGINT AS n_kept
      FROM th LEFT JOIN kept ON th.source = kept.source
      ORDER BY th.source"""))

  /** PII scrub over documents with synthetic contact strings woven in
    * fixture-side (the corpus itself is PII-free): emails, IPv4s and
    * phone numbers counted and redacted in one scan; both engines compose
    * the identical input, so the scrubbed text is hash-compared. */
  private val qPii = Q("pii1_pii_scan",
    (s, d) => {
      val composed = t(s, d, "documents").select(col("doc_id"), concat_ws(" ",
        col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("contact user"), col("doc_id").cast("string"),
            lit("@example.com"))),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit("from 10.0."), pmod(col("doc_id"), lit(200)).cast("string"),
            lit(".25"))),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("call +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      ).as("text"))
      TextAnalysis.piiScan(composed, "doc_id", "text").orderBy("doc_id")
    },
    Some("""WITH composed AS (SELECT doc_id, concat_ws(' ', text,
        CASE WHEN doc_id % 3 = 0
          THEN concat('contact user', doc_id::VARCHAR, '@example.com') END,
        CASE WHEN doc_id % 5 = 0
          THEN concat('from 10.0.', (doc_id % 200)::VARCHAR, '.25') END,
        CASE WHEN doc_id % 7 = 0
          THEN concat('call +1-555-', lpad((doc_id % 10000)::VARCHAR, 4, '0')) END
        ) AS text FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        len(regexp_extract_all(text,
          '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))::BIGINT AS n_ips,
        len(regexp_extract_all(text,
          '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(?:-[0-9]{4})?'))::BIGINT AS n_phones,
        regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
          '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(?:-[0-9]{4})?', '[PHONE]', 'g')
          AS redacted
      FROM composed ORDER BY doc_id"""))

  /** Winsorized price summary: clamp to the rounded [p05, p95] band, count
    * the clamped tails, and report the winsorized mean through exact
    * 1e-4-unit integer sums (summation-order-proof on both engines). */
  private val qWinsorize = Q("wz1_winsorize",
    (s, d) => {
      val w = Quantiles.winsorize(t(s, d, "lineitem"), "l_extendedprice",
        0.05, 0.95)
      w.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("lo_bound"), 1L)
          .otherwise(0L)).as("n_low"),
        sum(when(col("l_extendedprice") > col("hi_bound"), 1L)
          .otherwise(0L)).as("n_high"),
        min(col("lo_bound")).as("lo_bound"),
        min(col("hi_bound")).as("hi_bound"),
        round(sum(round(col("l_extendedprice_w") * 10000, 0))
          / (lit(10000.0) * count(lit(1))), 4).as("mean_w"))
    },
    Some("""WITH b AS (SELECT
        round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
        round(quantile_cont(l_extendedprice, 0.95), 4) AS hi FROM lineitem)
      SELECT count(*)::BIGINT AS n,
        sum(CASE WHEN l_extendedprice < b.lo THEN 1 ELSE 0 END)::BIGINT AS n_low,
        sum(CASE WHEN l_extendedprice > b.hi THEN 1 ELSE 0 END)::BIGINT AS n_high,
        b.lo AS lo_bound, b.hi AS hi_bound,
        round(sum(round(least(greatest(l_extendedprice, b.lo), b.hi) * 10000))
          / (10000.0 * count(*)), 4) AS mean_w
      FROM lineitem CROSS JOIN b GROUP BY b.lo, b.hi"""))

  /** Bloom-prefiltered incremental dedup: same inputs and oracle as `d7` —
    * the output must be bit-identical to the plain anti-join (no false
    * negatives), while only maybe-dup rows pay the join shuffle. */
  private val qBloomDedup = Q("d9_bloom_incremental",
    (s, d) => {
      val docs = t(s, d, "documents")
      val fp = TextAnalysis.fingerprint(col("text"))
      val history = Sampling.hashSample(docs, "doc_id", "40")
        .select(fp.as("fp")).distinct()
      Dedup.incrementalDedupBloom(docs.withColumn("fp", fp), history, "fp")
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    Some("""WITH hist AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
        FROM documents WHERE substr(md5(doc_id::VARCHAR),1,2) < '40')
      SELECT d.doc_id FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM hist
        WHERE hist.fp = md5(lower(trim(d.text))))
      ORDER BY doc_id"""))

  /** Symmetric int8 embedding quantization with per-vector scale and
    * reconstruction-error report — every code and error hash-compared.
    * Codes are integer-valued by construction, so the registered query
    * projects the array to a comma-joined string of integers (the driver
    * gate sorts rows by all columns and cannot hash raw array cells — the
    * t4b scalar-projection device). */
  private val qInt8 = Q("eq1_int8_quantize",
    (s, d) => Quantize.int8(t(s, d, "embeddings"), "vec_id", "embedding")
      .withColumn("codes",
        concat_ws(",", transform(col("codes"), x => x.cast("long"))))
      .orderBy("vec_id"),
    Some("""WITH q AS (SELECT vec_id,
        list_transform(embedding, x -> x::DOUBLE) AS v,
        list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS s
        FROM embeddings)
      SELECT vec_id, len(v)::BIGINT AS n_dims, round(s, 6) AS scale,
        CASE WHEN s = 0 THEN array_to_string(list_transform(v, x -> 0), ',')
          ELSE array_to_string(list_transform(v,
            x -> round(x / s)::BIGINT), ',') END AS codes,
        CASE WHEN s = 0 THEN 0.0
          ELSE round(list_max(list_transform(v,
            x -> abs(round(x / s) * s - x))), 6) + 0.0 END AS max_abs_err
      FROM q ORDER BY vec_id"""))

  /** Three-mode feature scaling over l_quantity: min-max, z-score from
    * exact integer-moment sums, robust from rounded median/MAD — every
    * scaled row hash-compared. */
  private val qScale = Q("sc1_feature_scaling",
    (s, d) => Features.scaleFeatures(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        "l_quantity")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""WITH s AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx,
        sum(l_quantity) AS s1, sum(l_quantity*l_quantity) AS s2,
        count(l_quantity)::DOUBLE AS n FROM lineitem),
      b AS (SELECT round(quantile_cont(l_quantity, 0.5), 4) AS med FROM lineitem),
      m AS (SELECT round(quantile_cont(abs(l_quantity - b.med), 0.5), 4) AS mad
        FROM lineitem CROSS JOIN b)
      SELECT l_orderkey, l_linenumber, l_quantity,
        round((l_quantity - s.mn) / (s.mx - s.mn), 4) AS l_quantity_minmax,
        round((l_quantity - s.s1/s.n)
          / sqrt((s.s2 - s.s1*s.s1/s.n) / (s.n - 1)), 4) AS l_quantity_zscore,
        round((l_quantity - b.med) / m.mad, 4) AS l_quantity_robust
      FROM lineitem CROSS JOIN s CROSS JOIN b CROSS JOIN m
      ORDER BY l_orderkey, l_linenumber"""))

  /** One-pass observed QA metrics: the expectations ride on an existing
    * count action via Dataset.observe — no second scan; the report is the
    * collected metric map. */
  private val qObserved = Q("dq2_observed_metrics",
    (s, d) => {
      val docs = t(s, d, "documents")
      val checks = Seq[graft.analyze.DataQuality.Check](
        graft.analyze.DataQuality.NotNull("text"),
        graft.analyze.DataQuality.InRange("n_chars", 0, 300),
        graft.analyze.DataQuality.InSet("lang", Seq("en", "de")),
        graft.analyze.DataQuality.Matches("source", "^src1[0-9]$"))
      val (inst, obs) = graft.analyze.DataQuality.observed(docs, checks)
      val nRows = inst.count() // the action the metrics ride on
      val m = obs.get
      import s.implicits._
      checks.map(c => (c.name, m(c.name).asInstanceOf[Long]))
        .toDF("expectation", "violations")
        .withColumn("rows_scanned", lit(nRows))
        .orderBy("expectation")
    },
    Some("""WITH m AS (SELECT count(*)::BIGINT AS n,
        sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS v0,
        sum(CASE WHEN n_chars IS NOT NULL
          AND (n_chars < 0 OR n_chars > 300) THEN 1 ELSE 0 END)::BIGINT AS v1,
        sum(CASE WHEN lang IS NOT NULL
          AND lang NOT IN ('en','de') THEN 1 ELSE 0 END)::BIGINT AS v2,
        sum(CASE WHEN source IS NOT NULL AND NOT regexp_matches(source,
          '^src1[0-9]$') THEN 1 ELSE 0 END)::BIGINT AS v3
        FROM documents)
      SELECT * FROM (
        SELECT 'not_null(text)' AS expectation, v0 AS violations,
          n AS rows_scanned FROM m
        UNION ALL SELECT 'in_range(n_chars,0.0,300.0)', v1, n FROM m
        UNION ALL SELECT 'in_set(lang)', v2, n FROM m
        UNION ALL SELECT 'matches(source)', v3, n FROM m)
      ORDER BY expectation"""))

  /** Fuzzy entity matching: supplier names within edit distance 1 —
    * FastSS deletion-neighborhood blocking + thresholded-levenshtein
    * verify. (Round 10 switched from length banding: supplier names are
    * constant-width, so the length histogram is ONE band and in-band
    * pairs grew quadratically — 17× at the sf1 sweep. FastSS candidates
    * track the true near-pair count; output is bit-identical, oracle
    * unchanged.) */
  private val qFuzzy = Q("fz1_fuzzy_match",
    (s, d) => {
      val sup = t(s, d, "supplier")
      graft.joins.FuzzyJoin.editDistanceJoinFastSS(sup, "s_suppkey", sup,
          "s_suppkey", "s_name", 1)
        .filter(col("id1") < col("id2"))
        .orderBy("id1", "id2")
    },
    Some("""SELECT a.s_suppkey AS id1, b.s_suppkey AS id2,
        levenshtein(a.s_name, b.s_name)::INTEGER AS dist
      FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
      WHERE levenshtein(a.s_name, b.s_name) <= 1
      ORDER BY id1, id2"""))

  /** Consecutive-day activity streaks per user (gaps-and-islands via the
    * rownumber-difference device; one window + one aggregate). */
  private val qStreaks = Q("bs1_activity_streaks",
    (s, d) => graft.analyze.Behavior.streaks(events(s, d), "user_id", "ts")
      .orderBy("user_id", "streak_start"),
    Some("""WITH days AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
      r AS (SELECT user_id, day,
          row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM days)
      SELECT user_id, min(day)::VARCHAR AS streak_start,
        max(day)::VARCHAR AS streak_end, count(*)::BIGINT AS streak_days
      FROM r GROUP BY user_id, day - rn::INTEGER ORDER BY user_id, streak_start"""))

  /** Hourly OHLC bars per user over the event stream — open/close picked
    * by lexicographic struct min/max (one aggregate, no window sort).
    * Oracle windows order by epoch_us(ts): the engine's timestamps are
    * microsecond-floored from the ns parquet values, so the tie-break
    * must compare at the same precision. */
  private val qBars = Q("bar1_hourly_bars",
    (s, d) => graft.analyze.Behavior.ohlcBars(events(s, d), "user_id", "ts",
        "event_id", "value")
      .orderBy("user_id", "bar_start"),
    Some("""WITH e AS (SELECT user_id,
        epoch(date_trunc('hour', ts))::BIGINT AS bar_start,
        epoch_us(ts) AS tus, event_id, value FROM events),
      r AS (SELECT *,
          row_number() OVER (PARTITION BY user_id, bar_start
            ORDER BY tus, event_id) AS ra,
          row_number() OVER (PARTITION BY user_id, bar_start
            ORDER BY tus DESC, event_id DESC) AS rd
        FROM e)
      SELECT user_id, bar_start,
        round(min(CASE WHEN ra = 1 THEN value END), 4) AS open,
        round(max(value), 4) AS high, round(min(value), 4) AS low,
        round(min(CASE WHEN rd = 1 THEN value END), 4) AS close,
        count(*)::BIGINT AS n_events
      FROM r GROUP BY 1, 2 ORDER BY user_id, bar_start"""))

  /** Tokenizer encode: corpus-derived top-50 vocab (frequency-ranked,
    * token tiebreak — the freq1 ranking), documents mapped to token-id
    * sequences with OOV → −1; every id sequence hash-compared as a
    * comma-joined string (the driver gate cannot hash raw array cells —
    * the t4b scalar-projection device). */
  private val qTokEncode = Q("tok1_encode_tokens",
    (s, d) => {
      val docs = t(s, d, "documents")
      val vocab = graft.text.Chunker.topKVocab(docs, "text", 50)
      graft.text.Chunker.encodeTokens(docs, "doc_id", "text", vocab,
          "token", "tid")
        .withColumn("token_ids", concat_ws(",", col("token_ids")))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
      tokc AS (SELECT unnest(ts) AS tk FROM t),
      vocab AS (SELECT tk, tid FROM (
        SELECT tk, (row_number() OVER (ORDER BY count(*) DESC, tk) - 1)::INTEGER AS tid
        FROM tokc GROUP BY tk) WHERE tid < 50),
      pos AS (SELECT doc_id, ts[i] AS tk, i
        FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM t)),
      enc AS (SELECT p.doc_id, p.i, coalesce(v.tid, -1)::INTEGER AS tid
        FROM pos p LEFT JOIN vocab v ON p.tk = v.tk)
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
        string_agg(tid, ',' ORDER BY i) AS token_ids
      FROM enc GROUP BY doc_id ORDER BY doc_id"""))

  /** BPE merge-rule training on the corpus word-frequency table: the
    * merge table is deterministic (integer pair counts, total tiebreak)
    * but the iterate-and-fold loop has no SQL restatement — rows-only,
    * with the classic-corpus closed form pinned in ChunkerSpec. */
  private val qBpeTrain = Q("bpe1_bpe_merges",
    (s, d) => {
      val merges = graft.text.Chunker.trainBpe(t(s, d, "documents"), "text",
        nMerges = 10)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b, c), i) => (i + 1, a, b, c) }
        .toDF("rank", "left", "right", "weight")
        .orderBy("rank")
    },
    None)

  /** BPE apply at corpus scale: segment every document with the learned
    * rules (vocab-sized fold, corpus-sized join-back); subwords projected
    * to a joined string for the gate. */
  private val qBpeSegment = Q("bpe2_bpe_segment",
    (s, d) => {
      val docs = t(s, d, "documents")
      val merges = graft.text.Chunker.trainBpe(docs, "text", nMerges = 10)
      graft.text.Chunker.applyBpe(docs, "doc_id", "text", merges)
        .select(col("doc_id"), size(col("subwords")).as("n_subwords"),
          concat_ws(" ", col("subwords")).as("subwords"))
        .orderBy("doc_id")
    },
    None)

  /** Degenerate-parameter BPE TRAINING anchor: at nMerges=1 the learner is
    * exactly one weighted adjacent-pair count + one (count desc, pair asc)
    * argmax — no iteration, so the whole round restates in SQL. Pins the
    * pair-count definition (char symbols + endword mark, word-frequency
    * weighting) and the tiebreak that makes training deterministic; the
    * 10-merge `bpe1` stays the iterative scale exercise. */
  private val qBpeTrainAnchor = Q("bpe1b_bpe_first_merge",
    (s, d) => {
      val merges = graft.text.Chunker.trainBpe(t(s, d, "documents"), "text",
        nMerges = 1)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b, c), i) => (i + 1, a, b, c) }
        .toDF("rank", "left", "right", "weight")
    },
    Some("""WITH w AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
      wc AS (SELECT w, count(*) AS n FROM w WHERE length(w) > 0 GROUP BY w),
      idx AS (SELECT w, n, unnest(range(1, length(w)+1)) AS i FROM wc),
      p AS (SELECT substr(w, i::INTEGER, 1) AS a,
          CASE WHEN i = length(w) THEN '</w>' ELSE substr(w, (i+1)::INTEGER, 1) END AS b, n
        FROM idx)
      SELECT 1 AS rank, a AS "left", b AS "right", sum(n)::BIGINT AS weight
      FROM p GROUP BY a, b ORDER BY weight DESC, a, b LIMIT 1"""))

  /** Fixed-rule BPE APPLY anchor: segment the corpus with a LITERAL 3-rule
    * merge table (the corpus's true first three merges, learned once and
    * pinned) so the apply-time fold has a closed form the oracle restates —
    * each merge over space-joined symbols is one boundary-anchored
    * string replace, applied in rule order; `mergePair`'s left-to-right
    * non-overlapping greed is exactly replace()'s scan (DedupSpec-style
    * cross-check in ChunkerSpec). Pins the fold + join-back + in-order
    * reassembly that `bpe2` exercises with learned rules. */
  private val qBpeSegmentAnchor = Q("bpe2b_bpe_apply_fixed",
    (s, d) => graft.text.Chunker.applyBpe(t(s, d, "documents"), "doc_id", "text",
        Seq(("e", "r", 4568L), ("e", "</w>", 4473L), ("n", "</w>", 2834L)))
      .select(col("doc_id"), size(col("subwords")).cast("bigint").as("n_subwords"),
        concat_ws(" ", col("subwords")).as("subwords"))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
      seg AS (SELECT doc_id, flatten(list_transform(ws, w ->
          string_split(trim(
            replace(replace(replace(
              ' ' || array_to_string(list_transform(range(1, length(w)+1),
                       i -> substr(w, i::INTEGER, 1)), ' ') || ' </w> ',
              ' e r ', ' er '),
              ' e </w> ', ' e</w> '),
              ' n </w> ', ' n</w> ')
          ), ' '))) AS subs FROM t)
      SELECT doc_id, len(subs)::BIGINT AS n_subwords,
        array_to_string(subs, ' ') AS subwords
      FROM seg ORDER BY doc_id"""))

  /** qc1's pinned "trained model": 64 small integer weights (quantized
    * logit points per hash bucket). Declared before [[qHashedScore]] —
    * object vals initialize in declaration order. */
  private val Qc1Weights: Seq[Int] = Seq(
    0, -3, 1, 5, -5, -4, 3, -4, 0, 4, -5, 3, -2, -5, -4, 1,
    1, -4, -2, -4, 3, 1, -5, 4, -4, -2, 5, 5, 4, -5, 4, 4,
    1, -5, -2, -5, 3, -3, -1, 1, -3, 3, -4, 4, -1, 3, 5, -3,
    -4, 4, 4, 5, -2, 0, -4, 3, -4, 4, -5, 4, -2, 2, 5, 3)

  /** fastText-style hashed linear quality filter, oracle-checked end to
    * end: the 64 integer weights are a pinned literal (stand-in for a
    * trained model's quantized weights), the md5 bucket hash is portable,
    * and integer scores make the sum order-independent — DuckDB recomputes
    * every bucket and score exactly. */
  private val qHashedScore = Q("qc1_hashed_linear_score",
    (s, d) => TextAnalysis.hashedLinearScore(t(s, d, "documents"), "doc_id", "text",
        Qc1Weights.map(_.toLong))
      .orderBy("doc_id"),
    Some(s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents WHERE text IS NOT NULL),
      b AS (SELECT doc_id,
          (list_sum(list_transform(range(1, 8), j ->
            ((strpos('0123456789abcdef', substr(md5(tok), j::INTEGER, 1)) - 1)::BIGINT
              << ((4 * (7 - j))::INTEGER)))) % 64)::INTEGER AS bucket
        FROM toks),
      s AS (SELECT doc_id, sum(list_extract(${Qc1Weights.mkString("[", ", ", "]")}, bucket + 1))::BIGINT AS score,
          count(*)::BIGINT AS n_tokens
        FROM b GROUP BY doc_id)
      SELECT doc_id, score, n_tokens, (score >= 0) AS keep FROM s ORDER BY doc_id"""))

  /** PSI drift between all lineitems (reference) and the discounted
    * subpopulation (current) over price deciles — every bin term a ratio
    * of exact integer counts. */
  private val qPsi = Q("dr1_psi_drift", { (s, d) =>
      val li = t(s, d, "lineitem")
      Quantiles.psiDrift(li, li.filter(col("l_discount") > 0.05),
          "l_extendedprice", 10)
        .orderBy("bin")
    }, {
      val qs = (1 until 10)
        .map(p => s"round(quantile_cont(l_extendedprice, 0.$p), 4)")
        .mkString("[", ", ", "]")
      Some(s"""WITH q AS (SELECT $qs AS bs FROM lineitem),
        rc AS (SELECT len(list_filter(q.bs, x -> l.l_extendedprice > x)) + 1 AS bin,
            count(*) AS n_ref FROM lineitem l CROSS JOIN q GROUP BY 1),
        cc AS (SELECT len(list_filter(q.bs, x -> l.l_extendedprice > x)) + 1 AS bin,
            count(*) AS n_cur FROM lineitem l CROSS JOIN q
          WHERE l.l_discount > 0.05 GROUP BY 1),
        sp AS (SELECT unnest(generate_series(1, 10)) AS bin),
        j AS (SELECT sp.bin, coalesce(rc.n_ref, 0) AS n_ref,
            coalesce(cc.n_cur, 0) AS n_cur
          FROM sp LEFT JOIN rc ON sp.bin = rc.bin LEFT JOIN cc ON sp.bin = cc.bin),
        t AS (SELECT sum(n_ref + 1)::BIGINT AS tr, sum(n_cur + 1)::BIGINT AS tc FROM j)
        SELECT j.bin::INTEGER AS bin, j.n_ref::BIGINT AS n_ref,
          j.n_cur::BIGINT AS n_cur,
          round((((j.n_ref + 1) / t.tr::DOUBLE) - ((j.n_cur + 1) / t.tc::DOUBLE))
            * ln(((j.n_ref + 1) / t.tr::DOUBLE) / ((j.n_cur + 1) / t.tc::DOUBLE)), 6)
            AS psi_term
        FROM j CROSS JOIN t ORDER BY bin""")
    })

  /** Rolling 7-day active users over the event stream (explode-to-window
    * instead of a per-day self-join). */
  private val qWau = Q("wau1_rolling_actives",
    (s, d) => graft.analyze.Behavior.rollingActives(events(s, d), "user_id", "ts")
      .orderBy("report_day"),
    Some("""WITH days AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM days),
      x AS (SELECT d.user_id, d.day + t.i::INTEGER AS rd
        FROM days d, range(0, 7) t(i))
      SELECT rd::VARCHAR AS report_day,
        count(DISTINCT user_id)::BIGINT AS active_users
      FROM x, b WHERE rd >= b.lo AND rd <= b.hi
      GROUP BY rd ORDER BY report_day"""))

  /** Int8-quantized ANN anchored exact: with the shortlist covering the
    * whole corpus the code-space scan degrades to brute force and the
    * exact re-rank makes the output identical to `sim1`'s contract —
    * the quantization path's correctness gate (recall at bounded
    * shortlists is QuantizeSpec's job). */
  private val qInt8TopK = Q("sim7_int8_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      Quantize.int8TopK(emb.filter(col("vec_id") < 5), emb, "vec_id",
          "embedding", k = 3, shortlist = 1 << 20, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
        round(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]), 6) AS cos
        FROM q CROSS JOIN c WHERE query_id != neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
      SELECT query_id, neighbor_id, cos FROM ranked WHERE rn <= 3
      ORDER BY query_id, neighbor_id"""))

  /** Global clustering coefficient of the part co-purchase graph —
    * 3·triangles/wedges from the tc1 edge list plus one degree pass. */
  private val qClustCoeff = Q("tc2_clustering_coeff",
    (s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      graft.graph.Triangles.globalClusteringCoefficient(e, "u", "v")
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      t AS (SELECT count(*)::BIGINT AS triangles FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      d AS (SELECT x, count(*) AS d FROM
        (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      w AS (SELECT (sum(d * (d - 1)) / 2)::BIGINT AS wedges FROM d)
      SELECT t.triangles, w.wedges,
        round(3.0 * t.triangles / w.wedges, 6) AS global_coeff
      FROM t CROSS JOIN w"""))

  /** Smoothed target encoding of return flag against quantity (m=10) —
    * the encoder table itself, every sum an exact integer. */
  private val qTargetEnc = Q("fe2_target_encoding",
    (s, d) => Features.targetEncode(t(s, d, "lineitem"), "l_returnflag",
        "l_quantity", m = 10.0)
      .orderBy("category"),
    Some("""WITH t AS (SELECT sum(l_quantity) AS s, count(l_quantity) AS n
        FROM lineitem),
      g AS (SELECT l_returnflag AS category, sum(l_quantity) AS sy,
          count(l_quantity) AS n FROM lineitem GROUP BY 1)
      SELECT g.category, g.n::BIGINT AS n,
        round((g.sy + 10.0 * (t.s / t.n)) / (g.n + 10.0), 6) AS encoded
      FROM g CROSS JOIN t ORDER BY g.category"""))

  /** Intra-corpus boilerplate fraction per document (3-gram shingles
    * shared with at least one other doc). */
  private val qBoilerplate = Q("t9_boilerplate",
    (s, d) => TextAnalysis.boilerplate(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS toks FROM t),
      ds AS (SELECT doc_id, unnest(toks) AS sh FROM s),
      f AS (SELECT sh, count(*) AS df FROM ds GROUP BY 1),
      pd AS (SELECT d.doc_id, count(*) AS n_shingles,
          sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared
        FROM ds d JOIN f ON d.sh = f.sh GROUP BY 1)
      SELECT doc.doc_id, pd.n_shingles, pd.n_shared,
        round(pd.n_shared / pd.n_shingles::DOUBLE, 4) AS boilerplate_frac
      FROM documents doc LEFT JOIN pd ON doc.doc_id = pd.doc_id
      ORDER BY doc.doc_id"""))

  /** Grouped mode (non-NULL, ties to smallest value): quantity mode per
    * return flag — the grouped form of the a11 imputation statistic. */
  private val qGroupedMode = Q("a19_grouped_mode",
    (s, d) => graft.analyze.Olap.modePerGroup(t(s, d, "lineitem"),
        "l_returnflag", "l_quantity")
      .orderBy("l_returnflag"),
    Some("""WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
        FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
          ORDER BY n DESC, l_quantity) AS rn FROM c)
      SELECT l_returnflag, l_quantity AS mode, n::BIGINT AS n
      FROM r WHERE rn = 1 ORDER BY l_returnflag"""))

  /** Row-level quarantine: orders violating any row-local expectation,
    * annotated with the name-sorted reason list — every routed row and
    * its evidence hash-compared. */
  private val qQuarantine = Q("dq3_quarantine_rows",
    (s, d) => {
      import graft.analyze.DataQuality._
      val (_, bad) = quarantine(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_orderpriority")),
        Seq(InRange("o_totalprice", 1000, 300000),
          InSet("o_orderstatus", Seq("O", "F")),
          Matches("o_orderpriority", "^[1-3]-")))
      bad.orderBy("o_orderkey")
    },
    Some("""WITH f AS (SELECT o_orderkey, o_totalprice, o_orderstatus,
        o_orderpriority,
        concat_ws(';',
          CASE WHEN o_totalprice IS NOT NULL
            AND (o_totalprice < 1000 OR o_totalprice > 300000)
            THEN 'in_range(o_totalprice,1000.0,300000.0)' END,
          CASE WHEN o_orderstatus IS NOT NULL
            AND o_orderstatus NOT IN ('O','F') THEN 'in_set(o_orderstatus)' END,
          CASE WHEN o_orderpriority IS NOT NULL
            AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
            THEN 'matches(o_orderpriority)' END) AS violated
        FROM orders)
      SELECT * FROM f WHERE violated <> '' ORDER BY o_orderkey"""))

  /** Gap sessions through Spark's native session_window (the declarative
    * twin of st3's stateful sessionize); epoch-µs bounds so the half-open
    * merge semantics compare exactly against the SQL islands form. */
  private val qSessionWindow = Q("st5_session_window",
    (s, d) => EventStream.sessionWindows(events(s, d), "user_id", "ts",
        "10 minutes")
      .orderBy("user_id", "session_start_us"),
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      l AS (SELECT user_id, t,
          lag(t) OVER (PARTITION BY user_id ORDER BY t) AS p FROM e),
      m AS (SELECT user_id, t, CASE WHEN p IS NULL
          OR t - p > 600000000 THEN 1 ELSE 0 END AS brk FROM l),
      g AS (SELECT user_id, t, sum(brk) OVER (PARTITION BY user_id
          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m)
      SELECT user_id, min(t) AS session_start_us,
        max(t) + 600000000 AS session_end_us, count(*)::BIGINT AS n_events
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, session_start_us"""))

  /** Higher-moment profile of quantity: skewness/kurtosis from exact
    * integer power sums (builtin skewness/kurtosis are merge-order-
    * dependent — deliberately avoided). */
  private val qMoments = Q("a20_moments",
    (s, d) => graft.analyze.Moments.profile(t(s, d, "lineitem"), "l_quantity"),
    Some("""WITH s AS (SELECT count(l_quantity)::DOUBLE AS n,
        sum(l_quantity) AS s1, sum(l_quantity*l_quantity) AS s2,
        sum(l_quantity*l_quantity*l_quantity) AS s3,
        sum(l_quantity*l_quantity*l_quantity*l_quantity) AS s4 FROM lineitem),
      m AS (SELECT n, s1/n AS m1, s2/n - (s1/n)*(s1/n) AS mp2,
        s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS mp3,
        s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
          - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS mp4 FROM s)
      SELECT n::BIGINT AS n, round(m1, 6) AS mean, round(mp2, 6) AS var_pop,
        round(mp3 / pow(mp2, 1.5), 6) AS skewness,
        round(mp4 / (mp2*mp2) - 3, 6) AS kurtosis_excess FROM m"""))

  /** Referentially-consistent pseudonymization: customer keys and the
    * orders FK hash identically, so the join still works across the
    * de-identified tables — per-pseudonym order counts hash-compared. */
  private val qPseudonymize = Q("ps1_pseudonymize",
    (s, d) => {
      val cust = TextAnalysis.pseudonymize(
        t(s, d, "customer").select(col("c_custkey")), Seq("c_custkey"), "42")
      val ords = TextAnalysis.pseudonymize(
        t(s, d, "orders").select(col("o_custkey")), Seq("o_custkey"), "42")
      cust.join(ords, cust("c_custkey") === ords("o_custkey"), "left")
        .groupBy(col("c_custkey").as("pseudonym"))
        .agg(count(col("o_custkey")).as("n_orders"))
        .orderBy("pseudonym")
    },
    Some("""WITH c AS (SELECT sha256('42:' || c_custkey::VARCHAR) AS pseudonym,
        c_custkey FROM customer),
      o AS (SELECT sha256('42:' || o_custkey::VARCHAR) AS p2 FROM orders)
      SELECT c.pseudonym, count(o.p2)::BIGINT AS n_orders
      FROM c LEFT JOIN o ON c.pseudonym = o.p2
      GROUP BY 1 ORDER BY pseudonym"""))

  /** k-core of the part co-purchase graph — iterative peel to the unique
    * fixpoint (rows-only: no SQL restatement exists for an
    * iterate-to-fixpoint; determinism is pinned by KCoreSpec instead).
    * k=70 sits just below this uniform graph's sharp degeneracy
    * transition at sf0.01 (degrees 42-206, median 115; k=70 peels 29
    * vertices, k=90 cascades to empty) so the query exercises a real
    * multi-round peel. */
  private val qKCore = Q("kc1_kcore",
    (s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      graft.graph.KCore.vertices(e, "u", "v", k = 70)
        .orderBy("id")
    },
    None)

  // ====================================================================
  // Registry
  // ====================================================================

  private val all: Seq[Q] = Seq(
    qScan, qCounts, qCopy, qAgg1, qQ5,
    qProject, qNotNull, qInList, qOffset,
    qRowId, qFkEdges, qSelfLoops, qTsClamp, qPruneEmpty, qBatchHeuristic,
    qSchemaCache, qSemi, qGraphStats,
    qAnalyze,
    qDistinctNullInc, qDistinctNorm, qCatStats, qNumStats,
    qPropSum, qPropMean, qPropMax, qAttn, qVecAttn, qImpute, qSalted,
    qFactorize, qEncode, qTopK, qSplit,
    qUnionDistinct,
    qNormalizers, qDateFns, qMultiLabel, qTableConvert, qSoftmax, qMetrics,
    qLegacyDates, qBlueprint, qFitDecoder, qFitClassifier, qFitGd, qFitMlp, qFitGnn, qFitHeteroGnn, qFitAttnGnn, qEmbedStub, qEmbedTable, qDuration,
    qBfs, qBfsTarget,
    qExactDedup, qNgramJaccard, qDupClusters, qMinhash, qMinhashAnchor,
    qSimhash, qSimhash128, qMinhashPortable, qSimhashPortable, qSimhashPortablePairs,
    qEmbDedup, qEmbDedupAnchor, qEmbDedupScaled, qSemDedup, qSemDedupAnchor,
    qBruteTopK, qLshTopK, qLshAnchor, qIvfTopK, qRangeSearch,
    qTextQuality, qLangId, qFingerprint,
    qMedia, qDecode, qImageDecode, qHourly, qRunningTotals, qSessions,
    qAsof, qRangeJoin, qRolling, qRepetition, qTfidf, qGroupSplit, qQuantiles,
    qIntervalJoin, qBm25, qHashSample, qPqTopK, qIvfPqTopK,
    qRollup, qCube, qPivot, qHistogram, qIncrementalDedup, qQ3, qQ6, qQ10, qPageRank,
    qPageRankAnchor, qKCoreAnchor, qWeightedPr,
    qFunnel, qCohort, qScd2, qKeyProfile, qStratified, qContamination, qZOrder,
    qTriangles, qUpsert, qDataQuality, qCorrelation, qEqualFreqBins,
    qHeavyHitters, qGroupedQuantiles, qMmr, qMmrAnchor,
    qChunks, qRedact, qSurprisal, qCanonical, qCharEntropy,
    qPack, qLenBatches, qTempMix, qPii, qWinsorize, qBloomDedup, qInt8,
    qScale, qObserved, qFuzzy, qStreaks, qBars, qTokEncode, qPsi, qWau, qHashedScore,
    qInt8TopK, qClustCoeff, qTargetEnc, qBoilerplate, qGroupedMode,
    qQuarantine, qSessionWindow, qMoments, qPseudonymize, qKCore,
    qEwma, qKAnonymity, qOrcRoundTrip, qLDiversity, qGroupSample, qBudgetSample, qZipf,
    qLabelProp, qBpeTrain, qBpeSegment, qBpeTrainAnchor, qBpeSegmentAnchor,
    qGapFill, qUnpivot, qKFold,
    qSentences, qMadOutliers, qCmsCounts, qUpsample, qSnapshotDiff,
    qRankFeatures, qGroupScaling, qPropositionalize, qPropositionalizeDeep,
    qFkAudit, qSourceOverlap, qSentenceDedup,
    qContainment, qRepeatedSpans, qTopRepeatedSpans, qBalancedShards,
    qAhashNearDups, qRemoveSpans, qWavDecode, qImageDupClusters,
    qJsonlRoundTrip, qJdbcRoundTrip, qCsvRoundTrip)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full build slice — catalog → row ids → FK edge joins → reverse
    * edges → graph statistics. */
  def entry(spark: SparkSession): DataFrame =
    graphStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded-random and hash-function-defined pipelines). */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
