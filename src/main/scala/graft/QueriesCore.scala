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


/** Registry domain: scans/sources, projections, joins/graph construction, schema autodetection, aggregations (SURVEY 2.1-2.4). See [[SparkEntry]] for the contract. */
private[graft] object QueriesCore {
  import QBase._

  // ====================================================================
  // §2.1 scans / sources  +  §2.4 counting aggregates
  // ====================================================================

  private[graft] val allTables = Seq("customer", "documents", "embeddings", "events",
    "lineitem", "nation", "orders", "part", "region", "supplier")

  private[graft] val qScan = Q("s5_scan_region",
    (s, d) => t(s, d, "region").orderBy("r_regionkey"),
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  private[graft] val qCounts = Q("s9_table_counts",
    (s, d) => allTables.map { n =>
      t(s, d, n).agg(count(lit(1)).as("n")).select(lit(n).as("table_name"), col("n"))
    }.reduce(_.unionAll(_)).orderBy("table_name"),
    Some(allTables.map(n => s"SELECT '$n' AS table_name, count(*) AS n FROM $n")
      .mkString("", " UNION ALL ", " ORDER BY table_name")))

  /** S6 database copy under the driver gate: copy the whole catalog to a
    * fresh parquet directory, then read counts and schema widths FROM THE
    * COPY — the oracle computes them from the originals, so equality
    * proves the distributed rewrite lost no rows and no columns. */
  private[graft] val qCopy = Q("s6_copy_roundtrip",
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

  /** Hive-partitioned write + PRUNED read: orders land partitioned by
    * order year, the read filters one year, and the aggregate is
    * hash-compared against the unpartitioned truth. The filter prunes
    * directories at planning time (`PartitionFilters` on the scan,
    * asserted in PartitionedSpec) — at 100 TB this skips the bytes
    * entirely, where P5/q6's footer-level pushdown still lists and opens
    * every file. Exact integer cents keep the sum drift-free. */
  private[graft] val qPartitionPrune = Q("pp1_partition_prune",
    (s, d) => {
      val out = scratchDir("graft_part")
      graft.sources.Partitioned.write(
        t(s, d, "orders").withColumn("yr", year(col("o_orderdate"))),
        out, Seq("yr"))
      graft.sources.Partitioned.read(nanosOk(s), out)
        .filter(col("yr") === 1995)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
        sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT AS cents
      FROM orders WHERE year(o_orderdate) = 1995
      GROUP BY 1 ORDER BY 1"""))

  /** Full TPC-H Q1 shape: the classic pricing-summary aggregate battery —
    * one scan, map-side partial aggregation, 3-column read schema. */
  private[graft] val qAgg1 = Q("q1_agg",
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
  private[graft] val qQ5 = Q("q5_local_supplier_revenue",
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

  private[graft] val qProject = Q("p1_project_fk",
    (s, d) => t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey"),
    Some("""SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
      ORDER BY l_orderkey, l_partkey, l_suppkey"""))

  private[graft] val qNotNull = Q("p4_notnull_count",
    (s, d) => t(s, d, "orders").agg(count(col("o_custkey")).as("n_nonnull")),
    Some("SELECT count(o_custkey) AS n_nonnull FROM orders"))

  private[graft] val qInList = Q("p5_in_filter",
    (s, d) => t(s, d, "nation").filter(col("n_regionkey").isin(0, 2))
      .orderBy("n_nationkey"),
    Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
      WHERE n_regionkey IN (0, 2) ORDER BY n_nationkey"""))

  private[graft] val qOffset = Q("p6_offset_row",
    (s, d) => t(s, d, "orders").orderBy("o_orderkey").offset(41).limit(1),
    Some("SELECT * FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 41"))

  // ====================================================================
  // §2.3 joins / graph construction
  // ====================================================================

  private[graft] val qRowId = Q("w1_row_id",
    (s, d) => RelGraph.withRowId(t(s, d, "nation"), Seq("n_nationkey"))
      .select(col("n_nationkey"), col("n_name"), col(RelGraph.RowId).as("row_id"))
      .orderBy("row_id"),
    Some("""SELECT n_nationkey, n_name,
      row_number() OVER (ORDER BY n_nationkey) - 1 AS row_id
      FROM nation ORDER BY row_id"""))

  private[graft] val qFkEdges = Q("j1_fk_edges",
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
  private[graft] val qSelfLoops = Q("j6_self_loops",
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
  private[graft] val qTsClamp = Q("f14_ts_clamp",
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
  private[graft] val qPruneEmpty = Q("p7_prune_empty",
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
  private[graft] val qSchemaCache = Q("s7_schema_cache",
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
  private[graft] val qBatchHeuristic = Q("w7_batch_heuristic",
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

  private[graft] val qSemi = Q("j3_semi_frontier",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").orderBy("c_custkey")
    },
    Some("""SELECT * FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
      ORDER BY c_custkey"""))

  /** Full graph build (W1+J1+J5+A12): node row counts + edge counts per FK
    * edge type, forward and reversed. */
  private[graft] def graphStats(s: SparkSession, d: String): DataFrame = {
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
    try graft.util.Checkpoints.eager(g.stats(s, includeReverse = true))
      .orderBy("entity", "kind")
    finally { g.unpersistNodes(); () }
  }

  private[graft] val graphEdgeJoins = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"))

  private[graft] val qGraphStats = Q("a12_graph_stats",
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

  private[graft] def analyzerOracleSql: String = {
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

  private[graft] val qAnalyze = Q("a5_schema_analyze",
    (s, d) => new graft.analyze.SchemaAnalyzer(catalog(s, d)).guessSchemaDF()
      .orderBy("table_name", "column_name"),
    Some(analyzerOracleSql))

  // ====================================================================
  // §2.4 aggregations
  // ====================================================================

  private[graft] val qDistinctNullInc = Q("a2_distinct_nullinc",
    (s, d) => t(s, d, "customer").agg(
      DistinctCounter.DbDistinct.expr(col("c_mktsegment"), null).as("dc_mktsegment"),
      DistinctCounter.DbDistinct.expr(col("c_nationkey"), null).as("dc_nationkey")),
    Some("""SELECT
      (SELECT count(*) FROM (SELECT DISTINCT c_mktsegment FROM customer)) AS dc_mktsegment,
      (SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer)) AS dc_nationkey"""))

  private[graft] val qDistinctNorm = Q("a3_distinct_normalized",
    (s, d) => t(s, d, "part").agg(
      count_distinct(Normalizers("strip_ci")(col("p_type"))).as("dc_type_strip_ci"),
      count_distinct(Normalizers("noop")(col("p_type"))).as("dc_type_noop"),
      // F5: collation-forced distinct (no value rewriting)
      count_distinct(Normalizers.collated(col("p_type"), "UTF8_LCASE")).as("dc_type_lcase")),
    Some("""SELECT count(DISTINCT lower(trim(p_type))) AS dc_type_strip_ci,
      count(DISTINCT p_type) AS dc_type_noop,
      count(DISTINCT lower(p_type)) AS dc_type_lcase FROM part"""))

  private[graft] val qCatStats = Q("a6_stats_categorical",
    (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private[graft] val qNumStats = Q("a6_stats_numeric",
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
  private[graft] def propagateQuery(aggr: String, intFeatures: Boolean)(
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

  private[graft] def propagateOracle(f: String, intFeatures: Boolean): String = {
    val (c0, c1, c2) =
      if (intFeatures) ("l_quantity", "l_linenumber", "l_quantity + l_linenumber")
      else ("l_quantity", "l_extendedprice", "l_discount")
    s"""WITH ord AS (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey)-1 AS dst_id FROM orders)
      SELECT dst_id, round($f($c0),4) AS f0, round($f($c1::DOUBLE),4) AS f1,
      round($f($c2),4) AS f2 FROM lineitem JOIN ord ON l_orderkey = o_orderkey
      GROUP BY dst_id ORDER BY dst_id"""
  }

  private[graft] val qPropSum = Q("a7_propagate_sum",
    propagateQuery("sum", intFeatures = false), Some(propagateOracle("sum", false)))
  private[graft] val qPropMean = Q("a8_scatter_mean",
    propagateQuery("mean", intFeatures = true), Some(propagateOracle("avg", true)))
  private[graft] val qPropMax = Q("a7_propagate_max",
    propagateQuery("max", intFeatures = false), Some(propagateOracle("max", false)))

  private[graft] val qAttn = Q("a9_softmax_attention",
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
  private[graft] val qVecAttn = Q("a9b_vector_attention",
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
  private[graft] val qSalted = Q("sk1_salted_aggregate",
    (s, d) => graft.agg.Skew.saltedSumCount(t(s, d, "lineitem"),
        Seq("l_returnflag"), "l_quantity", buckets = 32)
      .select(col("l_returnflag"), round(col("sum_l_quantity"), 4).as("sum_q"), col("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, round(sum(l_quantity),4) AS sum_q, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private[graft] val qImpute = Q("a11_impute_stats",
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

  private[graft] val all: Seq[Q] = Seq(
    qScan,
    qCounts,
    qCopy,
    qPartitionPrune,
    qAgg1,
    qQ5,
    qProject,
    qNotNull,
    qInList,
    qOffset,
    qRowId,
    qFkEdges,
    qSelfLoops,
    qTsClamp,
    qPruneEmpty,
    qSchemaCache,
    qBatchHeuristic,
    qSemi,
    qGraphStats,
    qAnalyze,
    qDistinctNullInc,
    qDistinctNorm,
    qCatStats,
    qNumStats,
    qPropSum,
    qPropMean,
    qPropMax,
    qAttn,
    qVecAttn,
    qSalted,
    qImpute)
}
