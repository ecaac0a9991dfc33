package graft.graph

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.schema.{ForeignKeyDef, Schema}

/** A typed edge set: rows of `src` table point at rows of `dst` table via
  * the FK named `rel` — PyG HeteroData's `(src, rel, dst)` edge-type key
  * (reference: db_transformer/data/dataset.py:260-366). */
final case class EdgeType(src: String, rel: String, dst: String) {
  override def toString = s"$src->$rel->$dst"
}

/** Multi-relational heterogeneous graph: one node DataFrame per table
  * (carrying a contiguous 0-based `__row_id`), one `(src_id, dst_id)` edge
  * DataFrame per FK edge type. The whole graph is a pair of lazy Catalyst
  * plans — nothing materializes until an action.
  * (reference builds PyG HeteroData, heterodata_builder.py:240-302) */
final case class RelGraph(
    nodes: ListMap[String, DataFrame],
    edges: ListMap[EdgeType, DataFrame]) {

  /** J5: add the transposed edge type per existing type — `T.ToUndirected()`
    * (data/dataset.py:364; heterodata_builder.py:295-297). */
  def withReverseEdges: RelGraph = {
    val rev = edges.map { case (et, df) =>
      EdgeType(et.dst, s"rev_${et.rel}", et.src) ->
        df.select(col("dst_id").as("src_id"), col("src_id").as("dst_id"))
    }
    copy(edges = edges ++ rev)
  }

  /** J6: add self-loop edge type per node type — `T.AddSelfLoops()`
    * (data/dataset.py:365). */
  def withSelfLoops: RelGraph = {
    val loops = nodes.map { case (t, df) =>
      EdgeType(t, "self", t) ->
        df.select(col(RelGraph.RowId).as("src_id"), col(RelGraph.RowId).as("dst_id"))
    }
    copy(edges = edges ++ loops)
  }

  /** P7: drop empty node types and their incident edge types
    * (nn/models/blueprint.py:198-214; ctu_dataset.py:130-131). `isEmpty` is
    * a LIMIT-1 scan, not a count. */
  def pruneEmpty: RelGraph = {
    val keep = nodes.filter { case (_, df) => !df.isEmpty }.keySet
    RelGraph(
      nodes.filter { case (t, _) => keep(t) },
      edges.filter { case (et, _) => keep(et.src) && keep(et.dst) })
  }

  /** Persist every node DataFrame so multi-action consumers (stats,
    * multi-edge joins, propagation rounds) pay each table's row-id
    * sort+zipWithIndex lineage ONCE. Spark's cache substitution is
    * plan-based, so edge plans built from these nodes pick up the cached
    * relation too. Callers own the lifecycle (`unpersistNodes` / session
    * `clearCache`). */
  def withCachedNodes: RelGraph = {
    nodes.values.foreach(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    this
  }

  def unpersistNodes(): RelGraph = {
    nodes.values.foreach(_.unpersist())
    this
  }

  /** A12: dataset statistics (scripts/dataset_info.py:18-66) as one
    * DataFrame `(entity, kind, n)`.
    *
    * Scale design: all edge counts come from ONE union+groupBy job over
    * entity-tagged edges (each edge join executes exactly once, map-side
    * partial counts shuffle only (entity, n)); with `includeReverse`,
    * reverse-edge rows are DERIVED from the forward counts (a transpose
    * preserves cardinality) instead of re-executing transposed joins. The
    * tiny per-edge-type count result is eagerly localCheckpoint-ed —
    * |edge types| rows shared by the forward/reverse branches, no cache
    * entry left behind. Reverse names come from the EdgeType FIELDS (built
    * driver-side), not from re-parsing the concatenated string, so table or
    * FK names containing "->" cannot mis-split. */
  def stats(spark: SparkSession, includeReverse: Boolean = false): DataFrame = {
    val n = nodes.map { case (t, df) =>
      df.agg(count(lit(1)).as("n")).select(lit(t).as("entity"), lit("node_rows").as("kind"), col("n"))
    }
    val tagged = edges.map { case (et, df) => df.select(lit(et.toString).as("__et")) }
    val e: Seq[DataFrame] = tagged.reduceOption(_.unionAll(_)) match {
      case None => Seq.empty
      case Some(all) =>
        import spark.implicits._
        // left-join against the literal edge-type list so empty edge types
        // still report n=0 (a bare groupBy would drop them); the reverse
        // name rides along as a second literal column
        val names = edges.keys.toSeq.map(et =>
          (et.toString, EdgeType(et.dst, s"rev_${et.rel}", et.src).toString))
          .toDF("__et", "__rev")
        val ec = graft.util.Checkpoints.eager(names
          .join(all.groupBy(col("__et")).agg(count(lit(1)).as("__n")), Seq("__et"), "left")
          .select(col("__et"), col("__rev"), coalesce(col("__n"), lit(0L)).as("n")))
        val fwd = ec.select(col("__et").as("entity"), lit("edges").as("kind"), col("n"))
        if (!includeReverse) Seq(fwd)
        else Seq(fwd,
          ec.select(col("__rev").as("entity"), lit("edges").as("kind"), col("n")))
    }
    (n ++ e).reduceOption(_.unionAll(_)).getOrElse(spark.emptyDataFrame)
  }
}

object RelGraph {
  val RowId = "__row_id"

  /** W1: contiguous 0-based row ids in a documented total order (the engine
    * contract: primary key, else all columns). The reference gets these for
    * free from pandas' RangeIndex (heterodata_builder.py:133-134).
    *
    * Scale design: `orderBy` gives a range-partitioned total order, then
    * `zipWithIndex` assigns contiguous ids fully distributed (one extra
    * count job for partition offsets). This is what
    * `row_number() OVER (ORDER BY …)` computes, WITHOUT collapsing to a
    * single partition the way a global window would — the oracle-parity
    * semantics at cluster scale. `monotonically_increasing_id` is unusable
    * here: not contiguous.
    *
    * r15 NEGATIVE RESULT, measured and reverted (OPTIMIZATION_r15.md §
    * withRowId): two all-codegen replacements for the zipWithIndex round
    * trip — (a) sort → mid-stamp → localCheckpoint → offsets collect →
    * broadcast-join, (b) the same over a MEMORY_AND_DISK persist — were
    * built, verified id-identical (RelGraphSpec), and benched SLOWER on
    * every consumer (w1 0.4→0.8 s, d11 1.8→3.0, a12 5.6→9.1 warm,
    * cal-matched windows) despite cutting a12's shuffle bytes 21→13 MB.
    * Where the time went: the zipWithIndex result enters downstream
    * plans as an OPAQUE LogicalRDD leaf — trivial to plan, no AQE
    * stages, no broadcast build — while the replacement frames carry a
    * real plan tree (cache + broadcast-join) that every consumer
    * re-plans and AQE re-stages; per-job profiling showed a12 spending
    * ~6 of 10 s OFF-job in exactly that driver work across ~116 jobs.
    * The per-row Row-conversion cost the rewrite removes is real but is
    * dwarfed at bench SFs by the per-query planning cost it adds; the
    * conversion is linear, executor-side and embarrassingly parallel,
    * so it also does not threaten the 100 TB regime the way a driver-
    * side planning multiplier would. */
  def withRowId(df: DataFrame, orderCols: Seq[String], idCol: String = RowId): DataFrame = {
    require(orderCols.nonEmpty, "withRowId needs a total order (PK or all columns)")
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*)
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(withId, sorted.schema.add(idCol, LongType, nullable = false))
  }

  /** J1: FK equi-join → edge list. Projects only the key columns before the
    * join (the reference does the same, heterodata_builder.py:136-138 — for
    * us Catalyst's ColumnPruning would anyway), drops NULL/dangling FK rows
    * via the inner join (P8, data/dataset.py:341-345), supports composite
    * keys. The parent side is usually the small dimension: Catalyst
    * auto-broadcasts under the threshold; AQE handles skew on the fact side.
    */
  def fkEdges(child: DataFrame, parent: DataFrame, fk: ForeignKeyDef): DataFrame = {
    val l = child.select((fk.columns :+ RowId).map(col): _*)
      .filter(fk.columns.map(c => col(c).isNotNull).reduce(_ && _))
      .withColumnRenamed(RowId, "src_id")
    val r = parent.select((fk.refColumns :+ RowId).map(col): _*)
      .withColumnRenamed(RowId, "dst_id")
    val cond = fk.columns.zip(fk.refColumns).map { case (a, b) => l(a) === r(b) }.reduce(_ && _)
    l.join(r, cond, "inner").select(col("src_id"), col("dst_id"))
  }

  /** Build the full graph from a schema + table map: assign row ids in PK
    * order (fallback: all columns), join every FK into an edge DataFrame.
    * (reference: heterodata_builder.py:240-302 / ctu_dataset.py:101-232) */
  def build(schema: Schema, tables: Map[String, DataFrame]): RelGraph = {
    val nodes = ListMap(schema.tables.toSeq.map { case (t, ts) =>
      val df = tables(t)
      val order = if (ts.primaryKey.nonEmpty) ts.primaryKey else df.columns.toSeq
      t -> withRowId(df, order)
    }: _*)
    val edges = ListMap(schema.edgeTypes.map { case (t, fk) =>
      EdgeType(t, fk.columns.mkString("_"), fk.refTable) ->
        fkEdges(nodes(t), nodes(fk.refTable), fk)
    }: _*)
    RelGraph(nodes, edges)
  }
}
