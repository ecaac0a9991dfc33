package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyze.SchemaAnalyzer
import graft.catalog.{ConstraintRegistry, ParquetCatalog}
import graft.convert.TableConverter
import graft.graph.RelGraph
import graft.pipeline.{Blueprint, Metrics}
import graft.schema._

/** Runnable end-to-end example — the reference's
  * `examples/example_sql_to_embedder.py` flow (connect → infer schema →
  * convert features → build the FK graph → message-pass → fit a readout),
  * restated on this engine's public API:
  *
  * {{{
  * sbt "runMain graft.examples.Example /root/testdata/sf0.001"
  * }}}
  *
  * Prints the inferred schema, feature shapes, graph statistics, and the
  * untrained-vs-fitted readout metrics. The same composition, with the
  * spec-grade assertions, lives in `EndToEndSpec`.
  */
object Example {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. catalog + statistics-driven schema inference, target declared
    val cat = new ParquetCatalog(spark, dir, ConstraintRegistry.testdata,
      tableFilter = graft.catalog.SetFilter(
        include = Some(Set("customer", "orders", "lineitem"))))
    val schema = new SchemaAnalyzer(cat,
      target = Some(("orders", "o_totalprice")), targetType = Some("numeric"))
      .guessSchema()
    println(s"inferred ${schema.tables.size} tables:")
    schema.tables.foreach { case (t, ts) =>
      val kinds = ts.columns.values.map(_.getClass.getSimpleName)
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
      println(s"  $t: ${kinds.mkString(", ")}  fks=${ts.foreignKeys.size}")
    }

    // 2. FK graph (row ids in PK order + every FK as an edge list) — ONE
    // id assignment serves both the graph and the feature frames below.
    // FKs pointing outside the analyzed table subset are pruned first
    // (the registry declares them; this run didn't load their targets).
    val present = schema.tables.keySet
    val pruned = Schema(scala.collection.immutable.ListMap(
      schema.tables.toSeq.map { case (t, ts) =>
        t -> ts.copy(foreignKeys = ts.foreignKeys.filter(fk => present(fk.refTable)))
      }: _*))
    val graph = RelGraph.build(pruned,
      pruned.tables.keys.map(t => t -> cat.table(t)).toMap)
    graph.edges.foreach { case (et, e) =>
      println(s"  edge ${et.src}->${et.dst}: ${e.count()} rows")
    }

    // 3. per-table feature conversion (target popped) over the id'd nodes
    val conv = new TableConverter()
    val frames: Map[String, (DataFrame, Map[String, ColumnDef])] =
      graph.nodes.map { case (t, withId) =>
        val target = if (t == "orders") Some("o_totalprice") else None
        t -> conv.convertTable(withId, schema(t), target,
          keep = Seq(RelGraph.RowId))
      }
    frames.foreach { case (t, (_, defs)) =>
      println(s"  $t -> ${defs.size} feature columns")
    }

    // 4. one message-passing round + closed-form fitted readout
    val nodes = frames.map { case (t, (df, defs)) =>
      val featCols = defs.keys.toSeq.sorted
      t -> df.select(col(RelGraph.RowId).as("id"),
        array(featCols.map(col): _*).as("feat"))
    }
    val out = Blueprint.forward(nodes, graph.edges,
      Blueprint.Config(layers = 1, aggr = "mean"))
    val dim = frames("orders")._2.size
    val y = graph.nodes("orders").select(col(RelGraph.RowId).as("id"),
      col("o_totalprice").as("y"))
    val untrained = Blueprint.decodeLinear(out("orders"), Array.fill(dim)(1.0), 0.0)
    val m0 = Metrics.regression(untrained.join(y, "id"), "score", "y").head()
    val (w, b) = Blueprint.fitLinearDecoder(out("orders").join(y, "id"),
      "feat", "y", dim, lambda = 1e-6)
    val m1 = Metrics.regression(
      Blueprint.decodeLinear(out("orders"), w, b).join(y, "id"), "score", "y").head()
    println(f"untrained readout MSE ${m0.getDouble(1)}%.1f -> fitted ${m1.getDouble(1)}%.1f")
    spark.stop()
  }
}
