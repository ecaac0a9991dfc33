package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analyze.SchemaAnalyzer
import graft.catalog.{ConstraintRegistry, ParquetCatalog}
import graft.convert.TableConverter
import graft.graph.{EdgeType, RelGraph}
import graft.pipeline.{Blueprint, Metrics}
import graft.schema._

/** SURVEY §7.2 minimum end-to-end slice, on the FIXTURES F-A regression
  * target `(orders, o_totalprice)`: catalog → analyzer (with target) →
  * per-table feature conversion (target popped) → row ids → FK edge graph
  * with reverse edges → one blueprint message-passing round → linear decode
  * → regression metrics. Exercises modules 1-5 + pipeline in one flow. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("full slice: analyze -> convert -> graph -> blueprint -> metrics") {
    val cat = new ParquetCatalog(spark, sf(), ConstraintRegistry.testdata,
      tableFilter = graft.catalog.SetFilter(
        include = Some(Set("customer", "orders", "lineitem"))))
    val schema = new SchemaAnalyzer(cat,
      target = Some(("orders", "o_totalprice")), targetType = Some("numeric"))
      .guessSchema()

    // row ids first, then convert with the id passed through
    val conv = new TableConverter()
    val frames: Map[String, (DataFrame, Map[String, ColumnDef])] =
      schema.tables.keys.map { t =>
        val ts = schema(t)
        val order = if (ts.primaryKey.nonEmpty) ts.primaryKey else cat.table(t).columns.toSeq
        val withId = RelGraph.withRowId(cat.table(t), order)
        val target = if (t == "orders") Some("o_totalprice") else None
        t -> conv.convertTable(withId, ts, target, keep = Seq(RelGraph.RowId))
      }.toMap

    // every converted frame: row id + >=1 numeric feature (filler if none)
    frames.foreach { case (t, (df, defs)) =>
      assert(df.columns.head == RelGraph.RowId, s"$t missing row id")
      assert(defs.nonEmpty, s"$t has no features")
    }

    // graph over the same row-id assignment
    val nodesRaw = schema.tables.keys.map { t =>
      val ts = schema(t)
      val order = if (ts.primaryKey.nonEmpty) ts.primaryKey else cat.table(t).columns.toSeq
      t -> RelGraph.withRowId(cat.table(t), order)
    }.toMap
    val edges = schema.edgeTypes
      .filter { case (t, fk) => nodesRaw.contains(t) && nodesRaw.contains(fk.refTable) }
      .map { case (t, fk) =>
        EdgeType(t, fk.columns.mkString("_"), fk.refTable) ->
          RelGraph.fkEdges(nodesRaw(t), nodesRaw(fk.refTable), fk)
      }.toMap

    // blueprint node features: id + feature vector
    val nodes = frames.map { case (t, (df, defs)) =>
      val featCols = defs.keys.toSeq.sorted
      t -> df.select(col(RelGraph.RowId).as("id"),
        array(featCols.map(col): _*).as("feat"))
    }
    val out = Blueprint.forward(nodes, edges,
      Blueprint.Config(layers = 1, aggr = "mean"))

    // decode orders to a scalar and score against the popped target
    val dim = frames("orders")._2.size
    val scored = Blueprint.decodeLinear(out("orders"), Array.fill(dim)(1.0), bias = 0.0)
    val y = nodesRaw("orders").select(col(RelGraph.RowId).as("id"),
      col("o_totalprice").as("y"))
    val m = Metrics.regression(scored.join(y, "id"), "score", "y").collect()(0)
    assert(scored.count() == cat.table("orders").count())
    assert(!m.getDouble(0).isNaN && !m.getDouble(1).isNaN && !m.getDouble(2).isNaN)
    assert(m.getDouble(0) > 0) // a 1-round untrained decode is not exact

    // TRAIN the readout (the reference's fit stage): closed-form ridge over
    // the propagated features — the fitted decode must beat the untrained
    // all-ones decode on MSE (tiny lambda guards filler-column collinearity)
    val joined = out("orders").join(y, "id")
    val (w, b) = Blueprint.fitLinearDecoder(joined, "feat", "y", dim, lambda = 1e-6)
    val fitted = Blueprint.decodeLinear(out("orders"), w, b)
    val mf = Metrics.regression(fitted.join(y, "id"), "score", "y").collect()(0)
    assert(mf.getDouble(1) < m.getDouble(1),
      s"fitted MSE ${mf.getDouble(1)} should beat untrained ${m.getDouble(1)}")
  }

  test("classification slice: categorical target factorizes and decodes") {
    import graft.convert.CategoricalCodes
    val cat = new ParquetCatalog(spark, sf(), ConstraintRegistry.testdata)
    val customer = cat.table("customer")
    val dict = CategoricalCodes.dictionary(customer, col("c_mktsegment"), Seq(col("c_custkey")))
    val encoded = CategoricalCodes.encode(customer, "c_mktsegment", dict, "y")
    assert(encoded.select("y").distinct().count() == 5)
    // acc of predicting the mode class
    val mode = graft.agg.VectorAgg.modeOf(encoded, "y")
    val acc = Metrics.accuracy(encoded.withColumn("pred", lit(mode)), "pred", "y")
      .collect()(0).getDouble(0)
    assert(acc > 0.0 && acc < 1.0)
  }
}
