package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.EdgeType

class BlueprintSpec extends SparkSpec {
  import spark.implicits._

  // two parents (ids 0,1), three children; child->parent edges
  private def nodes = Map(
    "parent" -> Seq((0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0))).toDF("id", "feat"),
    "child" -> Seq((0L, Array(2.0, 4.0)), (1L, Array(6.0, 8.0)), (2L, Array(1.0, 1.0)))
      .toDF("id", "feat"))

  private def edges = Map(
    EdgeType("child", "fk", "parent") -> Seq((0L, 0L), (1L, 0L), (2L, 1L)).toDF("src_id", "dst_id"))

  test("one mean-aggregation round combines self and neighbor features") {
    val out = Blueprint.forward(nodes, edges, Blueprint.Config(layers = 1, aggr = "mean"))
    val parent = out("parent").orderBy("id").as[(Long, Seq[Double])].collect()
    // parent 0: msgs mean((2,4),(6,8)) = (4,6); combine: ((0,0)+(4,6))/2 = (2,3)
    assert(parent(0) == ((0L, Seq(2.0, 3.0))))
    // parent 1: msg (1,1); combine ((10,10)+(1,1))/2 = (5.5, 5.5)
    assert(parent(1) == ((1L, Seq(5.5, 5.5))))
    // children receive nothing -> unchanged
    val child = out("child").orderBy("id").as[(Long, Seq[Double])].collect()
    assert(child(0)._2 == Seq(2.0, 4.0))
  }

  test("reverse edges flow information back over two layers") {
    val rev = edges + (EdgeType("parent", "rev_fk", "child") ->
      edges(EdgeType("child", "fk", "parent"))
        .select(col("dst_id").as("src_id"), col("src_id").as("dst_id")))
    val out = Blueprint.forward(nodes, rev, Blueprint.Config(layers = 2, aggr = "sum"))
    // after round 1 children got parent features; after round 2 they reflect
    // both directions — just assert shape + change happened
    val child = out("child").orderBy("id").as[(Long, Seq[Double])].collect()
    assert(child.length == 3 && child.forall(_._2.length == 2))
    assert(child(0)._2 != Seq(2.0, 4.0))
  }

  test("pre/post transforms apply per node type") {
    val double2x: Blueprint.NodeTransform =
      df => df.select(col("id"), transform(col("feat"), x => x * 2).as("feat"))
    val out = Blueprint.forward(nodes, Map.empty,
      Blueprint.Config(layers = 1, pre = double2x, post = double2x))
    val p = out("parent").orderBy("id").as[(Long, Seq[Double])].collect()
    assert(p(1)._2 == Seq(40.0, 40.0)) // 10 * 2 (pre) * 2 (post)
  }

  test("linear and class decoders produce scores / argmax predictions") {
    val scored = Blueprint.decodeLinear(nodes("child"), Array(1.0, 0.5), bias = 1.0)
      .orderBy("id").select("score").as[Double].collect()
    assert(scored.toSeq == Seq(2 + 2 + 1.0, 6 + 4 + 1.0, 1 + 0.5 + 1.0))
    val cls = Blueprint.decodeClasses(nodes("child"),
        Seq(Array(1.0, 0.0), Array(0.0, 1.0)))
      .orderBy("id").select("pred").as[Long].collect()
    assert(cls.toSeq == Seq(1L, 1L, 0L)) // feat(1)>feat(0) for children 0,1; tie->first for child 2
  }

  test("fitLinearDecoder: OLS recovers an exact linear relationship") {
    // y = 2*x1 - 3*x2 + 5 exactly -> zero-residual OLS solution
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (2.0, 3.0), (4.0, 1.0))
    val df = pts.map { case (x1, x2) => (Array(x1, x2), 2 * x1 - 3 * x2 + 5) }
      .toDF("feat", "y")
    val (w, b) = Blueprint.fitLinearDecoder(df, "feat", "y", dim = 2, lambda = 0.0)
    assert(math.abs(w(0) - 2.0) < 1e-9 && math.abs(w(1) + 3.0) < 1e-9)
    assert(math.abs(b - 5.0) < 1e-9)
    // fitted weights drive decodeLinear to reproduce y
    val scored = Blueprint.decodeLinear(
        df.withColumn("id", monotonically_increasing_id()), w, b)
      .select("score").as[Double].collect().sorted
    val ys = pts.map { case (x1, x2) => 2 * x1 - 3 * x2 + 5 }.sorted
    scored.zip(ys).foreach { case (a, e) => assert(math.abs(a - e) < 1e-9) }
  }

  test("kFoldRidge: each fold's model is fitLinearDecoder on everything OUTSIDE it") {
    // y = 2*x1 - 3*x2 + 5 exactly; folds 0/1/2 by row
    val pts = Seq((0, 0.0, 0.0), (1, 1.0, 0.0), (2, 0.0, 1.0), (0, 2.0, 3.0),
      (1, 4.0, 1.0), (2, 1.0, 2.0), (0, 3.0, 0.5), (1, 0.5, 2.5))
    val df = pts.map { case (f, x1, x2) =>
      (f, Array(x1, x2), 2 * x1 - 3 * x2 + 5) }.toDF("fold", "feat", "y")
    val cv = Blueprint.kFoldRidge(df, "feat", "y", dim = 2, "fold", lambda = 0.5)
      .orderBy("fold").collect()
    assert(cv.length == 3)
    assert(cv.map(_.getLong(cv(0).fieldIndex("n_test"))).sum == pts.length,
      "every row is held out exactly once")
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    cv.foreach { r =>
      val f = r.getInt(0)
      val (w, b) = Blueprint.fitLinearDecoder(
        df.filter(col("fold") =!= f), "feat", "y", dim = 2, lambda = 0.5)
      assert(math.abs(r.getDouble(r.fieldIndex("w_0")) - r4(w(0))) < 2e-4 &&
        math.abs(r.getDouble(r.fieldIndex("w_1")) - r4(w(1))) < 2e-4 &&
        math.abs(r.getDouble(r.fieldIndex("bias")) - r4(b)) < 2e-4,
        s"fold $f leave-out model must match the direct fit on the complement")
    }
  }

  test("kFoldRidge: a fold's own labels cannot leak into its model") {
    val pts = Seq((0, 1.0, 2.0, 3.0), (0, 2.0, 0.0, 1.0), (1, 0.0, 1.0, 4.0),
      (1, 3.0, 1.0, 0.0), (2, 1.0, 1.0, 2.0), (2, 0.5, 2.0, 1.5))
    def frame(poison: Boolean) = pts.map { case (f, x1, x2, y) =>
      (f, Array(x1, x2), if (poison && f == 0) y + 1000.0 else y)
    }.toDF("fold", "feat", "y")
    val clean = Blueprint.kFoldRidge(frame(false), "feat", "y", 2, "fold", 0.5)
      .orderBy("fold").collect()
    val poisoned = Blueprint.kFoldRidge(frame(true), "feat", "y", 2, "fold", 0.5)
      .orderBy("fold").collect()
    def model(r: org.apache.spark.sql.Row) =
      (r.getDouble(r.fieldIndex("w_0")), r.getDouble(r.fieldIndex("w_1")),
        r.getDouble(r.fieldIndex("bias")))
    assert(model(clean(0)) == model(poisoned(0)),
      "fold 0's model is fit WITHOUT fold 0 — corrupting fold 0's labels must not move it")
    assert(model(clean(1)) != model(poisoned(1)),
      "other folds DO train on fold 0, so their models must move")
  }

  test("fitLinearDecoder: ridge shrinks weights but not the intercept path") {
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (2.0, 3.0), (4.0, 1.0))
    val df = pts.map { case (x1, x2) => (Array(x1, x2), 2 * x1 - 3 * x2 + 5) }
      .toDF("feat", "y")
    val (w, _) = Blueprint.fitLinearDecoder(df, "feat", "y", dim = 2, lambda = 100.0)
    assert(math.abs(w(0)) < 2.0 && math.abs(w(1)) < 3.0) // shrunk toward 0
  }

  test("fitClassDecoders: one-vs-rest ridge separates linearly-separable classes") {
    // class determined by which feature dominates; well-separated clusters
    val rows = Seq(
      (Array(5.0, 0.0), "x"), (Array(6.0, 1.0), "x"), (Array(4.0, 0.5), "x"),
      (Array(0.0, 5.0), "y"), (Array(1.0, 6.0), "y"), (Array(0.5, 4.0), "y"))
    val df = rows.toDF("feat", "y")
    val classes = Seq("x", "y")
    val fits = Blueprint.fitClassDecoders(df, "feat", "y", dim = 2, classes, lambda = 0.01)
    // argmax of the per-class ridge scores must classify every point right
    val scored = Blueprint.decodeClasses(
        df.withColumn("id", monotonically_increasing_id()),
        fits.map(_._1), fits.map(_._2))
      .select("pred").as[Long].collect()
    val want = rows.map { case (_, c) => classes.indexOf(c).toLong }
    assert(scored.toSeq == want)
    // multi-target fit agrees with fitting each indicator separately
    val single = Blueprint.fitLinearDecoder(
      df.withColumn("ind", when(col("y") === "x", 1.0).otherwise(0.0)),
      "feat", "ind", dim = 2, lambda = 0.01)
    assert(fits.head._1.zip(single._1).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(math.abs(fits.head._2 - single._2) < 1e-12)
  }

  test("attn aggregation: attention round matches scatter-mean for zero queries") {
    // parents have zero feature vectors -> all edge scores 0 -> uniform
    // softmax -> the attention reduce equals the mean reduce
    val mean = Blueprint.forward(nodes, edges, Blueprint.Config(layers = 1, aggr = "mean"))
    val attn = Blueprint.forward(nodes, edges, Blueprint.Config(layers = 1, aggr = "attn"))
    val m = mean("parent").orderBy("id").as[(Long, Seq[Double])].collect()
    val a = attn("parent").orderBy("id").as[(Long, Seq[Double])].collect()
    // parent 0 has feat (0,0): scores are 0 -> attention == mean
    assert(a(0) == m(0))
    // parent 1 has feat (10,10) and a single neighbor: softmax over one
    // message is weight 1 -> same as mean of one
    assert(a(1) == m(1))
  }

  test("edgeAggr overrides the aggregation per edge type") {
    val et = EdgeType("child", "fk", "parent")
    val out = Blueprint.forward(nodes, edges,
      Blueprint.Config(layers = 1, aggr = "mean", edgeAggr = Map(et -> "sum")))
    val p = out("parent").orderBy("id").as[(Long, Seq[Double])].collect()
    // parent 0 under SUM: msgs (2,4)+(6,8) = (8,12); combine ((0,0)+(8,12))/2
    assert(p(0) == ((0L, Seq(4.0, 6.0))))
    // an unlisted edge type would fall back to cfg.aggr (= mean): covered
    // by the first test; here the override changed the result
  }

  test("nodeCombine overrides the combine per destination node type") {
    val replace: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column = (_, msg) => msg
    val out = Blueprint.forward(nodes, edges,
      Blueprint.Config(layers = 1, aggr = "mean",
        nodeCombine = Map("parent" -> replace)))
    val p = out("parent").orderBy("id").as[(Long, Seq[Double])].collect()
    // parent 0 takes the neighbor mean outright: mean((2,4),(6,8)) = (4,6)
    assert(p(0) == ((0L, Seq(4.0, 6.0))))
  }

  test("batch-size heuristic matches the reference formula") {
    assert(Blueprint.batchSizeHeuristic(500) == 16)    // 2^0 < 16 floor
    assert(Blueprint.batchSizeHeuristic(64000) == 128) // 2^round(log2(128))
    assert(Blueprint.batchSizeHeuristic(64000, 3) == 1024)
    assert(Blueprint.batchSizeHeuristic(100000000, 8) == 16384) // cap
  }

  test("fitLogisticGD: steps reduce logistic loss; empty input errors") {
    // linearly separable toy data: y = 1 iff x1 > 3
    val df = Seq((1.0, 1.0, 0.0), (2.0, 2.0, 0.0), (3.0, 1.0, 0.0),
        (4.0, 2.0, 1.0), (5.0, 1.0, 1.0), (6.0, 2.0, 1.0))
      .map { case (a, b, y) => (Array(a, b), y) }.toDF("feat", "y")
    val (w1, b1) = Blueprint.fitLogisticGD(df, "feat", "y", dim = 2,
      steps = 1, lr = 0.5)
    val (w20, b20) = Blueprint.fitLogisticGD(df, "feat", "y", dim = 2,
      steps = 20, lr = 0.5)
    def loss(w: Array[Double], b: Double): Double = {
      // direct logistic loss, driver-side over the 6 rows
      val rows = Seq((1.0, 1.0, 0.0), (2.0, 2.0, 0.0), (3.0, 1.0, 0.0),
        (4.0, 2.0, 1.0), (5.0, 1.0, 1.0), (6.0, 2.0, 1.0))
      rows.map { case (a, c, y) =>
        val m = w(0) * a + w(1) * c + b
        val pr = 1.0 / (1.0 + math.exp(-m))
        -(y * math.log(pr) + (1 - y) * math.log(1 - pr))
      }.sum / rows.length
    }
    assert(loss(w20, b20) < loss(w1, b1), "more GD steps must lower the loss")
    assert(loss(w20, b20) < math.log(2.0), "below the all-0.5 baseline")
    intercept[IllegalArgumentException] {
      Blueprint.fitLogisticGD(df.filter($"y" > 5), "feat", "y", 2, 1, 0.1)
    }
  }

  test("fitMlpGD: analytic gradient matches finite differences; loss falls") {
    // small non-separable data so the hidden layer has something to do
    val data = Seq((0.0, 0.0, 0.0), (0.0, 1.0, 1.0), (1.0, 0.0, 1.0),
      (1.0, 1.0, 0.0), (2.0, 2.0, 0.0), (0.5, 1.5, 1.0))
    val df = data.map { case (a, b, y) => (Array(a, b), y) }.toDF("feat", "y")
    val init = Blueprint.MlpParams(
      Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(0.05, -0.05),
      Array(0.25, -0.35), 0.1)
    def deepCopy(p: Blueprint.MlpParams) = Blueprint.MlpParams(
      p.w1.map(_.clone()), p.b1.clone(), p.w2.clone(), p.b2)
    // one GD step with lr recovers the gradient: g = (init - stepped) / lr
    val lr = 1e-3
    val stepped = Blueprint.fitMlpGD(df, "feat", "y", dim = 2, hidden = 2,
      steps = 1, lr = lr, init = deepCopy(init))
    val gradW00 = (init.w1(0)(0) - stepped.w1(0)(0)) / lr
    val gradV1 = (init.w2(1) - stepped.w2(1)) / lr
    val gradB2 = (init.b2 - stepped.b2) / lr
    // finite differences on the loss surface
    val eps = 1e-5
    def lossWith(mut: Blueprint.MlpParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.mlpLogLoss(df, "feat", "y", p)
    }
    val fdW00 = (lossWith(_.w1(0)(0) += eps) - lossWith(_.w1(0)(0) -= eps)) / (2 * eps)
    val fdV1 = (lossWith(_.w2(1) += eps) - lossWith(_.w2(1) -= eps)) / (2 * eps)
    def lossAt(p: Blueprint.MlpParams) = Blueprint.mlpLogLoss(df, "feat", "y", p)
    val fdB2 = (lossAt(deepCopy(init).copy(b2 = init.b2 + eps)) -
      lossAt(deepCopy(init).copy(b2 = init.b2 - eps))) / (2 * eps)
    assert(math.abs(gradW00 - fdW00) < 1e-4, s"w1 grad $gradW00 vs fd $fdW00")
    assert(math.abs(gradV1 - fdV1) < 1e-4, s"w2 grad $gradV1 vs fd $fdV1")
    assert(math.abs(gradB2 - fdB2) < 1e-4, s"b2 grad $gradB2 vs fd $fdB2")
    // end-to-end: training lowers the loss vs the initial parameters
    val trained = Blueprint.fitMlpGD(df, "feat", "y", dim = 2, hidden = 2,
      steps = 50, lr = 0.5, init = deepCopy(init))
    assert(Blueprint.mlpLogLoss(df, "feat", "y", trained) <
      Blueprint.mlpLogLoss(df, "feat", "y", init))
    // shape validation fails fast
    intercept[IllegalArgumentException] {
      Blueprint.fitMlpGD(df, "feat", "y", dim = 2, hidden = 3, steps = 1,
        lr = 0.1, init = init)
    }
  }

  test("fitGnnGD: gradient flows THROUGH the scatter-sum; loss falls on the FK graph") {
    // parents 1-4; parent 4 is CHILDLESS (aggregates zero messages) and a
    // dangling child (fk=99) reaches nobody — both paths must be inert
    val children = Seq(
      (1L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(1.0, 1.0)),
      (3L, Array(0.5, 2.0)), (3L, Array(1.5, 0.5)),
      (99L, Array(9.0, 9.0))
    ).toDF("fk", "feat")
    val parents = Seq((1L, 1.0), (2L, 0.0), (3L, 1.0), (4L, 0.0))
      .toDF("pid", "y")
    val init = Blueprint.MlpParams(
      Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(0.05, -0.05),
      Array(0.25, -0.35), 0.1)
    def deepCopy(p: Blueprint.MlpParams) = Blueprint.MlpParams(
      p.w1.map(_.clone()), p.b1.clone(), p.w2.clone(), p.b2)
    val lr = 1e-3
    val stepped = Blueprint.fitGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, steps = 1, lr = lr,
      init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.MlpParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.gnnLogLoss(children, Seq("fk"), "feat", parents, Seq("pid"), "y", p)
    }
    // w1 sits UPSTREAM of the aggregation: this finite difference is the
    // proof the adjoint join-back really backprops through the groupBy-sum
    val gradW00 = (init.w1(0)(0) - stepped.w1(0)(0)) / lr
    val fdW00 = (lossWith(_.w1(0)(0) += eps) - lossWith(_.w1(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradW00 - fdW00) < 1e-4, s"w1 grad $gradW00 vs fd $fdW00")
    val gradB10 = (init.b1(0) - stepped.b1(0)) / lr
    val fdB10 = (lossWith(_.b1(0) += eps) - lossWith(_.b1(0) -= eps)) / (2 * eps)
    assert(math.abs(gradB10 - fdB10) < 1e-4, s"b1 grad $gradB10 vs fd $fdB10")
    // readout side too
    val gradV0 = (init.w2(0) - stepped.w2(0)) / lr
    val fdV0 = (lossWith(_.w2(0) += eps) - lossWith(_.w2(0) -= eps)) / (2 * eps)
    assert(math.abs(gradV0 - fdV0) < 1e-4, s"w2 grad $gradV0 vs fd $fdV0")
    // training lowers the loss end to end
    val trained = Blueprint.fitGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, steps = 60, lr = 0.5,
      init = deepCopy(init))
    assert(Blueprint.gnnLogLoss(children, Seq("fk"), "feat",
        parents, Seq("pid"), "y", trained) <
      Blueprint.gnnLogLoss(children, Seq("fk"), "feat",
        parents, Seq("pid"), "y", init))
    // the per-step checkpoints are released (graft.util.Checkpoints)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Blueprint.fitGnnGD(children, Seq("fk"), "feat", parents, Seq("pid"), "y",
      dim = 2, hidden = 2, steps = 3, lr = 0.1, init = deepCopy(init))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "fitGnnGD must release every per-step checkpoint")
  }

  test("fitHeteroGnnGD: joint training across edge types — gradients of BOTH types match finite differences") {
    // forward type: lineitem-like children (several per parent);
    // reverse type (J5): exactly one "child" per parent with 1-dim feature
    val liChildren = Seq(
      (1L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(1.0, 1.0)),
      (3L, Array(0.5, 2.0)), (3L, Array(1.5, 0.5)),
      (99L, Array(9.0, 9.0)) // dangling: reaches nobody
    ).toDF("fk", "feat")
    val revChildren = Seq(
      (1L, Array(0.7)), (2L, Array(-0.3)), (3L, Array(1.2))
      // parent 4 is childless in BOTH types
    ).toDF("fk", "feat")
    val parents = Seq((1L, 1.0), (2L, 0.0), (3L, 1.0), (4L, 0.0))
      .toDF("pid", "y")
    val groups = Seq(
      Blueprint.EdgeGroup(liChildren, Seq("fk"), "feat", dim = 2),
      Blueprint.EdgeGroup(revChildren, Seq("fk"), "feat", dim = 1))
    val init = Blueprint.HeteroGnnParams(
      Seq(Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(Array(0.2, 0.3))),
      Seq(Array(0.05, -0.05), Array(0.0, 0.1)),
      Array(0.25, -0.35), 0.1)
    def deepCopy(p: Blueprint.HeteroGnnParams) = Blueprint.HeteroGnnParams(
      p.w1.map(_.map(_.clone())), p.b1.map(_.clone()), p.w2.clone(), p.b2)
    val lr = 1e-3
    val stepped = Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
      hidden = 2, steps = 1, lr = lr, init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.HeteroGnnParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.heteroGnnLogLoss(groups, parents, Seq("pid"), "y", p)
    }
    // a message weight of EACH type — both adjoint join-backs must be live
    val gradT0 = (init.w1(0)(0)(0) - stepped.w1(0)(0)(0)) / lr
    val fdT0 = (lossWith(_.w1(0)(0)(0) += eps) - lossWith(_.w1(0)(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradT0 - fdT0) < 1e-4, s"type-0 w1 grad $gradT0 vs fd $fdT0")
    val gradT1 = (init.w1(1)(0)(1) - stepped.w1(1)(0)(1)) / lr
    val fdT1 = (lossWith(_.w1(1)(0)(1) += eps) - lossWith(_.w1(1)(0)(1) -= eps)) / (2 * eps)
    assert(math.abs(gradT1 - fdT1) < 1e-4, s"type-1 w1 grad $gradT1 vs fd $fdT1")
    val gradB11 = (init.b1(1)(0) - stepped.b1(1)(0)) / lr
    val fdB11 = (lossWith(_.b1(1)(0) += eps) - lossWith(_.b1(1)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradB11 - fdB11) < 1e-4, s"type-1 b1 grad $gradB11 vs fd $fdB11")
    // the SHARED readout sees the cross-type sum
    val gradV0 = (init.w2(0) - stepped.w2(0)) / lr
    val fdV0 = (lossWith(_.w2(0) += eps) - lossWith(_.w2(0) -= eps)) / (2 * eps)
    assert(math.abs(gradV0 - fdV0) < 1e-4, s"w2 grad $gradV0 vs fd $fdV0")
    // training lowers the loss end to end
    val trained = Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
      hidden = 2, steps = 60, lr = 0.5, init = deepCopy(init))
    assert(Blueprint.heteroGnnLogLoss(groups, parents, Seq("pid"), "y", trained) <
      Blueprint.heteroGnnLogLoss(groups, parents, Seq("pid"), "y", init))
    // per-step checkpoints released
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
      hidden = 2, steps = 2, lr = 0.1, init = deepCopy(init))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "fitHeteroGnnGD must release every per-step checkpoint")
  }

  test("fitHeteroGnnGD aggr=mean: the 1/n adjoint matches finite differences") {
    // unequal child counts (3 vs 1) make the mean scaling observable
    val liChildren = Seq(
      (1L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(1.0, 1.0)),
      (3L, Array(0.5, 2.0)), (3L, Array(1.5, 0.5))
    ).toDF("fk", "feat")
    val revChildren = Seq((1L, Array(0.7)), (2L, Array(-0.3)), (3L, Array(1.2)))
      .toDF("fk", "feat")
    val parents = Seq((1L, 1.0), (2L, 0.0), (3L, 1.0), (4L, 0.0)).toDF("pid", "y")
    val groups = Seq(
      Blueprint.EdgeGroup(liChildren, Seq("fk"), "feat", dim = 2),
      Blueprint.EdgeGroup(revChildren, Seq("fk"), "feat", dim = 1))
    val init = Blueprint.HeteroGnnParams(
      Seq(Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(Array(0.2, 0.3))),
      Seq(Array(0.05, -0.05), Array(0.0, 0.1)),
      Array(0.25, -0.35), 0.1)
    def deepCopy(p: Blueprint.HeteroGnnParams) = Blueprint.HeteroGnnParams(
      p.w1.map(_.map(_.clone())), p.b1.map(_.clone()), p.w2.clone(), p.b2)
    val lr = 1e-3
    val stepped = Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
      hidden = 2, steps = 1, lr = lr, init = deepCopy(init), aggr = "mean")
    val eps = 1e-5
    def lossWith(mut: Blueprint.HeteroGnnParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.heteroGnnLogLoss(groups, parents, Seq("pid"), "y", p, aggr = "mean")
    }
    val gradT0 = (init.w1(0)(0)(0) - stepped.w1(0)(0)(0)) / lr
    val fdT0 = (lossWith(_.w1(0)(0)(0) += eps) - lossWith(_.w1(0)(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradT0 - fdT0) < 1e-4, s"mean type-0 w1 grad $gradT0 vs fd $fdT0")
    val gradT1 = (init.w1(1)(0)(0) - stepped.w1(1)(0)(0)) / lr
    val fdT1 = (lossWith(_.w1(1)(0)(0) += eps) - lossWith(_.w1(1)(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradT1 - fdT1) < 1e-4, s"mean type-1 w1 grad $gradT1 vs fd $fdT1")
    // mean ≠ sum on this fixture (parent 1 has 3 children): the two
    // aggregations must genuinely train different surfaces
    val steppedSum = Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
      hidden = 2, steps = 1, lr = lr, init = deepCopy(init), aggr = "sum")
    assert(math.abs(stepped.w1(0)(0)(0) - steppedSum.w1(0)(0)(0)) > 1e-9)
    intercept[IllegalArgumentException] {
      Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
        hidden = 2, steps = 1, lr = lr, init = deepCopy(init), aggr = "cat")
    }
  }

  test("fitHeteroGnnGD aggr=attn: per-group attention scorers train jointly") {
    val liChildren = Seq(
      (1L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(1.0, 1.0)),
      (3L, Array(0.5, 2.0)), (3L, Array(1.5, 0.5))
    ).toDF("fk", "feat")
    // the reverse-type parent 1 gets TWO children so ITS softmax is
    // non-degenerate too (a single-child group has α = 1 and zero u-grad)
    val revChildren = Seq(
      (1L, Array(0.7)), (1L, Array(-0.4)), (2L, Array(-0.3)), (3L, Array(1.2))
    ).toDF("fk", "feat")
    val parents = Seq((1L, 1.0), (2L, 0.0), (3L, 1.0), (4L, 0.0)).toDF("pid", "y")
    val groups = Seq(
      Blueprint.EdgeGroup(liChildren, Seq("fk"), "feat", dim = 2),
      Blueprint.EdgeGroup(revChildren, Seq("fk"), "feat", dim = 1))
    val init = Blueprint.HeteroGnnParams(
      Seq(Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(Array(0.2, 0.3))),
      Seq(Array(0.05, -0.05), Array(0.0, 0.1)),
      Array(0.25, -0.35), 0.1,
      Seq(Array(0.15, -0.25), Array(0.3)))
    def deepCopy(p: Blueprint.HeteroGnnParams) = Blueprint.HeteroGnnParams(
      p.w1.map(_.map(_.clone())), p.b1.map(_.clone()), p.w2.clone(), p.b2,
      p.u.map(_.clone()))
    val lr = 1e-3
    val stepped = Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
      hidden = 2, steps = 1, lr = lr, init = deepCopy(init), aggr = "attn")
    val eps = 1e-5
    def lossWith(mut: Blueprint.HeteroGnnParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.heteroGnnLogLoss(groups, parents, Seq("pid"), "y", p, aggr = "attn")
    }
    // BOTH groups' attention scorers — the per-type softmax Jacobians
    val gradU0 = (init.u(0)(0) - stepped.u(0)(0)) / lr
    val fdU0 = (lossWith(_.u(0)(0) += eps) - lossWith(_.u(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradU0 - fdU0) < 1e-4, s"type-0 u grad $gradU0 vs fd $fdU0")
    assert(math.abs(fdU0) > 1e-7, "type-0 attention path must be live")
    val gradU1 = (init.u(1)(0) - stepped.u(1)(0)) / lr
    val fdU1 = (lossWith(_.u(1)(0) += eps) - lossWith(_.u(1)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradU1 - fdU1) < 1e-4, s"type-1 u grad $gradU1 vs fd $fdU1")
    assert(math.abs(fdU1) > 1e-7, "type-1 attention path must be live")
    // message weights still correct with α in each type's chain
    val gradW0 = (init.w1(0)(0)(0) - stepped.w1(0)(0)(0)) / lr
    val fdW0 = (lossWith(_.w1(0)(0)(0) += eps) - lossWith(_.w1(0)(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradW0 - fdW0) < 1e-4, s"type-0 w1 grad $gradW0 vs fd $fdW0")
    val gradV = (init.w2(0) - stepped.w2(0)) / lr
    val fdV = (lossWith(_.w2(0) += eps) - lossWith(_.w2(0) -= eps)) / (2 * eps)
    assert(math.abs(gradV - fdV) < 1e-4, s"w2 grad $gradV vs fd $fdV")
    // loss falls; all per-step checkpoints (dst + one ed per group) released
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val trained = Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
      hidden = 2, steps = 40, lr = 0.5, init = deepCopy(init), aggr = "attn")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "fitHeteroGnnGD(attn) must release every per-step checkpoint")
    assert(Blueprint.heteroGnnLogLoss(groups, parents, Seq("pid"), "y",
        trained, aggr = "attn") <
      Blueprint.heteroGnnLogLoss(groups, parents, Seq("pid"), "y",
        init, aggr = "attn"))
    // attn without scorers fails fast
    intercept[IllegalArgumentException] {
      Blueprint.fitHeteroGnnGD(groups, parents, Seq("pid"), "y",
        hidden = 2, steps = 1, lr = lr,
        init = Blueprint.HeteroGnnParams(init.w1, init.b1, init.w2, init.b2),
        aggr = "attn")
    }
  }

  test("fitAttnGnnGD: gradient flows THROUGH the attention weights; loss falls") {
    val children = Seq(
      (1L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(1.0, 1.0)),
      (3L, Array(0.5, 2.0)), (3L, Array(1.5, 0.5)),
      (99L, Array(9.0, 9.0))
    ).toDF("fk", "feat")
    val parents = Seq((1L, 1.0), (2L, 0.0), (3L, 1.0), (4L, 0.0))
      .toDF("pid", "y")
    val init = Blueprint.AttnGnnParams(
      Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(0.05, -0.05),
      Array(0.15, -0.25), Array(0.25, -0.35), 0.1)
    def deepCopy(p: Blueprint.AttnGnnParams) = Blueprint.AttnGnnParams(
      p.w1.map(_.clone()), p.b1.clone(), p.u.clone(), p.w2.clone(), p.b2)
    val lr = 1e-3
    val stepped = Blueprint.fitAttnGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, steps = 1, lr = lr,
      init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.AttnGnnParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.attnGnnLogLoss(children, Seq("fk"), "feat", parents, Seq("pid"), "y", p)
    }
    // the ATTENTION weights: the softmax-Jacobian path dm·α·(m−s)·x
    val gradU0 = (init.u(0) - stepped.u(0)) / lr
    val fdU0 = (lossWith(_.u(0) += eps) - lossWith(_.u(0) -= eps)) / (2 * eps)
    assert(math.abs(gradU0 - fdU0) < 1e-4, s"u0 grad $gradU0 vs fd $fdU0")
    val gradU1 = (init.u(1) - stepped.u(1)) / lr
    val fdU1 = (lossWith(_.u(1) += eps) - lossWith(_.u(1) -= eps)) / (2 * eps)
    assert(math.abs(gradU1 - fdU1) < 1e-4, s"u1 grad $gradU1 vs fd $fdU1")
    // the attention gradient is NOT trivially zero on this data
    assert(math.abs(fdU0) > 1e-6 || math.abs(fdU1) > 1e-6,
      "fixture must exercise the attention path")
    // message weights still correct with α in the chain
    val gradW00 = (init.w1(0)(0) - stepped.w1(0)(0)) / lr
    val fdW00 = (lossWith(_.w1(0)(0) += eps) - lossWith(_.w1(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradW00 - fdW00) < 1e-4, s"w1 grad $gradW00 vs fd $fdW00")
    val gradV1 = (init.w2(1) - stepped.w2(1)) / lr
    val fdV1 = (lossWith(_.w2(1) += eps) - lossWith(_.w2(1) -= eps)) / (2 * eps)
    assert(math.abs(gradV1 - fdV1) < 1e-4, s"w2 grad $gradV1 vs fd $fdV1")
    // training lowers the loss end to end
    val trained = Blueprint.fitAttnGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, steps = 60, lr = 0.5,
      init = deepCopy(init))
    assert(Blueprint.attnGnnLogLoss(children, Seq("fk"), "feat",
        parents, Seq("pid"), "y", trained) <
      Blueprint.attnGnnLogLoss(children, Seq("fk"), "feat",
        parents, Seq("pid"), "y", init))
    // per-step checkpoints (edge frame AND parent frame) released
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Blueprint.fitAttnGnnGD(children, Seq("fk"), "feat", parents, Seq("pid"), "y",
      dim = 2, hidden = 2, steps = 2, lr = 0.1, init = deepCopy(init))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "fitAttnGnnGD must release every per-step checkpoint")
  }

  test("fitGnn2GD: gradient flows through TWO nested scatter-sums; loss falls") {
    // roots 1-3 (root 3 midless); mid 20 leafless; dangling leaf fk=99
    val leaves = Seq(
      (10L, Array(1.0, 0.0)), (10L, Array(0.0, 1.0)), (10L, Array(2.0, 1.0)),
      (11L, Array(1.0, 1.0)),
      (21L, Array(0.5, 2.0)),
      (99L, Array(9.0, 9.0))
    ).toDF("mfk", "feat")
    val mids = Seq(
      (10L, 1L, Array(0.3)), (11L, 1L, Array(-0.2)),
      (20L, 2L, Array(0.8)), (21L, 2L, Array(0.1))
    ).toDF("mid", "rfk", "feat")
    val roots = Seq((1L, 1.0), (2L, 0.0), (3L, 1.0)).toDF("rid", "y")
    val init = Blueprint.Gnn2Params(
      Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(0.05, -0.05),
      Array(Array(0.2, -0.3), Array(-0.25, 0.15), Array(0.1, 0.35)), // d2 = h1+midDim = 3
      Array(0.02, -0.02),
      Array(0.25, -0.35), 0.1)
    def deepCopy(p: Blueprint.Gnn2Params) = Blueprint.Gnn2Params(
      p.w1.map(_.clone()), p.b1.clone(), p.w2.map(_.clone()), p.b2.clone(),
      p.v.clone(), p.vb)
    val lr = 1e-3
    val stepped = Blueprint.fitGnn2GD(leaves, Seq("mfk"), "feat",
      mids, Seq("mid"), Seq("rfk"), "feat", midDim = 1,
      roots, Seq("rid"), "y", leafDim = 2, h1 = 2, h2 = 2, steps = 1, lr = lr,
      init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.Gnn2Params => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.gnn2LogLoss(leaves, Seq("mfk"), "feat",
        mids, Seq("mid"), Seq("rfk"), "feat", midDim = 1,
        roots, Seq("rid"), "y", p)
    }
    // the LEVEL-1 message weight sits under BOTH aggregations — this
    // finite difference is the two-nested-join-backs proof
    val gradW1 = (init.w1(0)(0) - stepped.w1(0)(0)) / lr
    val fdW1 = (lossWith(_.w1(0)(0) += eps) - lossWith(_.w1(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradW1 - fdW1) < 1e-4, s"w1 grad $gradW1 vs fd $fdW1")
    assert(math.abs(fdW1) > 1e-7, "fixture must exercise the depth-2 path")
    val gradB1 = (init.b1(1) - stepped.b1(1)) / lr
    val fdB1 = (lossWith(_.b1(1) += eps) - lossWith(_.b1(1) -= eps)) / (2 * eps)
    assert(math.abs(gradB1 - fdB1) < 1e-4, s"b1 grad $gradB1 vs fd $fdB1")
    // level-2 weights over BOTH input halves: the aggregate (A) row and
    // the mid's own feature (z) row
    val gradW2A = (init.w2(0)(0) - stepped.w2(0)(0)) / lr
    val fdW2A = (lossWith(_.w2(0)(0) += eps) - lossWith(_.w2(0)(0) -= eps)) / (2 * eps)
    assert(math.abs(gradW2A - fdW2A) < 1e-4, s"w2[A] grad $gradW2A vs fd $fdW2A")
    val gradW2Z = (init.w2(2)(1) - stepped.w2(2)(1)) / lr
    val fdW2Z = (lossWith(_.w2(2)(1) += eps) - lossWith(_.w2(2)(1) -= eps)) / (2 * eps)
    assert(math.abs(gradW2Z - fdW2Z) < 1e-4, s"w2[z] grad $gradW2Z vs fd $fdW2Z")
    val gradV = (init.v(0) - stepped.v(0)) / lr
    val fdV = (lossWith(_.v(0) += eps) - lossWith(_.v(0) -= eps)) / (2 * eps)
    assert(math.abs(gradV - fdV) < 1e-4, s"v grad $gradV vs fd $fdV")
    // training lowers the loss end to end
    val trained = Blueprint.fitGnn2GD(leaves, Seq("mfk"), "feat",
      mids, Seq("mid"), Seq("rfk"), "feat", midDim = 1,
      roots, Seq("rid"), "y", leafDim = 2, h1 = 2, h2 = 2, steps = 60, lr = 0.5,
      init = deepCopy(init))
    assert(Blueprint.gnn2LogLoss(leaves, Seq("mfk"), "feat",
        mids, Seq("mid"), Seq("rfk"), "feat", 1, roots, Seq("rid"), "y", trained) <
      Blueprint.gnn2LogLoss(leaves, Seq("mfk"), "feat",
        mids, Seq("mid"), Seq("rfk"), "feat", 1, roots, Seq("rid"), "y", init))
    // both per-step checkpoints (mid and root frames) released
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Blueprint.fitGnn2GD(leaves, Seq("mfk"), "feat",
      mids, Seq("mid"), Seq("rfk"), "feat", midDim = 1,
      roots, Seq("rid"), "y", leafDim = 2, h1 = 2, h2 = 2, steps = 2, lr = 0.1,
      init = deepCopy(init))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "fitGnn2GD must release every per-step checkpoint")
  }

  test("fitEmbeddingGD: gradient flows through the table lookup; loss falls") {
    // codes 0-2 trainable; code 7 is outside card=3 and must be inert
    // (dropped by the lookup join, the dangling-FK convention)
    val data = Seq((0, Array(1.0), 0.0), (0, Array(2.0), 1.0),
      (1, Array(0.5), 1.0), (1, Array(1.5), 1.0),
      (2, Array(3.0), 0.0), (2, Array(0.0), 0.0), (7, Array(9.0), 1.0))
    val df = data.toDF("code", "feat", "y")
    val init = Blueprint.embInit(card = 3, dim = 2, nFeat = 1)
    def deepCopy(p: Blueprint.EmbParams) = Blueprint.EmbParams(
      p.e.map(_.clone()), p.w.clone(), p.u.clone(), p.b)
    // one GD step with tiny lr recovers the gradient: g = (init - stepped)/lr
    val lr = 1e-3
    val stepped = Blueprint.fitEmbeddingGD(df, "code", "feat", "y",
      card = 3, dim = 2, nFeat = 1, steps = 1, lr = lr, init = deepCopy(init))
    val gradE10 = (init.e(1)(0) - stepped.e(1)(0)) / lr
    val gradW1 = (init.w(1) - stepped.w(1)) / lr
    val gradU0 = (init.u(0) - stepped.u(0)) / lr
    val gradB = (init.b - stepped.b) / lr
    val eps = 1e-5
    def lossWith(mut: Blueprint.EmbParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.embeddingLogLoss(df, "code", "feat", "y", p)
    }
    val fdE10 = (lossWith(_.e(1)(0) += eps) - lossWith(_.e(1)(0) -= eps)) / (2 * eps)
    val fdW1 = (lossWith(_.w(1) += eps) - lossWith(_.w(1) -= eps)) / (2 * eps)
    val fdU0 = (lossWith(_.u(0) += eps) - lossWith(_.u(0) -= eps)) / (2 * eps)
    def lossAt(p: Blueprint.EmbParams) =
      Blueprint.embeddingLogLoss(df, "code", "feat", "y", p)
    val fdB = (lossAt(deepCopy(init).copy(b = init.b + eps)) -
      lossAt(deepCopy(init).copy(b = init.b - eps))) / (2 * eps)
    assert(math.abs(gradE10 - fdE10) < 1e-4, s"E[1][0] grad $gradE10 vs fd $fdE10")
    assert(math.abs(gradW1 - fdW1) < 1e-4, s"w grad $gradW1 vs fd $fdW1")
    assert(math.abs(gradU0 - fdU0) < 1e-4, s"u grad $gradU0 vs fd $fdU0")
    assert(math.abs(gradB - fdB) < 1e-4, s"b grad $gradB vs fd $fdB")
    // training lowers the loss vs the initial parameters
    val trained = Blueprint.fitEmbeddingGD(df, "code", "feat", "y",
      card = 3, dim = 2, nFeat = 1, steps = 50, lr = 0.5, init = deepCopy(init))
    assert(Blueprint.embeddingLogLoss(df, "code", "feat", "y", trained) <
      Blueprint.embeddingLogLoss(df, "code", "feat", "y", init))
    // pure CatEmbedder path (nFeat = 0, no feature column) also descends
    val pure = Blueprint.fitEmbeddingGD(df, "code", null, "y",
      card = 3, dim = 2, nFeat = 0, steps = 20, lr = 0.5)
    assert(Blueprint.embeddingLogLoss(df, "code", null, "y", pure) <
      Blueprint.embeddingLogLoss(df, "code", null, "y",
        Blueprint.embInit(3, 2, 0)))
    // shape validation fails fast
    intercept[IllegalArgumentException] {
      Blueprint.fitEmbeddingGD(df, "code", "feat", "y", card = 3, dim = 3,
        nFeat = 1, steps = 1, lr = 0.1, init = init)
    }
  }

  test("columnSelfAttention: matches the hand-computed k×k softmax row") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0)))
      .toDF("t0", "t1", "t2")
    val out = Blueprint.columnSelfAttention(
      Seq(col("t0"), col("t1"), col("t2")), dim = 2)
    val row = df.select(out.flatten.zipWithIndex.map {
      case (c, ix) => c.as(s"o$ix")
    }: _*).collect()(0)
    // the same arithmetic computed by hand (plain softmax, scale 1/√2)
    val x = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0))
    val sc = 1.0 / math.sqrt(2.0)
    def att(a: Int, i: Int): Double = {
      val e = (0 until 3).map(b =>
        math.exp((0 until 2).map(j => x(a)(j) * x(b)(j)).sum * sc))
      (0 until 3).map(b => e(b) / e.sum * x(b)(i)).sum
    }
    for (a <- 0 until 3; i <- 0 until 2)
      assert(math.abs(row.getDouble(a * 2 + i) - att(a, i)) < 1e-12,
        s"token $a component $i")
    // attention weights sum to 1, so each attended vector is a convex
    // combination of the tokens: components stay inside [0, 1] here
    (0 until 6).foreach(ix => assert(row.getDouble(ix) >= 0.0 &&
      row.getDouble(ix) <= 1.0))
    intercept[IllegalArgumentException] {
      Blueprint.columnSelfAttention(Seq.empty, dim = 2)
    }
  }

  test("columnSelfAttention: stable softmax survives ±50-magnitude tokens") {
    // pre-stabilization this overflowed: scores reach 50·50·2/√2 ≈ 3536,
    // exp(3536) = Inf and the softmax went NaN. The max-subtract keeps
    // every exponent ≤ 0 and the output a convex combination of tokens.
    val df = Seq((Array(50.0, -50.0), Array(-50.0, 50.0), Array(25.0, 25.0)))
      .toDF("t0", "t1", "t2")
    val out = Blueprint.columnSelfAttention(
      Seq(col("t0"), col("t1"), col("t2")), dim = 2)
    val row = df.select(out.flatten.zipWithIndex.map {
      case (c, ix) => c.as(s"o$ix")
    }: _*).collect()(0)
    (0 until 6).foreach { ix =>
      val v = row.getDouble(ix)
      assert(!v.isNaN && !v.isInfinite, s"component $ix overflowed: $v")
      assert(v >= -50.0 && v <= 50.0, s"component $ix outside the token hull: $v")
    }
    // at this magnitude the softmax is saturated: token 0 attends ~only
    // itself (its self-score dwarfs the cross scores)
    assert(math.abs(row.getDouble(0) - 50.0) < 1e-9)
    assert(math.abs(row.getDouble(1) + 50.0) < 1e-9)
  }

  test("mhaForwardStaged at heads=1 identity projections reduces to columnSelfAttention token 0") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(0.5, -0.5), Array(0.25, 0.75))).toDF("t0", "t1")
    val eye = Array.tabulate(2, 2)((i, j) => if (i == j) 1.0 else 0.0)
    val p = Blueprint.MhaParams(Array(eye.map(_.clone())),
      Array(eye.map(_.clone())), Array(eye.map(_.clone())),
      eye.map(_.clone()), Array(0.0, 0.0), 0.0)
    val staged = Blueprint.mhaForwardStaged(df, Seq("t0", "t1"), p)
      .select(col("__out0"), col("__out1")).collect()
    val csa = Blueprint.columnSelfAttention(Seq(col("t0"), col("t1")), dim = 2)(0)
    val direct = df.select(csa(0).as("a"), csa(1).as("b")).collect()
    staged.zip(direct).foreach { case (s, d) =>
      assert(math.abs(s.getDouble(0) - d.getDouble(0)) < 1e-12)
      assert(math.abs(s.getDouble(1) - d.getDouble(1)) < 1e-12)
    }
  }

  test("fitMhaGnnGD: per-head score gradients match finite differences; heads=1 reproduces fitAttnGnnGD") {
    val children = Seq(
      (1L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), (1L, Array(2.0, 1.0)),
      (2L, Array(1.0, 1.0)),
      (3L, Array(0.5, 2.0)), (3L, Array(1.5, 0.5)),
      (99L, Array(9.0, 9.0))
    ).toDF("fk", "feat")
    val parents = Seq((1L, 1.0), (2L, 0.0), (3L, 1.0), (4L, 0.0))
      .toDF("pid", "y")
    val init = Blueprint.MhaGnnParams(
      Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(0.05, -0.05),
      Array(Array(0.05, 0.1), Array(-0.1, 0.15)),
      Array(Array(0.25, -0.35), Array(0.2, 0.1)), 0.1)
    def deepCopy(p: Blueprint.MhaGnnParams) = Blueprint.MhaGnnParams(
      p.w1.map(_.clone()), p.b1.clone(), p.u.map(_.clone()),
      p.w2.map(_.clone()), p.b2)
    val lr = 1e-3
    val stepped = Blueprint.fitMhaGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, heads = 2, steps = 1,
      lr = lr, init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.MhaGnnParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.mhaGnnLogLoss(children, Seq("fk"), "feat",
        parents, Seq("pid"), "y", p)
    }
    def check(label: String, grad: Double, plus: Blueprint.MhaGnnParams => Unit,
        minus: Blueprint.MhaGnnParams => Unit): Unit = {
      val fd = (lossWith(plus) - lossWith(minus)) / (2 * eps)
      assert(math.abs(grad - fd) < 1e-4, s"$label grad $grad vs fd $fd")
    }
    // EACH head's score vector and readout slice — per-head paths are
    // independent, so a head-index slip hides unless both are checked
    for (g <- 0 until 2; i <- 0 until 2) {
      check(s"u($g)($i)", (init.u(g)(i) - stepped.u(g)(i)) / lr,
        _.u(g)(i) += eps, _.u(g)(i) -= eps)
      check(s"w2($g)($i)", (init.w2(g)(i) - stepped.w2(g)(i)) / lr,
        _.w2(g)(i) += eps, _.w2(g)(i) -= eps)
    }
    // the shared message net accumulates over both heads
    check("w1(0)(0)", (init.w1(0)(0) - stepped.w1(0)(0)) / lr,
      _.w1(0)(0) += eps, _.w1(0)(0) -= eps)
    check("b1(1)", (init.b1(1) - stepped.b1(1)) / lr,
      _.b1(1) += eps, _.b1(1) -= eps)
    // heads=1 is exactly fitAttnGnnGD (same data, same init, same steps)
    val single = Blueprint.MhaGnnParams(
      Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(0.05, -0.05),
      Array(Array(0.05, 0.1)), Array(Array(0.25, -0.35)), 0.1)
    val attnInit = Blueprint.AttnGnnParams(
      Array(Array(0.3, -0.2), Array(-0.1, 0.4)), Array(0.05, -0.05),
      Array(0.05, 0.1), Array(0.25, -0.35), 0.1)
    val viaMha = Blueprint.fitMhaGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, heads = 1, steps = 2,
      lr = 0.1, init = single)
    val viaAttn = Blueprint.fitAttnGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, steps = 2,
      lr = 0.1, init = attnInit)
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(viaMha.w1(i)(j) - viaAttn.w1(i)(j)) < 1e-12)
    (0 until 2).foreach { i =>
      assert(math.abs(viaMha.u(0)(i) - viaAttn.u(i)) < 1e-12)
      assert(math.abs(viaMha.w2(0)(i) - viaAttn.w2(i)) < 1e-12)
    }
    assert(math.abs(viaMha.b2 - viaAttn.b2) < 1e-12)
    // training lowers the loss end to end
    val trained = Blueprint.fitMhaGnnGD(children, Seq("fk"), "feat",
      parents, Seq("pid"), "y", dim = 2, hidden = 2, heads = 2, steps = 60,
      lr = 0.5, init = deepCopy(init))
    assert(Blueprint.mhaGnnLogLoss(children, Seq("fk"), "feat",
        parents, Seq("pid"), "y", trained) <
      Blueprint.mhaGnnLogLoss(children, Seq("fk"), "feat",
        parents, Seq("pid"), "y", init))
  }

  test("fitTransformerMhaGD: end-to-end gradient through table, embedders, Q/K/V/O and head matches finite differences") {
    val data = Seq(
      (0, 0.2, 0), (0, 0.8, 1), (1, 0.5, 0), (1, 0.1, 1),
      (2, 0.9, 0), (2, 0.3, 1), (0, 0.6, 0), (7, 0.5, 1)) // code 7 dangles
    val df = data.toDF("code", "x1", "y")
    val init = Blueprint.transformerMhaInit(card = 3, dim = 2, nNum = 1,
      nClass = 2, heads = 2)
    def deepCopy(p: Blueprint.TransformerMhaParams) =
      Blueprint.TransformerMhaParams(p.e.map(_.clone()), p.a.map(_.clone()),
        p.c.map(_.clone()), p.wq.map(_.map(_.clone())),
        p.wk.map(_.map(_.clone())), p.wv.map(_.map(_.clone())),
        p.wo.map(_.clone()), p.wOut.map(_.clone()), p.bOut.clone())
    val lr = 1e-3
    val stepped = Blueprint.fitTransformerMhaGD(df, "code", Seq("x1"), "y",
      card = 3, dim = 2, nClass = 2, heads = 2, steps = 1, lr = lr,
      init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.TransformerMhaParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.transformerMhaLogLoss(df, "code", Seq("x1"), "y", p)
    }
    def check(label: String, grad: Double,
        plus: Blueprint.TransformerMhaParams => Unit,
        minus: Blueprint.TransformerMhaParams => Unit): Unit = {
      val fd = (lossWith(plus) - lossWith(minus)) / (2 * eps)
      assert(math.abs(grad - fd) < 1e-4, s"$label grad $grad vs fd $fd")
    }
    // the embedding table rides query+key+value paths through the learned
    // projections — the hardest composite gradient in the engine
    for (cd <- 0 until 3; j <- 0 until 2)
      check(s"e($cd)($j)", (init.e(cd)(j) - stepped.e(cd)(j)) / lr,
        _.e(cd)(j) += eps, _.e(cd)(j) -= eps)
    // numeric embedder (key+value paths), both heads' projections, out
    // projection, head
    check("a(0)(1)", (init.a(0)(1) - stepped.a(0)(1)) / lr,
      _.a(0)(1) += eps, _.a(0)(1) -= eps)
    check("c(0)(0)", (init.c(0)(0) - stepped.c(0)(0)) / lr,
      _.c(0)(0) += eps, _.c(0)(0) -= eps)
    for (g <- 0 until 2; c2 <- 0 until 2) {
      check(s"wq($g)(0)($c2)", (init.wq(g)(0)(c2) - stepped.wq(g)(0)(c2)) / lr,
        _.wq(g)(0)(c2) += eps, _.wq(g)(0)(c2) -= eps)
      check(s"wk($g)(0)($c2)", (init.wk(g)(0)(c2) - stepped.wk(g)(0)(c2)) / lr,
        _.wk(g)(0)(c2) += eps, _.wk(g)(0)(c2) -= eps)
      check(s"wv($g)(0)($c2)", (init.wv(g)(0)(c2) - stepped.wv(g)(0)(c2)) / lr,
        _.wv(g)(0)(c2) += eps, _.wv(g)(0)(c2) -= eps)
    }
    for (i <- 0 until 2; j <- 0 until 2)
      check(s"wo($i)($j)", (init.wo(i)(j) - stepped.wo(i)(j)) / lr,
        _.wo(i)(j) += eps, _.wo(i)(j) -= eps)
    check("wOut(1)(0)", (init.wOut(1)(0) - stepped.wOut(1)(0)) / lr,
      _.wOut(1)(0) += eps, _.wOut(1)(0) -= eps)
    check("bOut(0)", (init.bOut(0) - stepped.bOut(0)) / lr,
      _.bOut(0) += eps, _.bOut(0) -= eps)
    // training lowers the loss; the dangling code contributed nothing
    val trained = Blueprint.fitTransformerMhaGD(df, "code", Seq("x1"), "y",
      card = 3, dim = 2, nClass = 2, heads = 2, steps = 40, lr = 0.5,
      init = deepCopy(init))
    assert(Blueprint.transformerMhaLogLoss(df, "code", Seq("x1"), "y", trained) <
      Blueprint.transformerMhaLogLoss(df, "code", Seq("x1"), "y", init))
    val without = Blueprint.fitTransformerMhaGD(
      df.filter(col("code") < 3), "code", Seq("x1"), "y",
      card = 3, dim = 2, nClass = 2, heads = 2, steps = 1, lr = lr,
      init = deepCopy(init))
    for (cd <- 0 until 3; j <- 0 until 2)
      assert(math.abs(stepped.e(cd)(j) - without.e(cd)(j)) < 1e-15,
        "the dangling code must drop out of the lookup join entirely")
  }

  test("dbTransformerForward: layer 2 depends on layer 1 cross-table state; childless and dangling rows are inert") {
    val wOut = Array(Array(1.0, -1.0), Array(-0.5, 0.5))
    val bOut = Array(0.05, -0.05)
    def run(child: org.apache.spark.sql.DataFrame,
        parent: org.apache.spark.sql.DataFrame, layers: Int) =
      Blueprint.dbTransformerForward(child, "fk", Seq("t0", "t1"),
          parent, "pid", Seq("t0", "t1"), dim = 2, layers = layers,
          wOut = wOut, bOut = bOut)
        .orderBy("__key").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // two parents with IDENTICAL tokens; only their children differ —
    // any difference in output can only arrive through the cross pass
    val parents = Seq(
      (1L, Array(0.3, -0.2), Array(0.1, 0.4)),
      (2L, Array(0.3, -0.2), Array(0.1, 0.4)),
      (3L, Array(0.3, -0.2), Array(0.1, 0.4))) // childless
      .toDF("pid", "t0", "t1")
    val children = Seq(
      (1L, Array(1.0, 0.0), Array(0.2, 0.2)),
      (1L, Array(0.0, 1.0), Array(0.1, -0.1)),
      (2L, Array(-0.8, 0.4), Array(0.5, 0.0)),
      (99L, Array(9.0, 9.0), Array(9.0, 9.0))) // dangling FK
      .toDF("fk", "t0", "t1")
    val two = run(children, parents, layers = 2)
    assert(two.keySet == Set(1L, 2L, 3L), "every parent emits one row")
    assert(math.abs(two(1L) - two(2L)) > 1e-6,
      "identical parent tokens, different children => different output (cross-table state flows)")
    // layer 2 re-attends the layer-1 cross-table state: one layer differs
    val one = run(children, parents, layers = 1)
    assert(math.abs(one(1L) - two(1L)) > 1e-6, "stacking changes the target state")
    // the childless parent must agree between a run WITH and WITHOUT other
    // children present only through its own (empty) neighborhood: its
    // 2-layer output equals that of a clone graph with no children at all
    val noChildren = Seq((3L, Array(0.0, 0.0), Array(0.0, 0.0)))
      .toDF("fk", "t0", "t1").filter(col("fk") < 0)
    val isolated = run(noChildren, parents.filter(col("pid") === 3L), layers = 2)
    assert(math.abs(two(3L) - isolated(3L)) < 1e-12,
      "childless parent aggregates a zero message regardless of the rest of the graph")
    // probabilities form a distribution
    assert(two.values.forall(p => p > 0 && p < 1))
  }

  test("fitMhaGD: every projection's gradient matches finite differences, per head; loss falls") {
    val data = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(0.5, 0.5), Array(1.0, 0.0), 1.0),
      (Array(0.2, 0.8), Array(0.3, 0.1), 1.0),
      (Array(0.9, 0.1), Array(0.4, 0.6), 0.0),
      (Array(0.1, 0.7), Array(0.8, 0.2), 1.0))
    val df = data.toDF("t0", "t1", "y")
    val toks = Seq("t0", "t1")
    val init = Blueprint.mhaInit(dim = 2, heads = 2)
    def deepCopy(p: Blueprint.MhaParams) = Blueprint.MhaParams(
      p.wq.map(_.map(_.clone())), p.wk.map(_.map(_.clone())),
      p.wv.map(_.map(_.clone())), p.wo.map(_.clone()), p.w.clone(), p.b)
    val lr = 1e-3
    val stepped = Blueprint.fitMhaGD(df, toks, "y", dim = 2, heads = 2,
      steps = 1, lr = lr, init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.MhaParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.mhaLogLoss(df, toks, "y", p)
    }
    def check(label: String, grad: Double, plus: Blueprint.MhaParams => Unit,
        minus: Blueprint.MhaParams => Unit): Unit = {
      val fd = (lossWith(plus) - lossWith(minus)) / (2 * eps)
      assert(math.abs(grad - fd) < 1e-4, s"$label grad $grad vs fd $fd")
    }
    // every projection matrix, BOTH heads (the per-head paths are
    // independent — a sign slip in one head's slice hides in the other)
    for (g <- 0 until 2; c <- 0 until 2) {
      check(s"wq($g)(0)($c)", (init.wq(g)(0)(c) - stepped.wq(g)(0)(c)) / lr,
        _.wq(g)(0)(c) += eps, _.wq(g)(0)(c) -= eps)
      check(s"wk($g)(0)($c)", (init.wk(g)(0)(c) - stepped.wk(g)(0)(c)) / lr,
        _.wk(g)(0)(c) += eps, _.wk(g)(0)(c) -= eps)
      check(s"wv($g)(0)($c)", (init.wv(g)(0)(c) - stepped.wv(g)(0)(c)) / lr,
        _.wv(g)(0)(c) += eps, _.wv(g)(0)(c) -= eps)
    }
    for (i <- 0 until 2; j <- 0 until 2)
      check(s"wo($i)($j)", (init.wo(i)(j) - stepped.wo(i)(j)) / lr,
        _.wo(i)(j) += eps, _.wo(i)(j) -= eps)
    check("w(0)", (init.w(0) - stepped.w(0)) / lr, _.w(0) += eps, _.w(0) -= eps)
    check("w(1)", (init.w(1) - stepped.w(1)) / lr, _.w(1) += eps, _.w(1) -= eps)
    val gradB = (init.b - stepped.b) / lr
    val fdBias = (Blueprint.mhaLogLoss(df, toks, "y",
        deepCopy(init).copy(b = init.b + eps)) -
      Blueprint.mhaLogLoss(df, toks, "y",
        deepCopy(init).copy(b = init.b - eps))) / (2 * eps)
    assert(math.abs(gradB - fdBias) < 1e-4, s"b grad $gradB vs fd $fdBias")
    // training lowers the loss end to end
    val trained = Blueprint.fitMhaGD(df, toks, "y", dim = 2, heads = 2,
      steps = 60, lr = 0.5, init = deepCopy(init))
    assert(Blueprint.mhaLogLoss(df, toks, "y", trained) <
      Blueprint.mhaLogLoss(df, toks, "y", init))
    // dim must split into heads
    intercept[IllegalArgumentException] {
      Blueprint.fitMhaGD(df, toks, "y", dim = 3, heads = 2, steps = 1, lr = 0.1)
    }
  }

  test("fitCrossAttnGD: gradient flows through the row-local softmax; loss falls") {
    val data = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(0.5, 0.5), Array(1.0, 0.0), 1.0),
      (Array(0.2, 0.8), Array(0.3, 0.1), 1.0),
      (Array(0.9, 0.1), Array(0.4, 0.6), 0.0))
    val df = data.toDF("t1", "t2", "y")
    val toks = Seq("t1", "t2")
    val init = Blueprint.crossAttnInit(2)
    def deepCopy(p: Blueprint.CrossAttnParams) =
      Blueprint.CrossAttnParams(p.q.clone(), p.w.clone(), p.b)
    val lr = 1e-3
    val stepped = Blueprint.fitCrossAttnGD(df, toks, "y", dim = 2,
      steps = 1, lr = lr, init = deepCopy(init))
    val gradQ0 = (init.q(0) - stepped.q(0)) / lr
    val gradW1 = (init.w(1) - stepped.w(1)) / lr
    val gradB = (init.b - stepped.b) / lr
    val eps = 1e-5
    def lossWith(mut: Blueprint.CrossAttnParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.crossAttnLogLoss(df, toks, "y", p)
    }
    val fdQ0 = (lossWith(_.q(0) += eps) - lossWith(_.q(0) -= eps)) / (2 * eps)
    val fdW1 = (lossWith(_.w(1) += eps) - lossWith(_.w(1) -= eps)) / (2 * eps)
    def lossAt(p: Blueprint.CrossAttnParams) =
      Blueprint.crossAttnLogLoss(df, toks, "y", p)
    val fdB = (lossAt(deepCopy(init).copy(b = init.b + eps)) -
      lossAt(deepCopy(init).copy(b = init.b - eps))) / (2 * eps)
    // the q gradient must be genuinely nonzero — a flat softmax or a
    // dropped Jacobian term would zero it silently
    assert(math.abs(fdQ0) > 1e-4, s"test fixture gives trivial q gradient $fdQ0")
    assert(math.abs(gradQ0 - fdQ0) < 1e-4, s"q grad $gradQ0 vs fd $fdQ0")
    assert(math.abs(gradW1 - fdW1) < 1e-4, s"w grad $gradW1 vs fd $fdW1")
    assert(math.abs(gradB - fdB) < 1e-4, s"b grad $gradB vs fd $fdB")
    val trained = Blueprint.fitCrossAttnGD(df, toks, "y", dim = 2,
      steps = 60, lr = 0.5, init = deepCopy(init))
    assert(Blueprint.crossAttnLogLoss(df, toks, "y", trained) <
      Blueprint.crossAttnLogLoss(df, toks, "y", init))
    intercept[IllegalArgumentException] {
      Blueprint.fitCrossAttnGD(df, toks, "y", dim = 3, steps = 1, lr = 0.1,
        init = init)
    }
  }

  test("fitTransformerGD: end-to-end gradient (table, embedders, head) matches finite differences; loss falls") {
    // codes 0-2; two numeric columns; 2 classes; code 9 dangles (inert)
    val data = Seq((0, 0.2, 0.7, 0), (0, 0.9, 0.1, 1), (1, 0.4, 0.4, 1),
      (1, 0.8, 0.6, 0), (2, 0.1, 0.9, 1), (2, 0.5, 0.3, 0), (9, 9.0, 9.0, 1))
    val df = data.toDF("code", "x1", "x2", "y")
    val nums = Seq("x1", "x2")
    val init = Blueprint.transformerInit(card = 3, dim = 2, nNum = 2, nClass = 2)
    def deepCopy(p: Blueprint.TransformerParams) = Blueprint.TransformerParams(
      p.e.map(_.clone()), p.a.map(_.clone()), p.c.map(_.clone()),
      p.wOut.map(_.clone()), p.bOut.clone())
    val lr = 1e-3
    val stepped = Blueprint.fitTransformerGD(df, "code", nums, "y",
      card = 3, dim = 2, nClass = 2, steps = 1, lr = lr, init = deepCopy(init))
    val eps = 1e-5
    def lossWith(mut: Blueprint.TransformerParams => Unit): Double = {
      val p = deepCopy(init); mut(p)
      Blueprint.transformerLogLoss(df, "code", nums, "y", p)
    }
    // the embedding gradient exercises ALL THREE attention paths at once
    // (token 0 is every score's query, its own key, and a value) — the
    // single strongest check on the Jacobian derivation
    val checks: Seq[(String, Double, Blueprint.TransformerParams => Unit,
        Blueprint.TransformerParams => Unit)] = Seq(
      ("e(1)(0)", (init.e(1)(0) - stepped.e(1)(0)) / lr,
        p => p.e(1)(0) += eps, p => p.e(1)(0) -= eps),
      ("e(0)(1)", (init.e(0)(1) - stepped.e(0)(1)) / lr,
        p => p.e(0)(1) += eps, p => p.e(0)(1) -= eps),
      ("a(0)(1)", (init.a(0)(1) - stepped.a(0)(1)) / lr,
        p => p.a(0)(1) += eps, p => p.a(0)(1) -= eps),
      ("c(1)(0)", (init.c(1)(0) - stepped.c(1)(0)) / lr,
        p => p.c(1)(0) += eps, p => p.c(1)(0) -= eps),
      ("wOut(1)(0)", (init.wOut(1)(0) - stepped.wOut(1)(0)) / lr,
        p => p.wOut(1)(0) += eps, p => p.wOut(1)(0) -= eps),
      ("bOut(0)", (init.bOut(0) - stepped.bOut(0)) / lr,
        p => p.bOut(0) += eps, p => p.bOut(0) -= eps))
    checks.foreach { case (name, analytic, up, down) =>
      val fd = (lossWith(up) - lossWith(down)) / (2 * eps)
      assert(math.abs(fd) > 1e-5, s"$name: fixture gives trivial gradient $fd")
      assert(math.abs(analytic - fd) < 1e-4, s"$name grad $analytic vs fd $fd")
    }
    // training lowers the loss
    val trained = Blueprint.fitTransformerGD(df, "code", nums, "y",
      card = 3, dim = 2, nClass = 2, steps = 50, lr = 0.5, init = deepCopy(init))
    assert(Blueprint.transformerLogLoss(df, "code", nums, "y", trained) <
      Blueprint.transformerLogLoss(df, "code", nums, "y", init))
    intercept[IllegalArgumentException] {
      Blueprint.fitTransformerGD(df, "code", nums, "y", card = 2, dim = 2,
        nClass = 2, steps = 1, lr = 0.1, init = init)
    }
  }

  test("metrics: accuracy and regression suite") {
    val df = Seq((1, 1, 2.0, 2.5), (0, 1, 4.0, 3.5), (1, 1, 6.0, 6.0))
      .toDF("pred", "y", "yhat", "ytrue")
    assert(Metrics.accuracy(df, "pred", "y").collect()(0).getDouble(0) == 2.0 / 3.0)
    val r = Metrics.regression(df, "yhat", "ytrue").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-12)                    // mae
    assert(math.abs(r.getDouble(1) - (0.25 + 0.25 + 0.0) / 3.0) < 1e-12)   // mse
  }
}
