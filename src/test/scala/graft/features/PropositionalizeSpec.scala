package graft.features

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.{CategoricalColumnDef, ForeignKeyDef, NumericColumnDef,
  OmitColumnDef, Schema, TableSchema}

class PropositionalizeSpec extends SparkSpec {
  import spark.implicits._

  test("single-key battery: count/sum/mean/min/max + mode, childless parent kept") {
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val child = Seq(
      (1L, 10.0, "a"), (1L, 20.0, "b"), (1L, 30.0, "a"),
      (2L, 5.0, "c"),
      (99L, 1.0, "x") // dangling FK: must reach no parent
    ).toDF("fk", "v", "cat")
    val out = Propositionalize.features(parent, child,
        ForeignKeyDef(Seq("fk"), "parent", Seq("pid")),
        numericCols = Seq("v"), catCols = Seq("cat"), prefix = "ch")
      .orderBy("pid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val r1 = out(0)
    assert(r1.getLong(1) == 3L) // ch_n
    assert(r1.getDouble(r1.fieldIndex("ch_v_sum")) == 60.0)
    assert(r1.getDouble(r1.fieldIndex("ch_v_mean")) == 20.0)
    assert(r1.getDouble(r1.fieldIndex("ch_v_min")) == 10.0)
    assert(r1.getDouble(r1.fieldIndex("ch_v_max")) == 30.0)
    assert(r1.getString(r1.fieldIndex("ch_cat_mode")) == "a") // 2 vs 1
    // childless parent: count 0, stats NULL — distinguishable from zeros
    val r3 = out(2)
    assert(r3.getLong(1) == 0L)
    assert(r3.isNullAt(r3.fieldIndex("ch_v_sum")))
    assert(r3.isNullAt(r3.fieldIndex("ch_cat_mode")))
  }

  test("mode tie breaks toward the smaller category value (total order)") {
    val parent = Seq(1L).toDF("pid")
    val child = Seq((1L, "b"), (1L, "a")).toDF("fk", "cat")
    val out = Propositionalize.features(parent, child,
      ForeignKeyDef(Seq("fk"), "parent", Seq("pid")),
      numericCols = Nil, catCols = Seq("cat"), prefix = "ch").collect()(0)
    assert(out.getString(out.fieldIndex("ch_cat_mode")) == "a")
  }

  test("composite FK: grouping and join run on the full key tuple") {
    val parent = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("k1", "k2")
    val child = Seq(
      (1L, "x", 10.0), (1L, "x", 30.0),
      (1L, "y", 7.0),
      (2L, "z", 99.0) // (2,z) matches no parent
    ).toDF("c1", "c2", "v")
    val out = Propositionalize.features(parent, child,
        ForeignKeyDef(Seq("c1", "c2"), "parent", Seq("k1", "k2")),
        numericCols = Seq("v"), prefix = "ch")
      .orderBy("k1", "k2").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1),
      r.getLong(r.fieldIndex("ch_n")))).toSeq ==
      Seq((1L, "x", 2L), (1L, "y", 1L), (2L, "x", 0L)))
    assert(out(0).getDouble(out(0).fieldIndex("ch_v_sum")) == 40.0)
    assert(out(1).getDouble(out(1).fieldIndex("ch_v_mean")) == 7.0)
  }

  test("NULL categories never become the mode; key columns are rejected as features") {
    val parent = Seq(1L).toDF("pid")
    val child = Seq((1L, null), (1L, null), (1L, "a"))
      .toDF("fk", "cat")
    val out = Propositionalize.features(parent, child,
      ForeignKeyDef(Seq("fk"), "parent", Seq("pid")),
      numericCols = Nil, catCols = Seq("cat"), prefix = "ch").collect()(0)
    assert(out.getString(out.fieldIndex("ch_cat_mode")) == "a")
    intercept[IllegalArgumentException] {
      Propositionalize.features(parent, child,
        ForeignKeyDef(Seq("fk"), "parent", Seq("pid")),
        numericCols = Seq("fk"), prefix = "ch")
    }
  }

  test("two-hop composition synthesizes aggregate-of-aggregate features") {
    // grandparent 1 has two children; child 10 has 3 grandchildren, child
    // 11 has 1 — "mean over children of the grandchild count" must be 2.0
    val gp = Seq(1L, 2L).toDF("gid")
    val mid = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("mid", "gfk")
    val leaf = Seq((10L, 1.0), (10L, 2.0), (10L, 4.0), (11L, 8.0))
      .toDF("mfk", "v")
    val midFeat = Propositionalize.features(mid, leaf,
      ForeignKeyDef(Seq("mfk"), "mid", Seq("mid")),
      numericCols = Seq("v"), prefix = "lf")
    val out = Propositionalize.features(gp, midFeat,
        ForeignKeyDef(Seq("gfk"), "gp", Seq("gid")),
        numericCols = Seq("lf_n", "lf_v_sum"), prefix = "m")
      .orderBy("gid").collect()
    val r1 = out(0)
    assert(r1.getLong(r1.fieldIndex("m_n")) == 2L)
    assert(r1.getDouble(r1.fieldIndex("m_lf_n_mean")) == 2.0)   // (3+1)/2
    assert(r1.getDouble(r1.fieldIndex("m_lf_n_sum")) == 4.0)    // grandchild total
    assert(r1.getDouble(r1.fieldIndex("m_lf_v_sum_max")) == 8.0) // max per-child sum
    // grandparent 2's child 12 is leafless: its lf_n=0 flows into hop 2
    val r2 = out(1)
    assert(r2.getLong(r2.fieldIndex("m_n")) == 1L)
    assert(r2.getDouble(r2.fieldIndex("m_lf_n_sum")) == 0.0)
    assert(r2.isNullAt(r2.fieldIndex("m_lf_v_sum_max")))
  }

  test("categorical modes are batched: 3 columns, one melt pass, exchange count flat") {
    val parent = Seq(1L, 2L).toDF("pid")
    val child = Seq(
      (1L, "a", "x", "m"), (1L, "b", "x", "n"), (1L, "a", "y", "n"),
      (2L, "c", "z", "m")
    ).toDF("fk", "c1", "c2", "c3")
    val fk = ForeignKeyDef(Seq("fk"), "parent", Seq("pid"))
    val out = Propositionalize.features(parent, child, fk,
        numericCols = Nil, catCols = Seq("c1", "c2", "c3"), prefix = "ch")
      .orderBy("pid").collect()
    val r1 = out(0)
    assert(r1.getString(r1.fieldIndex("ch_c1_mode")) == "a") // 2 vs 1
    assert(r1.getString(r1.fieldIndex("ch_c2_mode")) == "x")
    assert(r1.getString(r1.fieldIndex("ch_c3_mode")) == "n")
    val r2 = out(1)
    assert(r2.getString(r2.fieldIndex("ch_c1_mode")) == "c")
    // same-typed columns share ONE melt pass: the physical exchange count
    // must not grow with the column count (the 100 TB wide-child case)
    def exchanges(catCols: Seq[String]): Int =
      Propositionalize.features(parent, child, fk, Nil, catCols, "ch")
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
    assert(exchanges(Seq("c1", "c2", "c3")) == exchanges(Seq("c1", "c2")),
      "3 same-typed categorical columns must not add exchanges over 2 " +
        "(one melt pass regardless of width; a lone column keeps the " +
        "cheaper direct path)")
  }

  test("mixed-type categoricals keep native types and native tie-break order") {
    val parent = Seq(1L).toDF("pid")
    // numeric tie 2-vs-10 with equal counts: native order picks 2
    // (a string-cast melt would pick "10" — "10" < "2" lexically)
    val child = Seq((1L, "b", 10), (1L, "a", 2), (1L, "a", 10), (1L, "b", 2))
      .toDF("fk", "s", "i")
    val out = Propositionalize.features(parent, child,
      ForeignKeyDef(Seq("fk"), "parent", Seq("pid")),
      numericCols = Nil, catCols = Seq("s", "i"), prefix = "ch").collect()(0)
    assert(out.getString(out.fieldIndex("ch_s_mode")) == "a")
    assert(out.getInt(out.fieldIndex("ch_i_mode")) == 2)
  }

  test("featuresFor picks columns from the semantic schema, not physical types") {
    // `code` is physically numeric but semantically categorical; `uid` is
    // omit — only `v` gets the numeric battery, only `code` gets a mode
    val schema = Schema(ListMap(
      "parent" -> TableSchema(ListMap("pid" -> OmitColumnDef(key = true))),
      "child" -> TableSchema(ListMap(
        "cid" -> OmitColumnDef(key = true),
        "fk" -> OmitColumnDef(),
        "uid" -> OmitColumnDef(),
        "v" -> NumericColumnDef(),
        "code" -> CategoricalColumnDef(card = 3)),
        Seq(ForeignKeyDef(Seq("fk"), "parent", Seq("pid"))))))
    val parent = Seq(1L).toDF("pid")
    val child = Seq((10L, 1L, 777L, 2.5, 7), (11L, 1L, 778L, 3.5, 7))
      .toDF("cid", "fk", "uid", "v", "code")
    val out = Propositionalize.featuresFor(schema, "child", parent, child,
      schema.tables("child").foreignKeys.head)
    val featCols = out.columns.filter(_.startsWith("child_")).toSet
    assert(featCols == Set("child_n", "child_v_sum", "child_v_mean",
      "child_v_min", "child_v_max", "child_code_mode"))
    val r = out.collect()(0)
    assert(r.getDouble(r.fieldIndex("child_v_sum")) == 6.0)
    assert(r.getInt(r.fieldIndex("child_code_mode")) == 7)
  }
}
