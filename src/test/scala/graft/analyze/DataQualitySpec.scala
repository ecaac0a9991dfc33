package graft.analyze

import graft.SparkSpec
import graft.analyze.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), Some("a"), Some("ok-1")),
    (Some(1L), Some(20.0), Some("b"), Some("ok-2")),    // dup id
    (None, Some(999.0), Some("z"), Some("bad")),        // null id, out of range+set, no match
    (Some(3L), None, None, None))                       // nulls skip value checks
    .toDF("id", "v", "cat", "tag")

  private def report(checks: Seq[Check]): Map[String, Long] =
    DataQuality.run(df, checks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("row-local checks count violations; NULLs only fail not_null") {
    val out = report(Seq(
      NotNull("id"), Unique(Seq("id")), InRange("v", 0, 100),
      InSet("cat", Seq("a", "b")), Matches("tag", "^ok-")))
    assert(out("not_null(id)") == 1)
    assert(out("unique(id)") == 1)      // two rows share id 1
    assert(out("in_range(v,0.0,100.0)") == 1)
    assert(out("in_set(cat)") == 1)
    assert(out("matches(tag)") == 1)
  }

  test("unique: NULL-containing keys never violate (SQL UNIQUE semantics)") {
    // two NULL ids + a duplicated id 1: only the id=1 duplicate violates,
    // and the count matches the count(rows with key) - count(DISTINCT key)
    // device any SQL oracle writes
    val d = Seq(Some(1L), Some(1L), None, None, Some(3L)).toDF("id")
    val out = DataQuality.run(d, Seq(Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("unique(id)") == 1L)
  }

  test("clean data reports all zeros") {
    val out = report(Seq(NotNull("v"), InRange("v", 0, 1000)))
      .filterNot(_._1.startsWith("not_null"))
    assert(out.values.forall(_ == 0L) || report(Seq(InRange("v", 0, 1000)))
      .values.forall(_ == 0L))
  }

  test("ref integrity counts orphans; all-ref-only check lists still work") {
    val parent = Seq(1L).toDF("pid")
    val out = report(Seq(RefIntegrity("id", parent, "pid")))
    assert(out == Map("ref_integrity(id)" -> 1L)) // id=3 orphaned; NULL id skipped
  }

  test("quarantine routes violating rows with name-sorted reasons") {
    val checks = Seq[Check](NotNull("id"), InRange("v", 0, 100),
      InSet("cat", Seq("a", "b")), Matches("tag", "^ok-"))
    val (clean, bad) = DataQuality.quarantine(df, checks)
    // clean + bad partition the input; clean carries no extra column
    assert(clean.count() + bad.count() == df.count())
    assert(!clean.columns.contains("violated"))
    val reasons = bad.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(4)).toMap
    // the all-bad row fails three checks, reasons sorted by check name and
    // ';'-joined — check names themselves contain commas, so ';' keeps the
    // evidence string unambiguously splittable
    assert(reasons(-1L) ==
      "in_range(v,0.0,100.0);in_set(cat);matches(tag);not_null(id)")
    assert(!reasons.contains(3L), "NULL value columns don't fail value checks")
    intercept[IllegalArgumentException] {
      DataQuality.quarantine(df, Seq(Unique(Seq("id"))))
    }
  }

  test("kAnonymity reports violating groups, at-risk rows and min size") {
    // groups: (a,x)=3 rows, (a,y)=1, (b,x)=2 — k=3 flags the last two
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("quasi1", "quasi2")
    val r = DataQuality.kAnonymity(rows, Seq("quasi1", "quasi2"), k = 3)
      .collect()(0)
    assert(r.getLong(0) == 3L, "n_groups")
    assert(r.getLong(1) == 2L, "n_violating_groups")
    assert(r.getLong(2) == 3L, "n_rows_at_risk = 1 + 2")
    assert(r.getLong(3) == 1L, "min_group_size")
    // fully anonymous at k=2 when every group has >= 2 rows
    val ok = DataQuality.kAnonymity(
      rows.filter(!($"quasi1" === "a" && $"quasi2" === "y")),
      Seq("quasi1", "quasi2"), k = 2).collect()(0)
    assert(ok.getLong(1) == 0L && ok.getLong(2) == 0L)
    intercept[IllegalArgumentException] {
      DataQuality.kAnonymity(rows, Seq(), k = 3)
    }
    intercept[IllegalArgumentException] {
      DataQuality.kAnonymity(rows, Seq("quasi1"), k = 1)
    }
  }

  test("lDiversity flags homogeneous-sensitive groups k-anonymity misses") {
    // group (a): 4 rows but only 1 sensitive value — k-anonymous at k=3,
    // yet fully leaking; group (b): 3 rows, 3 distinct values — fine
    val rows = Seq(("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "flu"),
      ("b", "flu"), ("b", "cold"), ("b", "ok")).toDF("zip", "diagnosis")
    assert(DataQuality.kAnonymity(rows, Seq("zip"), k = 3)
      .collect()(0).getLong(1) == 0L, "k-anonymity sees nothing wrong")
    val r = DataQuality.lDiversity(rows, Seq("zip"), "diagnosis", l = 2)
      .collect()(0)
    assert(r.getLong(0) == 2L, "n_groups")
    assert(r.getLong(1) == 1L, "the homogeneous group is flagged")
    assert(r.getLong(2) == 4L, "its 4 rows are at risk")
    assert(r.getLong(3) == 1L, "min_diversity")
    intercept[IllegalArgumentException] {
      DataQuality.lDiversity(rows, Seq("zip"), "zip", l = 2)
    }
    intercept[IllegalArgumentException] {
      DataQuality.lDiversity(rows, Seq("zip"), "diagnosis", l = 1)
    }
  }

  test("fkAudit counts dangling children per declared FK, NULL keys skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fkaudit").toString
    Seq((1L, "r1"), (2L, "r2")).toDF("pid", "name")
      .write.parquet(s"$dir/parent.parquet")
    // children: two valid, one dangling (pid=9), one NULL (not checked)
    Seq((10L, Some(1L)), (11L, Some(2L)), (12L, Some(9L)), (13L, None))
      .toDF("cid", "pid").write.parquet(s"$dir/child.parquet")
    val reg = graft.catalog.ConstraintRegistry(
      primaryKeys = Map("parent" -> Seq("pid"), "child" -> Seq("cid")),
      foreignKeys = Map("child" ->
        Seq(graft.schema.ForeignKeyDef(Seq("pid"), "parent", Seq("pid")))))
    val cat = new graft.catalog.ParquetCatalog(spark, dir, reg)
    val r = DataQuality.fkAudit(cat).collect()(0)
    assert((r.getString(0), r.getString(1), r.getString(2)) ==
      (("child", "pid", "parent")))
    assert(r.getLong(3) == 3L, "NULL FK rows are not checked")
    assert(r.getLong(4) == 1L, "exactly the planted dangling row")
  }

  test("observed metrics agree with run() and cost no extra scan semantics") {
    val checks = Seq[Check](NotNull("id"), InRange("v", 0, 100),
      InSet("cat", Seq("a", "b")), Matches("tag", "^ok-"))
    val (inst, obs) = DataQuality.observed(df, checks)
    inst.count() // the existing action the metrics ride on
    val viaObserve = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(viaObserve == report(checks))
    // shuffle-needing checks are rejected, not silently mis-measured
    intercept[IllegalArgumentException] {
      DataQuality.observed(df, Seq(Unique(Seq("id"))))
    }
    intercept[IllegalArgumentException] {
      DataQuality.observed(df, Seq(RefIntegrity("id", Seq(1L).toDF("pid"), "pid")))
    }
  }
}
