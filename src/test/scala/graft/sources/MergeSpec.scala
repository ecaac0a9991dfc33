package graft.sources

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert without version: updates replace, new keys insert, rest survive") {
    val cur = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val upd = Seq((2L, "B"), (4L, "d")).toDF("k", "v")
    val out = Merge.upsert(cur, upd, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
  }

  test("upsert with version: highest version wins; update wins the tie") {
    val cur = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("k", "v", "ver")
    val upd = Seq((1L, "A", 3L), (2L, "B", 5L)).toDF("k", "v", "ver")
    val out = Merge.upsert(cur, upd, Seq("k"), Some("ver"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a") // stale update loses
    assert(out(2L) == "B") // tie goes to the update batch
  }

  test("duplicate keys inside the update batch resolve deterministically") {
    val cur = Seq((1L, "old")).toDF("k", "v")
    // two updates for the same key, no version column: greatest content wins
    val upd = Seq((1L, "v1"), (1L, "v2")).toDF("k", "v")
    val picks = (1 to 5).map { i =>
      Merge.upsert(cur, upd.repartition(i + 1), Seq("k"))
        .collect().map(r => r.getString(1)).toSeq
    }
    assert(picks.forall(_ == Seq("v2")),
      s"winner must not depend on partitioning: $picks")
  }

  test("composite keys and schema mismatch rejection") {
    val cur = Seq((1L, 1L, "a")).toDF("k1", "k2", "v")
    val upd = Seq((1L, 2L, "x")).toDF("k1", "k2", "v")
    assert(Merge.upsert(cur, upd, Seq("k1", "k2")).count() == 2)
    intercept[IllegalArgumentException] {
      Merge.upsert(cur, upd.withColumnRenamed("v", "w"), Seq("k1"))
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, NULL-safe") {
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("d")))
      .toDF("k", "v")
    val next = Seq((1L, Some("a")), (2L, Some("B")), (3L, None), (5L, Some("e")))
      .toDF("k", "v")
    val out = Merge.snapshotDiff(old, next, Seq("k"))
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // NULL <=> NULL compares equal, not 'changed'
      4L -> "removed", 5L -> "added"))
    // NULL appearing/disappearing in a value column is a change
    val nulled = Merge.snapshotDiff(old,
      Seq((4L, None: Option[String])).toDF("k", "v"), Seq("k"))
      .filter($"k" === 4L).collect()(0).getString(1)
    assert(nulled == "changed")
    intercept[IllegalArgumentException] {
      Merge.snapshotDiff(old, next.withColumnRenamed("v", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Merge.snapshotDiff(old, next, Seq("k", "v"))
    }
  }
}
