package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("windowedAgg runs identically as a batch plan") {
    val events = Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:20:00", "click", 2.0),
      ("2024-01-01 11:05:00", "view", 5.0))
      .toDF("s", "event_type", "value")
      .select(col("s").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val out = EventStream.windowedAgg(events, "ts", "event_type", "1 hour")
      .orderBy("w_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
  }

  test("hourlyStats runs as a FILE stream over the real events parquet") {
    // the driver's events table read as a parquet file stream (nanos ts ->
    // long under the legacy conf, normalized to a timestamp column)
    // file streams need a directory: stage the single-file table into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf()}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val batchDf = spark.read.parquet(dir)
    val raw = spark.readStream.schema(batchDf.schema).parquet(dir)
    // normalize only when the file carries ns-as-long (legacy testdata);
    // a native timestamp[us] column streams through as TimestampType
    val src = batchDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case _ => raw
    }
    val agg = EventStream.windowedAgg(src, "ts", "event_type", "1 hour",
      watermark = Some("1 hour"))
    val q = agg.writeStream.format("memory").queryName("file_evt")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_evt")
        .agg(sum("n")).collect()(0).getLong(0)
      assert(streamed == batchDf.count()) // every event landed in a window
    } finally q.stop()
  }

  test("runningTotals accumulates custom state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val src = mem.toDF().toDF("k", "v")
    val q = EventStream.runningTotals(src, "k", "v").writeStream
      .format("memory").queryName("totals").outputMode("update").start()
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      mem.addData(("a", 4.0))   // second micro-batch must see prior state
      q.processAllAvailable()
      val last = spark.table("totals").groupBy("key")
        .agg(org.apache.spark.sql.functions.max("n").as("n"),
          org.apache.spark.sql.functions.max("total").as("total"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(last("a") == ((3L, 7.0)))   // state carried: 2 events + 1 event
      assert(last("b") == ((1L, 10.0)))
    } finally q.stop()
  }

  test("sessionizeStream emits closed sessions across micro-batches; batch form agrees") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val src = mem.toDF().toDF("user", "ts")
    val q = EventStream.sessionizeStream(src, "user", "ts", gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      mem.addData(("u1", t("2024-01-01 10:00:00")), ("u1", t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // session still open
      mem.addData(("u1", t("2024-01-01 12:00:00"))) // gap > 30min closes it
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(closed == Seq(("u1", 2L))) // first session: 2 events
    } finally q.stop()

    // batch form on the equivalent bounded input: 2 sessions for u1
    import spark.implicits._
    val batch = Seq(("u1", t("2024-01-01 10:00:00")), ("u1", t("2024-01-01 10:10:00")),
      ("u1", t("2024-01-01 12:00:00"))).toDF("user", "ts")
    val sessions = EventStream.sessionizeBatch(batch, "user", "ts", 1800)
      .orderBy("session_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(sessions.toSeq == Seq((1L, 2L), (2L, 1L))) // (session_id, n_events)
  }

  test("sessionizeStream emits an idle key's session on watermark advance alone") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val src = mem.toDF().toDF("user", "ts")
    val q = EventStream.sessionizeStream(src, "user", "ts", gapSeconds = 1800)
      .writeStream.format("memory").queryName("idle_sessions")
      .outputMode("append").start()
    try {
      mem.addData(("u1", t("2024-01-01 10:00:00")), ("u1", t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("idle_sessions").count() == 0) // open, watermark at 10:10
      // u1 never appears again: only OTHER keys advance the watermark past
      // u1.last + gap (10:40) — the event-time timeout must close u1
      mem.addData(("u2", t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val closed = spark.table("idle_sessions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(closed == Seq(("u1", 2L,
        t("2024-01-01 10:00:00").getTime / 1000, t("2024-01-01 10:10:00").getTime / 1000)))
      // ...and the state was evicted: a later u1 event starts a NEW session
      // rather than resuming the emitted one
      mem.addData(("u1", t("2024-01-01 13:00:00")), ("u2", t("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val all = spark.table("idle_sessions").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      // u1's second session (1 event) and u2's first (1 event) both closed
      // by the 15:00 watermark advance... u2's 15:00 session stays open
      assert(all.count(_._1 == "u1") >= 1)
    } finally q.stop()
  }

  test("dedupStream drops in-watermark duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val src = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupStream(src, Seq("doc_id"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, t("2024-01-01 10:00:00"), "a"), (2L, t("2024-01-01 10:01:00"), "b"))
      q.processAllAvailable()
      // duplicate of doc 1 in a LATER micro-batch, still inside the watermark
      mem.addData((1L, t("2024-01-01 10:05:00"), "a dup"), (3L, t("2024-01-01 10:06:00"), "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("doc_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L)) // the cross-batch dup was dropped
    } finally q.stop()

    // batch form: plain first-occurrence dedup on the same data
    val batch = Seq(
      (1L, t("2024-01-01 10:00:00"), "a"), (2L, t("2024-01-01 10:01:00"), "b"),
      (1L, t("2024-01-01 10:05:00"), "a dup")).toDF("doc_id", "ts", "text")
    assert(EventStream.dedupStream(batch, Seq("doc_id"), "ts", "1 hour").count() == 2)
  }

  test("runningTotals also runs on a plain batch Dataset") {
    val df = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0)).toDF("k", "v")
    val out = EventStream.runningTotals(df, "k", "v")
      .collect().map(t => t.key -> ((t.n, t.total))).toMap
    assert(out == Map("a" -> ((2L, 6.0)), "b" -> ((1L, 2.0))))
  }

  test("antiJoinDedup drops history matches as a real stream-static join") {
    implicit val sqlCtx = spark.sqlContext
    val history = Seq(("h1", 1L), ("h2", 2L)).toDF("fp", "x")
    val mem = MemoryStream[(String, Long)]
    val out = EventStream.antiJoinDedup(
      mem.toDF().toDF("fp", "v"), history, Seq("fp"))
    val q = out.writeStream.format("memory").queryName("anti_dedup")
      .outputMode("append").start()
    try {
      mem.addData(("h1", 10L), ("new1", 11L))
      q.processAllAvailable()
      mem.addData(("h2", 12L), ("new2", 13L), ("new1", 14L)) // new1 again: static side doesn't learn
      q.processAllAvailable()
      val rows = spark.table("anti_dedup").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("new1", 11L), ("new2", 13L), ("new1", 14L)))
    } finally q.stop()
    // batch twin: same function, same semantics
    val batch = Seq(("h1", 1L), ("n", 2L)).toDF("fp", "v")
    assert(EventStream.antiJoinDedup(batch, history, Seq("fp"))
      .collect().map(_.getString(0)).toSeq == Seq("n"))
  }

  test("intervalJoin matches the naive range join on batch input") {
    val l = Seq((1L, "u", "2024-01-01 10:00:00"), (2L, "u", "2024-01-01 12:00:00"),
        (3L, "v", "2024-01-01 10:00:00"))
      .toDF("p_id", "p_user", "s").select($"p_id", $"p_user", $"s".cast("timestamp").as("p_ts"))
    val r = Seq((10L, "u", "2024-01-01 10:00:00"), (11L, "u", "2024-01-01 10:59:59"),
        (12L, "u", "2024-01-01 11:00:00"), (13L, "w", "2024-01-01 10:30:00"))
      .toDF("c_id", "c_user", "s").select($"c_id", $"c_user", $"s".cast("timestamp").as("c_ts"))
    val out = EventStream.intervalJoin(l, r, "p_user", "c_user", "p_ts", "c_ts",
        "0 seconds", "1 hours")
      .select($"p_id", $"c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // [10:00, 11:00): 10 (inclusive lower) and 11 match; 12 excluded (exclusive upper)
    assert(out == Set((1L, 10L), (1L, 11L)))
  }

  test("intervalJoin runs stream-stream with watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[(Long, String, Timestamp)]
    val rm = MemoryStream[(Long, String, Timestamp)]
    val joined = EventStream.intervalJoin(
      lm.toDF().toDF("p_id", "p_user", "p_ts"),
      rm.toDF().toDF("c_id", "c_user", "c_ts"),
      "p_user", "c_user", "p_ts", "c_ts", "0 seconds", "1 hours",
      watermarkDelay = Some("10 minutes"))
    val q = joined.select($"p_id", $"c_id").writeStream
      .format("memory").queryName("ivj").outputMode("append").start()
    try {
      lm.addData((1L, "u", Timestamp.valueOf("2024-01-01 10:00:00")))
      rm.addData(
        (10L, "u", Timestamp.valueOf("2024-01-01 10:30:00")),
        (11L, "u", Timestamp.valueOf("2024-01-01 11:30:00")), // outside window
        (12L, "x", Timestamp.valueOf("2024-01-01 10:30:00"))) // other key
      q.processAllAvailable()
      // a second micro-batch joins against buffered left state
      rm.addData((13L, "u", Timestamp.valueOf("2024-01-01 10:45:00")))
      q.processAllAvailable()
      val rows = spark.table("ivj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 10L), (1L, 13L)))
    } finally q.stop()
  }

  test("the same transform runs as a real stream with watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val src = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.windowedAgg(src, "ts", "event_type", "1 hour",
      watermark = Some("10 minutes"))
    val q = agg.writeStream
      .format("memory").queryName("evt_agg").outputMode("complete").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:20:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("evt_agg").orderBy("w_start", "event_type")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedDistinctRegisters streams to the exact batch registers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val src = mem.toDF().toDF("ts", "user_id")
    val regs = EventStream.windowedDistinctRegisters(src, "ts", "user_id",
      "1 hour", watermark = Some("10 minutes"))
    val q = regs.writeStream
      .format("memory").queryName("evt_regs").outputMode("complete").start()
    try {
      // 40 users across two hours, users 1-10 DUPLICATED across batches —
      // max's idempotence must absorb the re-arrivals
      val h1 = (1L to 25L).map(u => (Timestamp.valueOf("2024-01-01 10:05:00"), u))
      val h2 = (20L to 40L).map(u => (Timestamp.valueOf("2024-01-01 11:10:00"), u))
      mem.addData(h1)
      q.processAllAvailable()
      mem.addData(h2 ++ h1.take(10))
      q.processAllAvailable()
      val streamed = spark.table("evt_regs")
      val batch = EventStream.windowedDistinctRegisters(
        (h1 ++ h2 ++ h1.take(10)).toDF("ts", "user_id"), "ts", "user_id", "1 hour")
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
      // and the registers answer the distinct question
      val est = graft.analyze.Sketches.hllEstimate(
        streamed.withColumnRenamed("w_start", "w"), Seq("w"))
        .orderBy("w").select("estimate").as[Double].collect()
      assert(est.length == 2)
      assert(math.abs(est(0) - 25) / 25.0 < 0.3 &&
        math.abs(est(1) - 21) / 21.0 < 0.3, est.mkString(","))
    } finally q.stop()
  }

  test("foreachBatch + Merge.upsert is the continuous CDC apply loop") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Merge
    val mem = MemoryStream[(Long, String, Long)] // (key, value, version)
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    // seed snapshot
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
      .write.parquet(s"$dir/snap")
    val q = mem.toDF().toDF("k", "v", "ver").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val current = spark.read.parquet(s"$dir/snap")
        Merge.upsert(current, batch, Seq("k"), Some("ver"))
          .write.mode("overwrite").parquet(s"$dir/next")
        // atomic-swap stand-in: re-point the snapshot (a real deployment
        // writes to a versioned dir and flips a manifest)
        spark.read.parquet(s"$dir/next").write.mode("overwrite")
          .parquet(s"$dir/snap")
      }
      .start()
    try {
      mem.addData((2L, "B2", 2L), (3L, "c", 1L)) // update + insert
      q.processAllAvailable()
      mem.addData((2L, "stale", 1L)) // stale version must lose
      q.processAllAvailable()
      val state = spark.read.parquet(s"$dir/snap")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(state == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
    } finally q.stop()
  }

  test("sessionWindows lifts to a watermarked stream unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // the IDENTICAL expression on a watermarked source: append mode only
    // emits sessions the watermark has sealed
    val q = EventStream.sessionWindows(
        mem.toDF().toDF("user_id", "ts").withWatermark("ts", "0 seconds"),
        "user_id", "ts", "10 minutes")
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      mem.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("native_sessions").count() == 0) // still open
      mem.addData((1L, t("2024-01-01 11:00:00"))) // watermark seals session 1
      q.processAllAvailable()
      val closed = spark.table("native_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq
      assert(closed == Seq((1L, 2L))) // first session emitted with 2 events
    } finally q.stop()
  }

  test("sessionWindows: native session_window merges within-gap, splits at gap") {
    // inputs as Timestamp objects, expectations via the same getTime —
    // both instant-based, so the test holds under any JVM default TZ
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")), // session A
      (1L, Timestamp.valueOf("2024-01-01 10:09:59")), // 9:59 gap -> merges
      (1L, Timestamp.valueOf("2024-01-01 10:19:59")), // EXACTLY 10:00 -> still merges (inclusive)
      (1L, Timestamp.valueOf("2024-01-01 10:30:00")), // 10:01 gap -> new session
      (2L, Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("user_id", "ts")
    val out = EventStream.sessionWindows(ev, "user_id", "ts", "10 minutes")
      .orderBy("user_id", "session_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 3)
    val us = (s: String) => java.sql.Timestamp.valueOf(s).getTime * 1000L
    assert(out(0) == ((1L, us("2024-01-01 10:00:00"),
      us("2024-01-01 10:29:59"), 3L))) // end = last event + gap; boundary merges
    assert(out(1) == ((1L, us("2024-01-01 10:30:00"),
      us("2024-01-01 10:40:00"), 1L)))
    assert(out(2)._1 == 2L && out(2)._4 == 1L)
  }
}
