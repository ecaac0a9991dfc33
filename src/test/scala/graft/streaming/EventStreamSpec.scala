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
}
