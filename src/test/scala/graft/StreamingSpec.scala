package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming
import graft.streaming.Streaming.Event

/** Structured Streaming paths driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailyKpi: watermarked daily windows aggregate per event day") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String, Double)]
    val q = Streaming.dailyKpi(
        ms.toDF.toDF("user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("kpi_stream")
      .outputMode("complete").start()
    try {
      ms.addData(
        (1L, ts("2026-03-01 10:00:00"), "click", 10.0),
        (2L, ts("2026-03-01 11:00:00"), "view", 30.0),
        (1L, ts("2026-03-02 09:00:00"), "click", 50.0))
      q.processAllAvailable()
      val out = spark.table("kpi_stream").collect()
        .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(out("2026-03-01") == ((2L, 1L, 20.0)))
      assert(out("2026-03-02") == ((1L, 1L, 50.0)))
      // second micro-batch updates the same window
      ms.addData((3L, ts("2026-03-01 23:00:00"), "click", 20.0))
      q.processAllAvailable()
      val out2 = spark.table("kpi_stream").collect()
        .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(out2("2026-03-01") == ((3L, 2L, 20.0)))
    } finally q.stop()
  }

  test("latestPerUser: keyed state keeps the newest event across batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streaming.latestPerUser(ms.toDS())
      .writeStream.format("memory").queryName("lww_stream")
      .outputMode("update").start()
    try {
      ms.addData(
        Event(1L, ts("2026-03-01 10:00:00"), "click", 1.0),
        Event(1L, ts("2026-03-01 12:00:00"), "view", 2.0))
      q.processAllAvailable()
      // older event in a LATER batch must not displace the state
      ms.addData(Event(1L, ts("2026-03-01 11:00:00"), "error", 9.0))
      q.processAllAvailable()
      val rows = spark.table("lww_stream").as[Event].collect()
      val last = rows.last // update-mode emits per batch; final emit wins
      assert(last.ts == ts("2026-03-01 12:00:00") && last.event_type == "view")
    } finally q.stop()
  }
}
