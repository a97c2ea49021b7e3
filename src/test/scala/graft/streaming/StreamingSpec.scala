package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1000L * 1000 // micros per second

  test("sessionizeBatch splits on gap and aggregates exactly") {
    // user 1: events at t=0s, 10s, 2000s (gap 30s) -> two sessions
    val events = Seq(
      (1L, 0L, 5.0), (1L, 10L * us * 1000, 7.0), (1L, 2000L * us * 1000, 1.0),
      (2L, 0L, 2.0)
    ).toDF("user_id", "ts", "value") // ts in nanos like events.parquet
    val got = EventStreams.sessionizeBatch(events, gapMicros = 30 * us)
      .orderBy("user_id", "session_idx")
      .select("user_id", "n_events", "total_value").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2, 12.0), (1L, 1, 1.0), (2L, 1, 2.0)))
  }

  test("streaming windowedStats over MemoryStream equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val toEvents = (df: org.apache.spark.sql.DataFrame) => df
      .toDF("event_id", "ts", "event_type", "value")
    val batchDf = toEvents(Seq(
      (1L, 0L, "click", 1.0),
      (2L, 10L * 60 * us * 1000, "click", 2.0),       // same hour
      (3L, 70L * 60 * us * 1000, "click", 4.0),       // next hour
      (4L, 5L * 60 * us * 1000, "error", 8.0)).toDF())

    val q = EventStreams.streamingWindowedStats(toEvents(mem.toDF()), "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      mem.addData((1L, 0L, "click", 1.0),
        (2L, 10L * 60 * us * 1000, "click", 2.0),
        (3L, 70L * 60 * us * 1000, "click", 4.0),
        (4L, 5L * 60 * us * 1000, "error", 8.0))
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.windowedStats(batchDf, "1 hour")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.size == 3)
    } finally q.stop()
  }

  test("streamingDedup keeps first arrival per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val q = EventStreams.streamingDedup(
      mem.toDF().toDF("event_id", "ts", "user_id_s", "value"),
      keyCols = Seq("user_id_s"), lateness = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      // base offset: an event AT the initial zero watermark would be late
      val h = 3600L * us * 1000 // one hour in nanos
      mem.addData((1L, h, "alice", 1.0))
      q.processAllAvailable()
      // later batch: duplicate key inside the watermark is dropped
      mem.addData(
        (2L, h + 1L * us * 1000, "alice", 2.0),
        (3L, h + 2L * us * 1000, "bob", 3.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select("event_id", "user_id_s").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "alice"), (3L, "bob")))
    } finally q.stop()
  }

  test("stateful sessionize over MemoryStream emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    import EventStreams.{Event, Session}
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMicros = 30 * us)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      mem.addData(Event(1L, "click", 1.0, 0L),
        Event(1L, "click", 2.0, 10 * us))
      q.processAllAvailable()
      // second batch: an event far past the gap closes the first session
      mem.addData(Event(1L, "click", 4.0, 10_000 * us))
      q.processAllAvailable()
      val sessions = spark.table("sess_out").as[Session].collect()
      assert(sessions.length == 1)
      assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
    } finally q.stop()
  }
}
