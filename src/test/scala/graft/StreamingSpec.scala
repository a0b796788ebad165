package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("hourly windowed counts over a streaming source (watermarked)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Event]
    val q = EventStream.hourlyTypeCounts(src.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      src.addData(
        Event(1, ts("10:05"), 1, "click", 1.0),
        Event(2, ts("10:45"), 1, "click", 2.0),
        Event(3, ts("11:10"), 2, "view", 1.5))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 and 11:00 windows
      src.addData(Event(4, ts("15:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("window_start", "event_type", "n", "total_value").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "view", 1L, 1.5)))
    } finally q.stop()
  }

  test("stateful sessionization: gap >30min closes a session, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Event]
    val q = EventStream.sessionize(src.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // batch 1: two events 10 min apart -> one live session
      src.addData(
        Event(1, ts("10:00"), 7, "click", 1.0),
        Event(2, ts("10:10"), 7, "click", 2.0))
      q.processAllAvailable()
      // batch 2: event 3h later -> closes the first session, opens another
      src.addData(Event(3, ts("13:00"), 7, "view", 5.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").filter(col("closed"))
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(closed.toSeq == Seq((7L, 2L, 3.0)),
        s"expected first session closed with 2 events, got ${closed.toSeq}")
      val live = spark.table("sessions").filter(!col("closed") && col("n_events") === 1)
        .collect()
      assert(live.nonEmpty, "expected the 13:00 session emitted as live")
    } finally q.stop()
  }

  test("streaming transforms also run in batch mode (unified semantics)") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts("10:05"), 1, "click", 1.0),
      Event(2, ts("10:45"), 1, "click", 2.0)).toDF()
    val out = EventStream.hourlyTypeCounts(batch).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n") == 2)
  }
}
