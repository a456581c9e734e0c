package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import EventStreams._

class EventStreamsSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private def ev(id: Long, user: Long, minutes: Long, v: Double = 1.0) =
    Event(id, user, "view", v, ts(minutes))

  test("watermarked hourly window finalizes when event time advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = windowedCounts(src.toDF().withColumnRenamed("eventType", "event_type"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      // three events in hour H, then one far ahead to push the
      // watermark (max event time − 10 min) beyond H's end
      src.addData(ev(1, 1, 5), ev(2, 1, 20), ev(3, 2, 40, 5.0))
      q.processAllAvailable()
      src.addData(ev(4, 3, 60 * 5))
      q.processAllAvailable()
      src.addData(ev(5, 3, 60 * 10)) // close H+5's window too
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"))).sortBy(_._1.getTime)
      assert(rows.nonEmpty)
      // window start is the HOUR floor of the first event's time
      assert(rows.head === ((new Timestamp(1699999200000L), 3L, 7.0)))
    } finally q.stop()
  }

  test("sessionization closes sessions by gap and by event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = sessionize(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart, then a 3rd after a 40-min gap
      // (closes session 1 in-batch on the next trigger)
      src.addData(ev(1, 1, 0, 2.0), ev(2, 1, 5, 3.0))
      q.processAllAvailable()
      src.addData(ev(3, 1, 45, 1.0))
      q.processAllAvailable()
      // advance the watermark far enough to time out user 1's open
      // session (end 45' + gap 30' = 75'; watermark = max ts − 10')
      src.addData(ev(9, 99, 120))
      q.processAllAvailable()
      src.addData(ev(10, 99, 180))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Session].collect()
        .filter(_.userId == 1L).sortBy(_.start.getTime)
      assert(sessions.length === 2)
      assert(sessions(0) === Session(1L, ts(0), ts(5), 2, 5.0))
      assert(sessions(1) === Session(1L, ts(45), ts(45), 1, 1.0))
    } finally q.stop()
  }

  test("streaming DQ monitor flags violations per finalized window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = dqMonitor(
        src.toDF().withColumnRenamed("userId", "user_id"),
        valueLo = 0.0, valueHi = 100.0)
      .writeStream.format("memory").queryName("dq_mon")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(
        Event(1, 1, "view", 5.0, ts(5)),
        Event(2, 2, "view", 500.0, ts(20)), // range violation
        Event(3, 3, "view", 50.0, ts(40)))
      q.processAllAvailable()
      src.addData(ev(4, 9, 60 * 5)) // advance watermark, close hour 0
      q.processAllAvailable()
      src.addData(ev(5, 9, 60 * 10))
      q.processAllAvailable()
      // window start = hour floor of the first event's time
      val w0 = spark.table("dq_mon").collect()
        .filter(_.getAs[Timestamp]("window_start") === new Timestamp(1699999200000L))
      assert(w0.length === 1)
      assert(w0(0).getAs[Long]("n_events") === 3)
      assert(w0(0).getAs[Long]("range_violations") === 1)
      assert(!w0(0).getAs[Boolean]("range_passed"))
      assert(w0(0).getAs[Boolean]("not_null_passed"))
    } finally q.stop()
  }

  test("windowed transform works unchanged on a batch frame") {
    import spark.implicits._
    val batch = Seq(ev(1, 1, 5), ev(2, 2, 10), ev(3, 3, 70)).toDF()
      .withColumnRenamed("eventType", "event_type")
    val out = windowedCounts(batch).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum === 3)
  }
}
