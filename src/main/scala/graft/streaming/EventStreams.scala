package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingest for the `events` table shape.
  *
  * The reference is batch-only (SURVEY.md §2.9) — its only
  * recency-aware computation is the DQ freshness rule — so this module
  * is capability beyond parity: the streaming half a production
  * training-data platform needs for the same event schema. Transforms
  * are written against unbounded DataFrames (`readStream` → transform
  * → `writeStream`) and work identically on batch frames.
  *
  * Scale notes: the windowed aggregate is a standard watermarked
  * hash-partitioned stateful agg (state pruned by the watermark, no
  * unbounded growth); sessionization keeps ONE compact state record
  * per active user key and closes it by event-time timeout, which is
  * the `flatMapGroupsWithState` pattern that scales horizontally with
  * the key space.
  */
object EventStreams {

  final case class Event(
      eventId: Long, userId: Long, eventType: String,
      value: Double, ts: Timestamp)

  final case class Session(
      userId: Long, start: Timestamp, end: Timestamp,
      nEvents: Long, totalValue: Double)

  // Scala-private would compile to a JVM-private class the encoder's
  // generated Java cannot touch; private[streaming] stays public in
  // bytecode while hiding it from the API.
  private[streaming] final case class SessionState(
      start: Long, end: Long, n: Long, total: Double)

  /** Streaming source over a parquet event directory. */
  def fromParquetDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP")
      .parquet(dir)

  /** Hourly per-type counts/revenue with a 10-minute watermark: late
    * events beyond the watermark are dropped, closed windows are
    * finalized (Append) and their state evicted. */
  def windowedCounts(events: DataFrame,
      watermark: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming data-quality monitor: per-window counts of DQ rule
    * violations (not_null on user_id, range on value) over the live
    * event stream — the continuous form of the batch DQ engine's R1/R3
    * (`graft.dq`). A watermark bounds state; emitted windows carry the
    * violation counts and a passed flag per rule, ready for an
    * alerting sink. */
  def dqMonitor(events: DataFrame,
      valueLo: Double = 0.0, valueHi: Double = 400.0,
      watermark: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("user_id").isNull.cast("long")).as("null_user_ids"),
        sum((col("value") < valueLo || col("value") > valueHi)
          .cast("long")).as("range_violations"))
      .select(
        col("window.start").as("window_start"),
        col("n_events"),
        col("null_user_ids"),
        (col("null_user_ids") === 0).as("not_null_passed"),
        col("range_violations"),
        (col("range_violations") === 0).as("range_passed"))

  /** Gap-based sessionization: one state record per user; a session
    * closes when the event-time watermark passes `gapMinutes` past its
    * last event (or when a new in-batch event arrives after the gap).
    */
  def sessionize(events: Dataset[Event],
      gapMinutes: Long = 30,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = it.toVector.sortBy(_.ts.getTime)
            var closed = Vector.empty[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end > gapMs =>
                  closed :+= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  // late-but-within-watermark events can precede the
                  // stored start; extend both bounds
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }
}
