package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import EventStreams._

/** e04 fixture row shape (file-scope: Spark encoders need a stable,
  * non-inner case class). */
final case class EvP(event_id: Long, ts: Timestamp, event_type: String,
    value: Double, props: String)

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

  test("streaming decayed engagement folds to the batch e07 rows exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    // the batch spec's multi-week log (days relative to ref day 100),
    // plus a same-day second event to exercise in-bucket accumulation
    val log = Seq(
      (1L, 100L, 1L, "view"), (2L, 97L, 1L, "click"),
      (3L, 92L, 1L, "purchase"), (8L, 92L, 1L, "view"),
      (4L, 99L, 2L, "view"), (5L, 78L, 2L, "view"),
      // 96 days behind user 2's own newest day (99): beyond the
      // 13-week horizon relative to the USER's max — pruned
      (6L, 3L, 2L, "purchase"),
      (7L, 100L, 3L, "purchase"))
    val d = java.nio.file.Files.createTempDirectory("graft-e07s").toString
    log.toDF("event_id", "d", "user_id", "event_type")
      .selectExpr("event_id", s"d * $day * 1000000000 AS ts", "user_id",
        "event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val batch = graft.queries.EventPipeline.decayedEngagement(spark, d)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        EngagementScore(r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_recent"), r.getAs[Long]("last_seen_days"),
          r.getAs[Long]("engagement_q"), r.getAs[Double]("engagement"),
          r.getAs[Long]("purchase_q"))).toMap
    val src = MemoryStream[Event]
    val q = EventStreams.decayedEngagement(src.toDS())
      .writeStream.format("memory").queryName("engagement")
      .outputMode(OutputMode.Update).start()
    try {
      // two arrival batches split mid-user to exercise state carry-over
      val evs = log.map { case (id, dd, u, t) =>
        Event(id, u, t, 1.0, new Timestamp(dd * day * 1000L)) }
      src.addData(evs.take(4): _*)
      q.processAllAvailable()
      src.addData(evs.drop(4): _*)
      q.processAllAvailable()
      val latest = spark.table("engagement").as[EngagementBuckets]
        .collect().groupBy(_.userId)
        .map { case (u, rows) => u -> rows.maxBy(_.nEvents) }
      val refDay = 100L // the log's max day = the batch query's ref day
      latest.foreach { case (u, b) =>
        assert(EventStreams.scoreAt(b, refDay) === batch(u),
          s"user $u: streamed fold must equal the batch row")
      }
      assert(latest.keySet === batch.keySet)
      // state bound: the bucket 96 days behind user 2's newest day is
      // pruned (weight 0 at any reference ≥ the user's max day), but
      // nEvents still counts it like batch n_events
      val u2 = latest(2L)
      assert(!u2.buckets.exists(_.day == 3L), "zero-weight bucket must be pruned")
      assert(u2.nEvents === 3L)
    } finally q.stop()
  }

  test("streaming funnel agrees with the batch operator, incl. reordered arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // compact timeline: 60-min hop horizon, 120-min quiet, 10-min wm
    val log = Seq(
      // user 3: full chain at ONE timestamp (tie semantics)
      (30L, 3L, "view", 10L), (31L, 3L, "click", 10L),
      (32L, 3L, "purchase", 10L),
      // user 4: hops exactly AT the horizon, then one just past it
      (40L, 4L, "view", 0L), (41L, 4L, "click", 60L),
      (42L, 4L, "purchase", 120L), (43L, 4L, "purchase", 181L),
      // user 5: click before any view never qualifies
      (50L, 5L, "click", 5L), (51L, 5L, "view", 10L),
      (52L, 5L, "purchase", 20L),
      // user 6: no view → no report row
      (60L, 6L, "click", 1L), (61L, 6L, "purchase", 2L),
      // user 8: view arrives AFTER its click (within the watermark
      // bound) — the reorder buffer must still qualify the click
      (80L, 8L, "click", 58L), (81L, 8L, "view", 55L))

    val src = MemoryStream[Event]
    val q = funnel(src.toDS(), horizonMinutes = 60, quietMinutes = 120)
      .writeStream.format("memory").queryName("funnel_reports")
      .outputMode(OutputMode.Append).start()
    try {
      def send(ids: Long*): Unit = {
        src.addData(log.filter(e => ids.contains(e._1)).map { case (id, u, t, m) =>
          Event(id, u, t, 1.0, ts(m)) }: _*)
        q.processAllAvailable()
      }
      // batch 1: max ts 60 → the NEXT batch runs with watermark 50,
      // so user 8's view@55 can still arrive behind its click@58
      send(30L, 31L, 32L, 40L, 41L, 50L, 51L, 52L, 60L, 61L, 80L)
      // batch 2: the reordered view@55 (above wm 50 — inside the
      // lateness bound) plus user 4's tail
      send(81L, 42L, 43L)
      // push event time past every user's last event + 120' quiet
      // (user 4 times out at 181 + 120 = 301' → needs wm > 301)
      src.addData(ev(990, 99L, 320)); q.processAllAvailable()
      src.addData(ev(991, 99L, 500)); q.processAllAvailable()

      val got = spark.table("funnel_reports").as[FunnelReport].collect()
        .filter(_.userId != 99L)
        .map(r => r.userId -> ((r.firstViewUs, r.firstQualClickUs,
          r.firstConversionUs, r.nConversions))).toMap

      // batch reference over the SAME events (minute → ns parquet)
      val d = java.nio.file.Files.createTempDirectory("graft-sfun").toString
      log.map { case (id, u, t, m) =>
        (id, 1700000000000000000L + m * 60000000000L, u, t) }
        .toDF("event_id", "ts_ns", "user_id", "event_type")
        .selectExpr("event_id", "ts_ns AS ts", "user_id", "event_type",
          "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      val want = graft.queries.EventPipeline
        .funnelWith(spark, d, 3600L * 1000000).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4)))).toMap
      assert(got === want)
      // and the reorder case really did qualify
      assert(got(8L)._2 === Some(1700000000000000L + 58L * 60000000L))
    } finally q.stop()
  }

  test("streaming funnel seal: equal-ts view split across batches still tie-qualifies") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The funnel analogue of the asofJoin user-4 case: the click@60
    // and its TIE-QUALIFYING view@60 are split across micro-batches,
    // with the view arriving inside the lateness bound (wm 55 < 60).
    // The seal must hold the click pending until the equal-ts view is
    // orderable; folding it early loses both the qualification and
    // the downstream conversion. (A view at exactly the watermark is
    // unreachable: Spark's late filter drops eventTime <= wm — the
    // measured numRowsDroppedByWatermark boundary that makes the
    // strict and inclusive seals behaviorally equal today; the strict
    // seal is pinned for parity with asofJoin.)
    val log = Seq(
      (90L, 9L, "click", 60L), (92L, 9L, "purchase", 65L),
      (91L, 9L, "view", 60L))
    val src = MemoryStream[Event]
    val q = funnel(src.toDS(), horizonMinutes = 60, quietMinutes = 120)
      .writeStream.format("memory").queryName("funnel_seal")
      .outputMode(OutputMode.Append).start()
    try {
      def send(ids: Long*): Unit = {
        src.addData(log.filter(e => ids.contains(e._1)).map { case (id, u, t, m) =>
          Event(id, u, t, 1.0, ts(m)) }: _*)
        q.processAllAvailable()
      }
      send(90L, 92L)      // batch 1: click@60, purchase@65 → wm 55
      send(91L)           // batch 2: the equal-ts view@60, above wm 55
      // close user 9's quiet window (65 + 120 = 185 → needs wm > 185)
      src.addData(ev(990, 99L, 210)); q.processAllAvailable()
      src.addData(ev(991, 99L, 400)); q.processAllAvailable()

      val got = spark.table("funnel_seal").as[FunnelReport].collect()
        .filter(_.userId == 9L)
      assert(got.length === 1)
      val us = (m: Long) => 1700000000000000L + m * 60000000L
      assert(got.head === FunnelReport(9L, us(60), Some(us(60)),
        Some(us(65)), 1L))
    } finally q.stop()
  }

  test("streaming as-of join agrees with batch e01, incl. reorder and equal-ts seal") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (event_id, user, type, minute)
    val log = Seq(
      // user 1: probe before any view → null match; tie at 10 matches
      // inclusively; equal-ts views at 20 → max event_id wins
      (99L, 1L, "purchase", 5L), (1L, 1L, "view", 10L),
      (100L, 1L, "purchase", 10L), (2L, 1L, "view", 20L),
      (3L, 1L, "view", 20L), (101L, 1L, "purchase", 25L),
      // user 2: view@55 arrives a batch AFTER its probe@58 (batch 1's
      // max is 60 → wm 50, so 55 clears the late filter) — the strict
      // seal must hold the probe back until the view is orderable
      (200L, 2L, "purchase", 58L), (4L, 2L, "view", 55L),
      // user 3: never any view
      (300L, 3L, "purchase", 50L),
      // user 4: the equal-ts pair is SPLIT across batches — only a
      // strict (<) seal folds them together
      (400L, 4L, "purchase", 60L), (5L, 4L, "view", 60L))
    val batch2 = Set(4L, 5L)

    val src = MemoryStream[Event]
    val q = asofJoin(src.toDS(), quietMinutes = 60)
      .writeStream.format("memory").queryName("asof_matches")
      .outputMode(OutputMode.Append).start()
    try {
      def send(ids: Set[Long]): Unit = {
        src.addData(log.filter(e => ids.contains(e._1)).map {
          case (id, u, t, m) => Event(id, u, t, 1.0, ts(m)) }: _*)
        q.processAllAvailable()
      }
      send(log.map(_._1).toSet -- batch2)
      send(batch2)
      src.addData(ev(990, 99L, 200)); q.processAllAvailable()
      src.addData(ev(991, 99L, 400)); q.processAllAvailable()

      val got = spark.table("asof_matches").as[AsofMatch].collect()
        .map(r => r.purchaseId ->
          ((r.userId, r.purchaseUs, r.viewId, r.viewUs, r.gapUs))).toMap

      val d = java.nio.file.Files.createTempDirectory("graft-sasof").toString
      log.map { case (id, u, t, m) =>
        (id, 1700000000000000000L + m * 60000000000L, u, t) }
        .toDF("event_id", "ts_ns", "user_id", "event_type")
        .selectExpr("event_id", "ts_ns AS ts", "user_id", "event_type",
          "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      val want = graft.queries.EventPipeline.asofJoin(spark, d).collect()
        .map { r =>
          def optL(i: Int) = Option(r.get(i)).map(_.asInstanceOf[Long])
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), optL(4), optL(5),
            optL(6)))
        }.toMap
      assert(got === want)
      // the reordered and split-tie cases really matched
      assert(got(200L)._3 === Some(4L))
      assert(got(400L)._3 === Some(5L))
    } finally q.stop()
  }

  test("stream-stream range join counts prior-hour views per purchase, incl. zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def e(id: Long, user: Long, typ: String, m: Long) =
      Event(id, user, typ, 1.0, ts(m))
    val src = MemoryStream[Event]
    val q = viewsBeforePurchase(src.toDS(), lookbackMinutes = 60)
      .writeStream.format("memory").queryName("range_counts")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(
        // user 1: 3 views inside (p-60, p] of purchase@50, then only
        // view@70 inside the window of purchase@110 (49 ≤ 110-60)
        e(1, 1, "view", 5), e(2, 1, "view", 30), e(3, 1, "view", 49),
        e(100, 1, "purchase", 50), e(4, 1, "view", 70),
        e(101, 1, "purchase", 110),
        // user 2: purchase with no views at all — zero row must survive
        e(200, 2, "purchase", 20),
        // user 3: view EXACTLY at p-60 is excluded (strict lower bound)
        e(5, 3, "view", 0), e(300, 3, "purchase", 60),
        // user 4: view at the purchase instant is included (<=)
        e(6, 4, "view", 60), e(400, 4, "purchase", 60))
      q.processAllAvailable()
      // both branch watermarks must advance past every window + 10'
      src.addData(e(7, 9, "view", 400), e(900, 9, "purchase", 400))
      q.processAllAvailable()
      src.addData(e(8, 9, "view", 500), e(901, 9, "purchase", 500))
      q.processAllAvailable()
      val got = spark.table("range_counts").collect()
        .map(r => r.getAs[Long]("purchase_id") ->
          ((r.getAs[Long]("user_id"), r.getAs[Long]("n_views")))).toMap
        .view.filterKeys(_ < 900).toMap
      assert(got === Map(
        100L -> ((1L, 3L)), 101L -> ((1L, 1L)),
        200L -> ((2L, 0L)), 300L -> ((3L, 0L)), 400L -> ((4L, 1L))))
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

  test("streaming daily counts fold to the batch e09 anomaly rows exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    // the batch spec's log: click 5/day on days 0..8 + 50 on day 9,
    // steady 7/day on days 0..2 (zero variance, must never flag)
    var id = 0L
    val log = (0 to 9).flatMap { d =>
      val n = if (d == 9) 50 else 5
      (1 to n).map { k => id += 1; (id, d.toLong, 1L, "click") }
    } ++ (0 to 2).flatMap { d =>
      (1 to 7).map { k => id += 1; (id, d.toLong, 2L, "steady") }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-e09s").toString
    log.toDF("event_id", "d", "user_id", "event_type")
      .selectExpr("event_id", s"d * $day * 1000000000 AS ts", "user_id",
        "event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.EventPipeline.dailyAnomaly(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val src = MemoryStream[Event]
    val q = EventStreams.dailyCounts(src.toDS())
      .writeStream.format("memory").queryName("daily_counts")
      .outputMode(OutputMode.Update).start()
    try {
      val evs = log.map { case (i, d, u, t) =>
        Event(i, u, t, 1.0, new Timestamp(d * day * 1000L)) }
      // split mid-day-bucket to exercise state accumulation
      src.addData(evs.take(7): _*)
      q.processAllAvailable()
      src.addData(evs.drop(7): _*)
      q.processAllAvailable()
      val latest = spark.table("daily_counts").as[TypeDayCounts]
        .collect().groupBy(_.eventType)
        .map { case (t, rows) => t -> rows.maxBy(_.buckets.map(_.n).sum) }
      val folded = latest.values.flatMap(EventStreams.anomaliesAt)
        .map(a => (a.eventType, a.day) -> ((a.cnt, a.devN, a.isAnomaly)))
        .toMap
      assert(folded === batch,
        "streamed histogram fold must equal the batch e09 rows")
    } finally q.stop()
  }

  test("streaming user activity folds to the batch e11 cohort matrix, " +
      "incl. a late earlier-day arrival that moves a user's cohort") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    // user 1: days 0,1,3 (cohort 0); user 2: days 1,1,2 (cohort 1);
    // user 3: day 2 then a LATE day-0 event (cohort must drop 2 → 0)
    var id = 0L
    def e(u: Long, d: Long) = { id += 1; (id, u, d) }
    val early = Seq(e(1, 0), e(1, 1), e(2, 1), e(2, 1), e(3, 2), e(1, 3))
    val late = Seq(e(2, 2), e(3, 0))
    val all = early ++ late
    val dir = java.nio.file.Files.createTempDirectory("graft-e11s").toString
    all.toDF("event_id", "user_id", "d")
      .selectExpr("event_id", s"d * $day * 1000000000 AS ts", "user_id",
        "'click' AS event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.EventPipeline.cohortMatrix(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val src = MemoryStream[Event]
    val q = EventStreams.userActivity(src.toDS())
      .writeStream.format("memory").queryName("user_activity")
      .outputMode(OutputMode.Update).start()
    try {
      def evs(rows: Seq[(Long, Long, Long)]) = rows.map { case (i, u, d) =>
        Event(i, u, "click", 1.0, new Timestamp(d * day * 1000L)) }
      src.addData(evs(early): _*)
      q.processAllAvailable()
      src.addData(evs(late): _*)
      q.processAllAvailable()
      val latest = spark.table("user_activity").as[UserActivity]
        .collect().groupBy(_.userId)
        .map { case (_, rows) => rows.maxBy(_.buckets.map(_.n).sum) }
        .toSeq
      // the late day-0 event must have re-based user 3's cohort
      assert(latest.find(_.userId == 3L).get.cohortDay === 0L)
      val folded = EventStreams.cohortMatrixAt(latest)
        .map(c => (c.cohortDay, c.dayOffset) ->
          ((c.nActiveUsers, c.nEvents, c.cohortSize, c.retainedPpm)))
        .toMap
      assert(folded === batch,
        "streamed activity fold must equal the batch e11 matrix")
    } finally q.stop()
  }

  test("streaming windowed json props fold to the batch e04 report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (id, type, k-json, value, minutes) — k 37/44 share decile 3/4,
    // a null-k props row lands in the null decile like batch
    val rows = Seq(
      (1L, "view", """{"k": 37}""", 1.25, 0L),
      (2L, "view", """{"k": 31}""", 2.50, 10L),
      (3L, "view", """{"k": 44}""", 0.75, 70L), // second window
      (4L, "click", """{"k": 37}""", 3.10, 5L),
      (5L, "click", """{}""", 1.00, 15L))
    val dir = java.nio.file.Files.createTempDirectory("graft-e04s").toString
    rows.toDF("event_id", "event_type", "props", "value", "m")
      .selectExpr("event_id",
        "timestamp_micros(1700000000000000 + m * 60000000) AS ts",
        "CAST(event_id AS LONG) AS user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.EventPipeline.jsonProps(spark, dir)
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    val src = MemoryStream[EvP]
    val q = jsonPropsWindowed(src.toDF())
      .writeStream.format("memory").queryName("json_props")
      .outputMode(OutputMode.Append).start()
    try {
      def e(r: (Long, String, String, Double, Long)) =
        EvP(r._1, new Timestamp(1700000000000L + r._5 * 60000L), r._2, r._4, r._3)
      // first-window rows arrive first (reordered); the minute-70 row
      // arrives later so it cannot watermark-drop the early clicks
      src.addData(Seq(rows(0), rows(3), rows(1), rows(4)).map(e): _*)
      q.processAllAvailable()
      src.addData(Seq(rows(2)).map(e): _*)
      q.processAllAvailable()
      // push the watermark past both windows to finalize them
      src.addData(EvP(99L, new Timestamp(1700000000000L + 600 * 60000L),
        "view", 9.99, """{"k": 1}"""))
      src.addData(EvP(100L, new Timestamp(1700000000000L + 700 * 60000L),
        "view", 9.99, """{"k": 1}"""))
      q.processAllAvailable()
      val emitted = spark.table("json_props").collect()
        .filter(_.getAs[Long]("n_events") > 0)
        .map(r => (r.getString(1),
          if (r.isNullAt(2)) -999L else r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .toSeq
        .filterNot { case (_, k, _, v, _, _) => v == 9.99 } // the wm pushers
      val folded = jsonPropsAt(emitted.map(t =>
        (t._1, t._2, t._3, t._4, t._5, t._6)))
        .map(j => (j.eventType, if (j.kDecile == -999L) null else j.kDecile) ->
          ((j.nEvents, j.minValue, j.maxValue, j.totalCents))).toMap
      assert(folded === batch,
        "streamed windowed fold must equal the batch e04 report")
    } finally q.stop()
  }

  test("streaming adjacent pairs fold to the batch e08 transitions AND " +
      "e06 gap quantiles, incl. reorder, quiet-gap chain survival, ties") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: view@0 click@3 view@10 [2h quiet] purchase@130 — the
    // post-quiet purchase must still pair with view@10; user 2:
    // click@1 click@2 purchase@60; user 3: one event only (no pairs)
    val rows = Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 3L), (3L, 1L, "view", 10L),
      (4L, 1L, "purchase", 130L),
      (5L, 2L, "click", 1L), (6L, 2L, "click", 2L), (7L, 2L, "purchase", 60L),
      (8L, 3L, "view", 7L))
    val dir = java.nio.file.Files.createTempDirectory("graft-e0608s").toString
    rows.toDF("event_id", "user_id", "event_type", "m")
      .selectExpr("event_id", "timestamp_micros(1700000000000000 + m * 60000000) AS ts",
        "user_id", "event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batchE08 = graft.queries.EventPipeline.eventTransitions(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val batchE06 = graft.queries.EventPipeline.gapQuantiles(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val src = MemoryStream[Event]
    val q = adjacentPairs(src.toDS(), quietMinutes = 30)
      .writeStream.format("memory").queryName("adj_pairs")
      .outputMode(OutputMode.Append).start()
    try {
      def e(id: Long, u: Long, t: String, m: Long) =
        Event(id, u, t, 1.0, new Timestamp(1700000000000L + m * 60000L))
      // first batch arrives REORDERED within the watermark bound
      src.addData(e(2, 1, "click", 3), e(1, 1, "view", 0),
        e(5, 2, "click", 1), e(6, 2, "click", 2), e(8, 3, "view", 7))
      q.processAllAvailable()
      src.addData(e(3, 1, "view", 10), e(7, 2, "purchase", 60))
      q.processAllAvailable()
      // the 2-hour-later event: user 1's chain must survive the quiet
      // timeout that fired in between
      src.addData(e(4, 1, "purchase", 130))
      q.processAllAvailable()
      // advance the watermark far enough to seal everything
      src.addData(e(99, 9, "view", 600))
      q.processAllAvailable()
      src.addData(e(100, 9, "view", 700))
      q.processAllAvailable()
      val pairs = spark.table("adj_pairs").as[AdjPair].collect().toSeq
        .filterNot(_.userId == 9L)
      assert(pairs.length === 5, s"expected 5 sealed pairs, got $pairs")
      val folded08 = transitionsAt(pairs)
        .map(t => (t.prevType, t.nextType) -> ((t.nTransitions, t.pPpm)))
        .toMap
      assert(folded08 === batchE08,
        "streamed pair fold must equal the batch e08 matrix")
      val folded06 = gapQuantilesAt(pairs)
        .map(g => g.eventType ->
          ((g.nGaps, g.minGapS, g.p50GapS, g.p95GapS, g.maxGapS))).toMap
      assert(folded06 === batchE06,
        "streamed gap fold must equal the batch e06 quantiles")
    } finally q.stop()
  }

  test("streaming user activity folds to the batch e10 rolling features, " +
      "incl. a gap wider than the 7-day window and a late arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    // user 1: days 0,1,3,10 — day 10 is past day 3's 7-day horizon, so
    // its window must reset; user 2: days 5,5,8 (multi-event day);
    // a LATE day-6 arrival for user 1 lands inside day 10's window
    var id = 0L
    def e(u: Long, d: Long) = { id += 1; (id, u, d) }
    val early = Seq(e(1, 0), e(1, 1), e(1, 3), e(1, 10),
      e(2, 5), e(2, 5), e(2, 8))
    val late = Seq(e(1, 6))
    val all = early ++ late
    val dir = java.nio.file.Files.createTempDirectory("graft-e10s").toString
    all.toDF("event_id", "user_id", "d")
      .selectExpr("event_id", s"d * $day * 1000000000 AS ts", "user_id",
        "'click' AS event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.EventPipeline.rollingFeatures(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val src = MemoryStream[Event]
    val q = EventStreams.userActivity(src.toDS())
      .writeStream.format("memory").queryName("user_activity_e10")
      .outputMode(OutputMode.Update).start()
    try {
      def evs(rows: Seq[(Long, Long, Long)]) = rows.map { case (i, u, d) =>
        Event(i, u, "click", 1.0, new Timestamp(d * day * 1000L)) }
      src.addData(evs(early): _*)
      q.processAllAvailable()
      src.addData(evs(late): _*)
      q.processAllAvailable()
      val latest = spark.table("user_activity_e10").as[UserActivity]
        .collect().groupBy(_.userId)
        .map { case (_, rows) => rows.maxBy(_.buckets.map(_.n).sum) }
        .toSeq
      val folded = latest.flatMap(EventStreams.rollingFeaturesAt)
        .map(f => (f.userId, f.day) -> ((f.nDay, f.n7d, f.activeDays7d)))
        .toMap
      assert(folded === batch,
        "streamed activity fold must equal the batch e10 feature rows")
    } finally q.stop()
  }

  test("asof match survives a quiet-timeout flush: post-gap purchase still matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = asofJoin(src.toDS(), quietMinutes = 30)
      .writeStream.format("memory").queryName("asof_idle")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 views at 10', then goes idle; unrelated traffic pushes
      // the watermark past 10' + 30' quiet so the timeout FLUSHES the
      // user (the eviction bug would drop the last-view scalars here)
      src.addData(Event(1L, 1L, "view", 1.0, ts(10)))
      q.processAllAvailable()
      src.addData(ev(900, 99L, 60)); q.processAllAvailable()
      src.addData(ev(901, 99L, 100)); q.processAllAvailable() // timeout fires
      // the user returns: the purchase must still match the pre-gap view
      src.addData(Event(2L, 1L, "purchase", 1.0, ts(120)))
      q.processAllAvailable()
      src.addData(ev(902, 99L, 200)); q.processAllAvailable() // seal it
      val got = spark.table("asof_idle").as[AsofMatch].collect()
        .map(r => r.purchaseId -> ((r.viewId, r.gapUs))).toMap
      assert(got === Map(2L -> ((Some(1L), Some(110L * 60000000L)))),
        s"post-gap purchase must match the pre-gap view: $got")
    } finally q.stop()
  }

  test("asof retention bound evicts idle state; inside the bound it chains") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    // user 1's retention (60') elapses before the first quiet fire →
    // evicted at that fire; user 2's (300') has not → kept, then
    // evicted by the re-armed retention timeout
    val q = asofJoin(src.toDS(), quietMinutes = 30,
        retentionMinutes = Some(60))
      .writeStream.format("memory").queryName("asof_evict")
      .outputMode(OutputMode.Append).start()
    val q2 = asofJoin(src.toDS(), quietMinutes = 30,
        retentionMinutes = Some(300))
      .writeStream.format("memory").queryName("asof_keep300")
      .outputMode(OutputMode.Append).start()
    try {
      def step(es: Event*): Unit = {
        src.addData(es: _*); q.processAllAvailable(); q2.processAllAvailable()
      }
      step(Event(1L, 1L, "view", 1.0, ts(0)),
        Event(100L, 1L, "purchase", 1.0, ts(5)))
      step(ev(900, 99L, 200)) // wm → 190 after this batch
      // quiet fire (armed 5'+30'): wm 190' ≥ 5'+60' evicts in q;
      // 190' < 5'+300' keeps in q2 (re-armed at 305')
      step(ev(901, 99L, 210))
      // the user returns above the watermark (200'): q lost the view,
      // q2 still chains to it
      step(Event(101L, 1L, "purchase", 1.0, ts(205)))
      step(ev(902, 99L, 600)) // wm → 590
      // seal+quiet fire for the return; q2's retention (205'+300')
      // also elapses here → evicted after flushing
      step(ev(903, 99L, 610))
      // a third purchase: now BOTH queries have lost the view
      step(Event(102L, 1L, "purchase", 1.0, ts(615)))
      step(ev(904, 99L, 1000))
      step(ev(905, 99L, 1010)) // seal + quiet fire
      val evicted = spark.table("asof_evict").as[AsofMatch].collect()
        .map(r => r.purchaseId -> r.viewId).toMap
      val kept = spark.table("asof_keep300").as[AsofMatch].collect()
        .map(r => r.purchaseId -> r.viewId).toMap
      assert(evicted === Map(100L -> Some(1L), 101L -> None, 102L -> None),
        s"60' retention must drop the pre-gap view: $evicted")
      assert(kept === Map(100L -> Some(1L), 101L -> Some(1L), 102L -> None),
        s"300' retention must chain at 205' and evict by 615': $kept")
    } finally { q.stop(); q2.stop() }
  }

  test("funnel retention bound drops the machine; eviction re-report is identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = funnel(src.toDS(), horizonMinutes = 24 * 60, quietMinutes = 30,
        retentionMinutes = Some(60))
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode(OutputMode.Append).start()
    try {
      def step(es: Event*): Unit = { src.addData(es: _*); q.processAllAvailable() }
      step(Event(1L, 1L, "view", 1.0, ts(0)),
        Event(2L, 1L, "click", 1.0, ts(2)),
        Event(3L, 1L, "purchase", 1.0, ts(4)))
      step(ev(900, 99L, 200)) // wm → 190
      step(ev(901, 99L, 210)) // quiet fire: report + evict (190 ≥ 4+60)
      // the user returns with click+purchase but NO view: with the
      // 24 h horizon an un-evicted machine would chain them off the
      // 0' view; the evicted machine has no view, so no new report
      step(Event(4L, 1L, "click", 1.0, ts(205)),
        Event(5L, 1L, "purchase", 1.0, ts(207)))
      step(ev(902, 99L, 600))
      step(ev(903, 99L, 610)) // quiet fire for the return
      val got = spark.table("funnel_evict").as[FunnelReport].collect()
        .filter(_.userId == 1L)
      assert(got.toSeq === Seq(FunnelReport(1L, microsOf(ts(0)),
        Some(microsOf(ts(2))), Some(microsOf(ts(4))), 1L)),
        s"evicted funnel must not chain the post-gap click: ${got.toSeq}")
    } finally q.stop()
  }

  test("funnel keep-then-evict second fire re-emits the same cumulative report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = funnel(src.toDS(), quietMinutes = 30,
        retentionMinutes = Some(300))
      .writeStream.format("memory").queryName("funnel_refire")
      .outputMode(OutputMode.Append).start()
    try {
      def step(es: Event*): Unit = { src.addData(es: _*); q.processAllAvailable() }
      step(Event(1L, 1L, "view", 1.0, ts(0)))
      step(ev(900, 99L, 200)) // wm → 190
      step(ev(901, 99L, 210)) // quiet fire: report #1, keep (190 < 300)
      step(ev(902, 99L, 600)) // wm → 590 (past 0'+300')
      step(ev(903, 99L, 610)) // retention fire: report #2 + evict
      val got = spark.table("funnel_refire").as[FunnelReport].collect()
        .filter(_.userId == 1L)
      assert(got.length === 2 && got.toSet.size === 1,
        s"eviction must re-emit one content-identical report: ${got.toSeq}")
      assert(got.head === FunnelReport(1L, microsOf(ts(0)), None, None, 0L))
    } finally q.stop()
  }

  test("decayed-engagement retention bound restarts an evicted user's counters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = decayedEngagement(src.toDS(), retentionMinutes = Some(60))
      .writeStream.format("memory").queryName("eng_evict")
      .outputMode(OutputMode.Update).start()
    try {
      def step(es: Event*): Unit = { src.addData(es: _*); q.processAllAvailable() }
      step((1L to 6L).map(i => ev(i, 1L, i - 1)): _*) // 6 events, last at 5'
      step(ev(900, 99L, 200)) // wm → 190 (past 5' + 60')
      step(ev(901, 99L, 210)) // retention timeout fires: re-emit + evict
      step(ev(7, 1L, 300))    // the user returns AFTER eviction
      val got = spark.table("eng_evict").as[EngagementBuckets].collect()
        .filter(_.userId == 1L)
      assert(got.exists(_.nEvents == 6L), "pre-eviction histogram emitted")
      assert(got.exists(r => r.nEvents == 1L && r.buckets.length == 1),
        s"post-eviction return must restart from zero: ${got.toSeq}")
      assert(!got.exists(_.nEvents == 7L),
        "state must NOT have survived the retention bound")
    } finally q.stop()
  }

  test("retention arms from the RUNNING max event time, not the last batch's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = decayedEngagement(src.toDS(), retentionMinutes = Some(60))
      .writeStream.format("memory").queryName("eng_runmax")
      .outputMode(OutputMode.Update).start()
    try {
      def step(es: Event*): Unit = { src.addData(es: _*); q.processAllAvailable() }
      step(ev(1, 1L, 100)) // newest event: eviction due at 160'
      step(ev(900, 99L, 105)) // wm → 95
      // an out-of-order TRAILING arrival (admitted above wm 95, behind
      // the user's newest 100'): arming from this batch's max alone
      // would pull eviction forward to 156'
      step(ev(2, 1L, 96))
      step(ev(901, 99L, 168)) // wm → 158: must NOT fire (158 < 160)
      step(ev(902, 99L, 169)) // a batch-max-armed 156' would fire here
      // the user returns before 160': state must still be alive
      step(ev(3, 1L, 165))
      val got = spark.table("eng_runmax").as[EngagementBuckets].collect()
        .filter(_.userId == 1L)
      assert(got.exists(_.nEvents == 3L),
        s"an out-of-order trailing arrival must not shorten retention: ${got.toSeq}")
    } finally q.stop()
  }

  test("user-activity retention bound restarts an evicted user's cohort") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = userActivity(src.toDS(), retentionMinutes = Some(60))
      .writeStream.format("memory").queryName("act_evict")
      .outputMode(OutputMode.Update).start()
    try {
      def step(es: Event*): Unit = { src.addData(es: _*); q.processAllAvailable() }
      step(ev(1, 1L, 0), ev(2, 1L, 5))
      step(ev(900, 99L, 200)) // wm → 190 (past 5' + 60')
      step(ev(901, 99L, 210)) // retention timeout: re-emit + evict
      // the user returns on a LATER calendar day: an un-evicted state
      // would keep cohort = the old min day and re-state both days
      val laterDay = 2000L // crosses at least one calendar-day boundary
      step(ev(3, 1L, laterDay))
      val day0 = 1700000000000L / 86400000L
      val dayLater = (1700000000000L + laterDay * 60000L) / 86400000L
      assert(dayLater > day0, "the return must land on a later calendar day")
      val got = spark.table("act_evict").as[UserActivity].collect()
        .filter(_.userId == 1L)
      assert(got.exists(r => r.cohortDay == day0 && r.buckets.map(_.n).sum == 2),
        "pre-eviction activity emitted with the original cohort")
      assert(got.exists(r => r.cohortDay == dayLater && r.buckets.length == 1),
        s"post-eviction return must restart the cohort: ${got.toSeq}")
      assert(!got.exists(r => r.cohortDay == day0 && r.buckets.length == 2),
        "state must NOT have survived the retention bound")
    } finally q.stop()
  }

  test("adjacent-pair retention bound loses exactly the boundary pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = adjacentPairs(src.toDS(), quietMinutes = 30,
        retentionMinutes = Some(60))
      .writeStream.format("memory").queryName("adj_evict")
      .outputMode(OutputMode.Append).start()
    try {
      def step(es: Event*): Unit = { src.addData(es: _*); q.processAllAvailable() }
      step(ev(1, 1L, 0), ev(2, 1L, 5))
      step(ev(900, 99L, 200)) // wm → 190
      step(ev(901, 99L, 210)) // quiet fire: evict (190 ≥ 5+60)
      step(ev(3, 1L, 205), ev(4, 1L, 212))
      step(ev(902, 99L, 600))
      step(ev(903, 99L, 610)) // seal + quiet fire for the return
      val got = spark.table("adj_evict").as[AdjPair].collect()
        .filter(_.userId == 1L).map(_.gapUs).sorted.toSeq
      // (0',5') and (205',212') survive; the (5',205') boundary pair
      // is the documented retention loss
      assert(got === Seq(5L * 60000000L, 7L * 60000000L),
        s"only the boundary pair may be lost: $got")
    } finally q.stop()
  }

  test("funnel chains across a quiet gap; final report per user equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: view@0, quiet gap (> 30' quiet, < 600' horizon), then
    // click@120 + purchase@125 — the click must chain off the PRE-GAP
    // view, and the second quiet report supersedes the first
    val log = Seq(
      (1L, 1L, "view", 0L),
      (2L, 1L, "click", 120L), (3L, 1L, "purchase", 125L))
    val src = MemoryStream[Event]
    val q = funnel(src.toDS(), horizonMinutes = 600, quietMinutes = 30)
      .writeStream.format("memory").queryName("funnel_gap")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1L, 1L, "view", 1.0, ts(0)))
      q.processAllAvailable()
      // wm pushers: fire user 1's first quiet timeout (0' + 30')
      src.addData(ev(990, 99L, 60)); q.processAllAvailable()
      src.addData(ev(991, 99L, 100)); q.processAllAvailable()
      // the user returns inside the horizon
      src.addData(Event(2L, 1L, "click", 1.0, ts(120)),
        Event(3L, 1L, "purchase", 1.0, ts(125)))
      q.processAllAvailable()
      // fire the second quiet timeout (125' + 30' → needs wm > 155')
      src.addData(ev(992, 99L, 300)); q.processAllAvailable()
      src.addData(ev(993, 99L, 500)); q.processAllAvailable()

      val got = spark.table("funnel_gap").as[FunnelReport].collect()
        .filter(_.userId == 1L)
        .map(r => (r.firstViewUs, r.firstQualClickUs, r.firstConversionUs,
          r.nConversions)).toSet
      val v0 = 1700000000000000L
      val viewOnly = (v0, None, None, 0L)
      val full = (v0, Some(v0 + 120L * 60000000L),
        Some(v0 + 125L * 60000000L), 1L)
      assert(got === Set(viewOnly, full),
        s"expected the pre-gap report then the cumulative one: $got")

      // the cumulative report IS the batch row over the same events
      val d = java.nio.file.Files.createTempDirectory("graft-sfgap").toString
      log.map { case (id, u, t, m) =>
        (id, 1700000000000000000L + m * 60000000000L, u, t) }
        .toDF("event_id", "ts_ns", "user_id", "event_type")
        .selectExpr("event_id", "ts_ns AS ts", "user_id", "event_type",
          "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      val want = graft.queries.EventPipeline
        .funnelWith(spark, d, 600L * 60000000L).collect()
        .map(r => (r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4))).toSet
      assert(want === Set(full))
    } finally q.stop()
  }

  test("funnel does NOT chain across a gap longer than the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // view@0, then a click@120 with horizon 60' — the kept pre-gap
    // scalars must still be horizon-GATED: keeping state across the
    // quiet timeout is for legal chains only, never a license to
    // qualify a click whose predecessor is out of range
    val src = MemoryStream[Event]
    val q = funnel(src.toDS(), horizonMinutes = 60, quietMinutes = 30)
      .writeStream.format("memory").queryName("funnel_horizon")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1L, 1L, "view", 1.0, ts(0)))
      q.processAllAvailable()
      src.addData(ev(990, 99L, 60)); q.processAllAvailable()
      src.addData(ev(991, 99L, 100)); q.processAllAvailable() // 1st quiet
      src.addData(Event(2L, 1L, "click", 1.0, ts(120)),
        Event(3L, 1L, "purchase", 1.0, ts(125)))
      q.processAllAvailable()
      src.addData(ev(992, 99L, 300)); q.processAllAvailable()
      src.addData(ev(993, 99L, 500)); q.processAllAvailable() // 2nd quiet
      val got = spark.table("funnel_horizon").as[FunnelReport].collect()
        .filter(_.userId == 1L)
        .map(r => (r.firstViewUs, r.firstQualClickUs, r.firstConversionUs,
          r.nConversions)).toSet
      // both quiet reports are view-only: the 120' click is 120' > 60'
      // past the view, so it never qualifies and the purchase has no
      // qualifying click to convert from
      assert(got === Set((1700000000000000L, None, None, 0L)),
        s"out-of-horizon click must not chain: $got")
    } finally q.stop()
  }

  test("sessionize is batch-boundary independent: a late bridging event merges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = sessionize(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_bridge")
      .outputMode(OutputMode.Append).start()
    try {
      // events 0' and 25' in batch 1; 60' in batch 2 (an in-batch gap
      // of 35' that an eager close would split on); then a LATE but
      // admissible 52' (wm = 60' − 10' = 50') that bridges both
      // halves: 25→52 = 27' and 52→60 = 8', both ≤ the 30' gap
      src.addData(ev(1, 1, 0), ev(2, 1, 25)); q.processAllAvailable()
      src.addData(ev(3, 1, 60)); q.processAllAvailable()
      src.addData(ev(4, 1, 52)); q.processAllAvailable()
      // advance wm past 60' + 30' to close, then once more to fire
      src.addData(ev(900, 99L, 120)); q.processAllAvailable()
      src.addData(ev(901, 99L, 200)); q.processAllAvailable()
      val got = spark.table("sess_bridge").as[Session].collect()
        .filter(_.userId == 1L)
      assert(got.toSeq === Seq(Session(1L, ts(0), ts(60), 4, 4.0)),
        s"the late 52' event must bridge into ONE session: ${got.toSeq}")
    } finally q.stop()
  }

  test("sessionize with watermark delay > gap does not merge backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = sessionize(src.toDS(), gapMinutes = 30,
        watermark = "120 minutes")
      .writeStream.format("memory").queryName("sess_back")
      .outputMode(OutputMode.Append).start()
    try {
      // 120' arrives first; a late 55' (admissible under the 2 h
      // watermark) precedes it by 65' > the 30' gap — batch puts them
      // in SEPARATE sessions; the old backward-extend merged them
      src.addData(ev(1, 1, 120)); q.processAllAvailable()
      src.addData(ev(2, 1, 55)); q.processAllAvailable()
      src.addData(ev(900, 99L, 400)); q.processAllAvailable()
      src.addData(ev(901, 99L, 420)); q.processAllAvailable()
      val got = spark.table("sess_back").as[Session].collect()
        .filter(_.userId == 1L).sortBy(_.start.getTime)
      assert(got.toSeq === Seq(
        Session(1L, ts(55), ts(55), 1, 1.0),
        Session(1L, ts(120), ts(120), 1, 1.0)),
        s"a 65' gap must split even when the event arrives late: ${got.toSeq}")
    } finally q.stop()
  }

  test("non-positive retentionMinutes fails fast at construction, not mid-stream") {
    import spark.implicits._
    // Some(0) (or negative) would otherwise arm setTimeoutTimestamp at
    // or below the current watermark and throw inside the FIRST arming
    // batch — all five retention-capable operators must instead reject
    // the knob before any query starts.
    val empty = spark.emptyDataset[Event]
    val builds: Seq[(String, Option[Long] => Any)] = Seq(
      "funnel" -> (r => funnel(empty, retentionMinutes = r)),
      "asofJoin" -> (r => asofJoin(empty, retentionMinutes = r)),
      "adjacentPairs" -> (r => adjacentPairs(empty, retentionMinutes = r)),
      "decayedEngagement" -> (r => decayedEngagement(empty, retentionMinutes = r)),
      "userActivity" -> (r => userActivity(empty, retentionMinutes = r)))
    for ((name, build) <- builds; bad <- Seq(Some(0L), Some(-5L))) {
      val e = intercept[IllegalArgumentException](build(bad))
      assert(e.getMessage.contains("retentionMinutes"),
        s"$name with $bad must name the knob: ${e.getMessage}")
    }
    // the valid shapes still construct
    builds.foreach { case (_, build) => build(None); build(Some(1L)) }
  }
}
