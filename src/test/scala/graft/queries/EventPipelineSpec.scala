package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.SimpleMode

/** Semantic checks for the temporal event operators on a tiny planted
  * event log with every edge the oracle compare can't isolate: as-of
  * ties (equal timestamps, inclusive semantics, event-id tie-break),
  * purchases with no prior view, range-window boundary hits/misses
  * across bucket borders, and session-gap boundaries. Plus plan pins
  * for the scale claims (single shuffle, no nested-loop join).
  */
class EventPipelineSpec extends SparkSpec {

  // Planted log (ts in seconds, stored as nanos like ScaleGen output):
  //   user 1: p22@900, v10@1000, p21@1500, v11@2000, p20@2000, c25@3900
  //   user 2: v12@5000, v13@5000, p23@6000, p24@9000
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events").toString
    val rows = Seq(
      (22L, 900L, 1L, "purchase", 5.0),
      (10L, 1000L, 1L, "view", 1.0),
      (21L, 1500L, 1L, "purchase", 6.0),
      (11L, 2000L, 1L, "view", 2.0),
      (20L, 2000L, 1L, "purchase", 7.0),
      (25L, 3900L, 1L, "click", 0.5),
      (12L, 5000L, 2L, "view", 3.0),
      (13L, 5000L, 2L, "view", 4.0),
      (23L, 6000L, 2L, "purchase", 8.0),
      (24L, 9000L, 2L, "purchase", 9.0))
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .selectExpr("event_id", "sec * 1000000000 AS ts", "user_id",
        "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def secUs(s: Long): Long = s * 1000000L

  test("asof join: inclusive ties, event-id tie-break, null when no prior view") {
    val got = EventPipeline.asofJoin(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long]))).toMap
    assert(got === Map(
      20L -> (Some(11L), Some(0L)), // view at the SAME ts counts (<=)
      21L -> (Some(10L), Some(secUs(500))),
      22L -> (None, None), // no prior view → null match
      23L -> (Some(13L), Some(secUs(1000))), // equal-ts views → max id
      24L -> (Some(13L), Some(secUs(4000)))))
  }

  test("sessionize: 30-min strict gap, per-user session stats") {
    val got = EventPipeline.sessionize(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // user 1: [900..2000] (5 events, 1100 s) then 1900 s gap > 1800 s
    // → [3900] (1 event); user 2: [5000..6000] (3 events, 1000 s) then
    // 3000 s gap → [9000]
    assert(got === Map(
      1L -> ((2L, 6L, secUs(1100), 5L)),
      2L -> ((2L, 4L, secUs(1000), 3L))))
  }

  test("gap quantiles (e06): per-type integer-rank quantiles of inter-event gaps") {
    val got = EventPipeline.gapQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (1 to 5).map(r.getLong).toSeq).toMap
    // user 1 order (ts, id): 22@900,10@1000,21@1500,11@2000,20@2000,25@3900
    //   → gaps: view 100, purchase 500, view 500, purchase 0, click 1900
    // user 2: 12@5000,13@5000,23@6000,24@9000
    //   → gaps: view 0, purchase 1000, purchase 3000
    // (n_gaps, min, p50, p95, max) per type, rank method ⌈p·n⌉
    assert(got === Map(
      "click" -> Seq(1L, 1900L, 1900L, 1900L, 1900L),
      "purchase" -> Seq(4L, 0L, 500L, 3000L, 3000L),
      "view" -> Seq(3L, 0L, 100L, 500L, 500L)))
  }

  test("range join: 1h lookback counts, zero kept, bucket-border views found") {
    val got = EventPipeline.rangeJoinViews(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // p23@6000 is in bucket 1 while its views sit at 5000 (bucket 1)
    // — found via the build side's (b, b+1) expansion; p24@9000 has
    // candidates in its joined buckets but all outside the window →
    // count 0, row kept
    assert(got === Map(20L -> 2L, 21L -> 1L, 22L -> 0L, 23L -> 2L, 24L -> 0L))
  }

  test("json props: extraction, deciles, negative-floor cents, junk JSON") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-e04").toString
    // values are exact binary fractions so floor(value*100) is exact
    Seq(
      (1L, 100L, 1L, "view", 1.25, """{"k": 5}"""),
      (2L, 200L, 1L, "view", 2.5, """{"k": 15}"""),
      (3L, 300L, 2L, "view", -3.25, """{"k": 19}"""),
      (4L, 400L, 2L, "purchase", 4.0, """{"j": 2}"""), // no k field
      (5L, 500L, 2L, "purchase", 1.0, null), // null props
      (6L, 600L, 2L, "purchase", 2.0, "not json")) // unparseable
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "sec * 1000000000 AS ts", "user_id",
        "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventPipeline.jsonProps(spark, d).collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Long])) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got === Map(
      ("view", Some(0L)) -> ((1L, 1.25, 1.25, 125L)),
      ("view", Some(1L)) -> ((2L, -3.25, 2.5, -325L + 250L)),
      // every k-less shape (missing field, null, junk) lands in one
      // null-decile group — extraction failures are visible, not lost
      ("purchase", None) -> ((3L, 1.0, 4.0, 700L))))
  }

  test("funnel: horizon-inclusive hops, equal-ts chains, unqualified stages") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-e05").toString
    val H = 86400L // horizon in seconds
    Seq(
      // user 3: whole funnel at ONE timestamp — tie-break must let
      // the view qualify the click and the click convert the purchase
      (30L, 1000L, 3L, "view"), (31L, 1000L, 3L, "click"),
      (32L, 1000L, 3L, "purchase"),
      // user 4: every hop exactly AT the horizon (inclusive), then a
      // second purchase one second past it (no other qualified click)
      (40L, 0L, 4L, "view"), (41L, H, 4L, "click"),
      (42L, 2 * H, 4L, "purchase"), (43L, 2 * H + 1, 4L, "purchase"),
      // user 5: click BEFORE any view never qualifies
      (50L, 500L, 5L, "click"), (51L, 1000L, 5L, "view"),
      (52L, 2000L, 5L, "purchase"),
      // user 6: click one second past the view horizon
      (60L, 0L, 6L, "view"), (61L, H + 1, 6L, "click"),
      // user 7: no view at all → not a funnel entrant, row dropped
      (70L, 100L, 7L, "click"), (71L, 200L, 7L, "purchase"))
      .toDF("event_id", "sec", "user_id", "event_type")
      .selectExpr("event_id", "sec * 1000000000 AS ts", "user_id",
        "event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventPipeline.funnel(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4)))).toMap
    assert(got === Map(
      3L -> ((secUs(1000), Some(secUs(1000)), Some(secUs(1000)), 1L)),
      4L -> ((0L, Some(secUs(H)), Some(secUs(2 * H)), 1L)),
      5L -> ((secUs(1000), None, None, 0L)),
      6L -> ((0L, None, None, 0L))))
  }

  test("plans: asof/sessionize are single-shuffle, range join is never BNLJ") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(SimpleMode)

    val asof = plan(EventPipeline.asofJoin(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(asof).size === 1,
      "asof join must shuffle exactly once (on user_id)")
    assert(!asof.contains("Join"), "asof must be a window, not a join")
    assert(asof.contains("TakeOrderedAndProject"))

    val sess = plan(EventPipeline.sessionize(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(sess).size === 1,
      "session window + both aggregates must reuse the user_id partitioning")

    val range = plan(EventPipeline.rangeJoinViews(spark, dir))
    assert(!range.contains("BroadcastNestedLoopJoin") &&
      !range.contains("CartesianProduct"),
      "interval predicate must be bucketed into an equi-join")

    val fun = plan(EventPipeline.funnel(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(fun).size === 1,
      "all funnel stages and the report must reuse the user_id partitioning")
    assert(!fun.contains("Join"), "the funnel must be windows, not joins")

    val gaps = plan(EventPipeline.gapQuantiles(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(gaps).size === 3,
      "e06 is exactly three shuffles: the user_id lag window, the " +
        "(event_type, gap_s) histogram groupBy, then the bounded " +
        "per-type histogram exchange the report reuses")
    assert(!gaps.contains("row_number"),
      "e06 must never rank-sort raw gap rows — quantiles come from " +
        "the distinct-value histogram")
    assert(!gaps.contains("Join"), "e06 needs no join")
  }

  test("event transitions (e08): Markov counts respect equal-ts event-id ordering") {
    // planted log, user 1: p22@900 v10@1000 p21@1500 v11@2000 p20@2000
    // c25@3900 (v11 before p20 at the SAME ts via event_id) ⇒
    // p→v, v→p, p→v, v→p, p→c; user 2: v12@5000 v13@5000 p23@6000
    // p24@9000 ⇒ v→v, v→p, p→p
    val got = EventPipeline.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_transitions"), r.getAs[Long]("p_ppm")))
    assert(got.toSeq === Seq(
      ("purchase", "click", 1L, 250000L),
      ("purchase", "purchase", 1L, 250000L),
      ("purchase", "view", 2L, 500000L),
      ("view", "purchase", 3L, 750000L),
      ("view", "view", 1L, 250000L)))
  }

  test("decayed engagement (e07): weekly halving, 13-week zero horizon, exact sums") {
    // Planted log spanning weeks of age relative to the newest event
    // (day 100): weights must be 4096 ≫ (age_days div 7), zero from
    // week 13, n_recent counts age < 7 days, ties order by user_id.
    val d = java.nio.file.Files.createTempDirectory("graft-e07").toString
    val day = 86400L
    val rows = Seq(
      // (event_id, day-of-event, user_id, type) — ref is day 100
      (1L, 100L, 1L, "view"),     // age 0d  -> w 4096, recent
      (2L, 97L, 1L, "click"),     // age 3d  -> w 4096, recent
      (3L, 92L, 1L, "purchase"),  // age 8d  -> w 2048 (week 1)
      (4L, 86L, 2L, "view"),      // age 14d -> w 1024 (week 2)
      (5L, 78L, 2L, "view"),      // age 22d -> w 512  (week 3)
      (6L, 8L, 2L, "purchase"),   // age 92d -> w 0    (week 13: horizon)
      (7L, 100L, 3L, "purchase")) // age 0d  -> w 4096, recent
    import spark.implicits._
    rows.toDF("event_id", "d", "user_id", "event_type")
      .selectExpr("event_id", s"d * $day * 1000000000 AS ts", "user_id",
        "event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventPipeline.decayedEngagement(spark, d).collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_recent"),
          r.getAs[Long]("last_seen_days"), r.getAs[Long]("engagement_q"),
          r.getAs[Double]("engagement"), r.getAs[Long]("purchase_q"))))
    // engagement_q: u1 = 4096+4096+2048, u2 = 1024+512+0, u3 = 4096
    assert(got.toSeq === Seq(
      1L -> ((3L, 2L, 0L, 10240L, 2.5d, 2048L)),
      3L -> ((1L, 1L, 0L, 4096L, 1.0d, 4096L)),
      2L -> ((3L, 0L, 14L, 1536L, 0.375d, 0L))))
  }

  test("daily anomaly (e09): |z|>2 spike flagged, zero-variance never flags") {
    // click: 5 events/day for days 0..8, 50 on day 9 →
    //   n=10, s1=95, s2=2725; day 9 dev = 50·10−95 = 405,
    //   405² = 164025 > 4·(10·2725−95²) = 72900 → flagged;
    //   quiet days dev = −45, 2025 < 72900 → not flagged.
    // steady: 7/day for 3 days → variance 0, dev 0, 0 > 0 false.
    val d = java.nio.file.Files.createTempDirectory("graft-e09").toString
    import spark.implicits._
    var id = 0L
    val rows =
      (0 to 9).flatMap { day =>
        val n = if (day == 9) 50 else 5
        (1 to n).map { k =>
          id += 1
          (id, day * 86400L + k, 1L, "click", 1.0)
        }
      } ++
        (0 to 2).flatMap { day =>
          (1 to 7).map { k =>
            id += 1
            (id, day * 86400L + k, 2L, "steady", 1.0)
          }
        }
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .selectExpr("event_id", "sec * 1000000000 AS ts", "user_id",
        "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventPipeline.dailyAnomaly(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("click", 9L)) === ((50L, 405L, 1L)))
    (0L to 8L).foreach { day =>
      assert(got(("click", day)) === ((5L, -45L, 0L)))
    }
    (0L to 2L).foreach { day =>
      assert(got(("steady", day)) === ((7L, 0L, 0L)))
    }
    assert(got.size === 13)
    // plan: groupBy compaction then the bounded per-type window —
    // no join anywhere
    val p = EventPipeline.dailyAnomaly(spark, d)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("Join"), "e09 needs no join")
    assert(p.contains("partial_count"),
      "the day-count groupBy must compact map-side")
  }

  test("rolling features (e10): RANGE frame over gap days, one user shuffle") {
    val d = java.nio.file.Files.createTempDirectory("graft-e10").toString
    import spark.implicits._
    // user 1: 3 events day 0, 1 event day 2, 2 events day 8
    //   → day 8's [2..8] window sees day 2 but not day 0
    // user 2: day 0 and day 7 — day 7's [1..7] window excludes day 0
    val rows = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 2L), (5L, 8L), (6L, 8L))
      .map { case (id, day) => (id, day, 1L) } ++
      Seq((7L, 0L, 2L), (8L, 7L, 2L))
    rows.toDF("event_id", "d", "user_id")
      .selectExpr("event_id", "d * 86400 * 1000000000 AS ts", "user_id",
        "'view' AS event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventPipeline.rollingFeatures(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 0L, 3L, 3L, 1L),
      (1L, 2L, 1L, 4L, 2L),
      (1L, 8L, 2L, 3L, 2L),
      (2L, 0L, 1L, 1L, 1L),
      (2L, 7L, 1L, 1L, 1L)))
    // one user-keyed hash exchange: compaction groupBy and the RANGE
    // window both reuse the explicit repartition
    val p = EventPipeline.rollingFeatures(spark, d)
      .queryExecution.explainString(SimpleMode)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      "groupBy and window must share the user_id exchange")
    assert(!p.contains("Join"), "e10 needs no join")
  }

  test("cohort matrix (e11): offsets, sizes, exact ppm, two shared exchanges") {
    val d = java.nio.file.Files.createTempDirectory("graft-e11").toString
    import spark.implicits._
    // user 1: days 0 (×2), 1, 3; user 2: days 0, 1 (×2) → cohort 0
    // user 3: days 1, 3 → cohort 1
    val rows = Seq(
      (1L, 0L, 1L), (2L, 0L, 1L), (3L, 1L, 1L), (4L, 3L, 1L),
      (5L, 0L, 2L), (6L, 1L, 2L), (7L, 1L, 2L),
      (8L, 1L, 3L), (9L, 3L, 3L))
    rows.toDF("event_id", "d", "user_id")
      .selectExpr("event_id", "d * 86400 * 1000000000 AS ts", "user_id",
        "'view' AS event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventPipeline.cohortMatrix(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (0L, 0L, 2L, 3L, 2L, 1000000L),
      (0L, 1L, 2L, 3L, 2L, 1000000L),
      (0L, 3L, 1L, 1L, 2L, 500000L),
      (1L, 0L, 1L, 1L, 1L, 1000000L),
      (1L, 2L, 1L, 1L, 1L, 1000000L)))
    // exactly two data exchanges: user_id (compaction + MIN window),
    // cohort_day (triangle groupBy + cohort-size window)
    val p = EventPipeline.cohortMatrix(spark, d)
      .queryExecution.explainString(SimpleMode)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      "compaction/window and triangle/size-window must share exchanges")
    assert(!p.contains("Join"), "e11 needs no join")
  }
}
