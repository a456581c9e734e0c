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

  test("range join: 1h lookback counts, zero kept, bucket-border views found") {
    val got = EventPipeline.rangeJoinViews(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // p23@6000 is in bucket 1 while its views sit at 5000 (bucket 1)
    // — found via the build side's (b, b+1) expansion; p24@9000 has
    // candidates in its joined buckets but all outside the window →
    // count 0, row kept
    assert(got === Map(20L -> 2L, 21L -> 1L, 22L -> 0L, 23L -> 2L, 24L -> 0L))
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
  }
}
