package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Declared oracle queries for the DQ engine operators (SURVEY.md §2.2
  * P1–P5, R1–R3, R5; reference `src/dq.py`). These mirror what
  * [[graft.dq.Profiler]] / [[graft.dq.DqEngine]] compute, expressed as
  * single deterministic DataFrames the driver can hash against DuckDB.
  *
  * Float determinism: mean and population std are derived from EXACT
  * decimal sums (events.value is 2-decimal money) with the SAME
  * expression tree on both sides — `mean = sm/n`,
  * `std = sqrt((smsq - sm*sm/n)/n)` — so both engines do identical
  * IEEE double arithmetic on identical inputs. Percentiles are exact
  * linear-interpolation on sorted doubles in both engines.
  */
object DqQueries extends graft.Registry {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  private val decV: Column = col("value").cast("decimal(18,2)")

  /** Shared stats row: n, exact-decimal sum and sum-of-squares of
    * events.value, cast to double. */
  private def valueStats(e: DataFrame): DataFrame =
    e.agg(
      count(lit(1)).as("n"),
      sum(decV).cast("double").as("sm"),
      sum(decV * decV).cast("double").as("smsq"))

  private val statsSqlCte: String =
    """a AS (
      |  SELECT COUNT(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sm,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))
      |                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS smsq
      |  FROM events)""".stripMargin

  // Shared constants interpolated into BOTH the Spark queries and
  // their oracle SQL, so editing one side cannot silently diverge.
  private val S4MinValue = 50.0
  private val S4EventType = "purchase"
  private val R3Lo = 0.0
  private val R3Hi = 400.0
  private val R4AsOf = "2024-03-01 00:00:00"
  private val R4MaxAgeHours = 24.0
  private val TopK = 5

  /** S4: table sample scan — `SELECT * FROM t WHERE pred LIMIT n`
    * (`src/dq.py:18-28`), with a TOTAL order added (all four output
    * columns tie-break) so the sample prefix is deterministic even
    * under duplicate event_ids; the oracle pins NULLS FIRST to match
    * Spark's ascending null placement. */
  def s4SampleScan(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .where(col("value") > S4MinValue && col("event_type") === S4EventType)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id", "user_id", "event_type", "value")
      .limit(100)

  /** P1: count / nulls / distinct per column (`src/dq.py:45-50`).
    *
    * Until r20 this was ONE aggregation with 5 COUNT(DISTINCT)s,
    * which Catalyst plans through a 6× Expand: every input row is
    * replicated once per distinct column (plus the plain-agg stream)
    * before the partial aggregates collapse the streams — 6× the row
    * materialization and a single wide exchange carrying every
    * column's distinct set at once. The worst Spark-vs-reference
    * ratio on the surface (sf10: 2.6 s vs 0.02). Now each
    * high-cardinality column gets its OWN single-distinct pass:
    * Catalyst plans one distinct without Expand (partial groupBy(col)
    * collapses to the per-partition distinct set, the exchange
    * carries single-column rows), the scans are column-pruned to one
    * parquet column each (columnar input: N pruned scans read the
    * same bytes ONCE each, not N× the table), and the row count +
    * null counts + the lowest-cardinality distinct (event_type, 5
    * values — its partial agg collapses map-side to ~groups×tasks
    * rows) share the head pass. The five subtrees join as broadcast
    * 1-row scalars and run CONCURRENTLY (broadcast builds execute on
    * the broadcast-exchange thread pool; under AQE the independent
    * stages materialize in parallel), so wall-clock is the slowest
    * single pass, not the sum (guide §2.3 — shuffle fewer bytes;
    * §2.6 — overlap independent work). The per-column scalars then
    * pivot to rows through a 1-row local `stack`, so the report
    * shape and values are unchanged. */
  def p1Counts(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    val lowCard = "event_type"
    val headAggs =
      cols.map(c => sum(col(c).isNull.cast("long")).as(s"nn_$c")) :+
        count_distinct(col(lowCard)).as(s"nd_$lowCard")
    val head = events(s, dir).agg(count(lit(1)).as("n_rows"), headAggs: _*)
    val joined = cols.filterNot(_ == lowCard).foldLeft(head) { (acc, c) =>
      acc.crossJoin(broadcast(
        events(s, dir).select(c).agg(count_distinct(col(c)).as(s"nd_$c"))))
    }
    val stackArgs = cols
      .map(c => s"'$c', n_rows, nn_$c, nd_$c")
      .mkString(s"stack(${cols.size}, ", ", ",
        ") AS (column_name, n_rows, n_nulls, n_distinct)")
    joined
      .select(expr(stackArgs))
      .orderBy("column_name")
  }

  /** P2: numeric profile of events.value (`src/dq.py:51-59`) — all
    * seven statistics in ONE aggregation pass over one scan. */
  def p2Numeric(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select("value")
      .agg(
        count(lit(1)).as("n"),
        sum(decV).cast("double").as("sm"),
        sum(decV * decV).cast("double").as("smsq"),
        min("value").as("min_val"), max("value").as("max_val"),
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.95)).as("p95"))
      .select(col("n"), col("min_val"), col("max_val"),
        (col("sm") / col("n")).as("mean"),
        sqrt((col("smsq") - col("sm") * col("sm") / col("n")) / col("n"))
          .as("std_pop"),
        col("p50"), col("p95"))

  /** P3: timestamp profile, second-truncated ISO (`src/dq.py:60-64`). */
  def p3Timestamp(s: SparkSession, dir: String): DataFrame =
    events(s, dir).agg(
      date_format(min(date_trunc("second", col("ts"))),
        "yyyy-MM-dd HH:mm:ss").as("ts_min"),
      date_format(max(date_trunc("second", col("ts"))),
        "yyyy-MM-dd HH:mm:ss").as("ts_max"))

  /** P4: string-length profile of documents.text (`src/dq.py:65-73`). */
  def p4StringLength(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents").agg(
      min(length(col("text"))).cast("long").as("min_len"),
      max(length(col("text"))).cast("long").as("max_len"),
      percentile(length(col("text")), lit(0.95)).as("p95_len"))

  /** P5: top-k value counts, count-desc / value-asc (`src/dq.py:75-77`). */
  def p5TopK(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("value"))
      .limit(TopK)

  /** R1: not_null check on events.user_id (`src/dq.py:94-98`). */
  def r1NotNull(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .agg(sum(col("user_id").isNull.cast("long")).as("nulls"),
           count(lit(1)).as("total"))
      .select(col("nulls"), col("total"),
        round(lit(100.0) * col("nulls") / col("total"), 4)
          .as("null_rate_pct"),
        (col("nulls") === 0).as("passed"))

  /** R2: unique check on events.event_id — nulls count as duplicates
    * (`src/dq.py:101-107`). */
  def r2Unique(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .agg(count(lit(1)).as("total"),
           count_distinct(col("event_id")).as("n_distinct"))
      .select(col("total"), col("n_distinct"),
        (col("total") - col("n_distinct")).as("duplicates"),
        (col("total") - col("n_distinct") === 0).as("passed"))

  /** R3: range check on events.value ∈ [0, 400] (`src/dq.py:110-119`). */
  def r3Range(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .agg(sum(when(col("value") < R3Lo, 1L).otherwise(0L)).as("below_min"),
           sum(when(col("value") > R3Hi, 1L).otherwise(0L)).as("above_max"))
      .select(col("below_min"), col("above_max"),
        (col("below_min") + col("above_max") === 0).as("passed"))

  /** R4: freshness check against a FIXED reference instant — the
    * injected-clock form of `src/dq.py:122-133` (the engine's live
    * rule takes `now` as a parameter; a declared query must never call
    * `current_timestamp()`). age_hours is integer-second arithmetic
    * divided once, so both engines produce the identical double. */
  def r4Freshness(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .agg(max(unix_timestamp(date_trunc("second", col("ts")))).as("max_epoch"))
      .select(
        expr(s"CAST(unix_timestamp(timestamp'$R4AsOf') - max_epoch AS DOUBLE) / 3600.0")
          .as("age_hours"))
      .select(col("age_hours"),
        (col("age_hours") <= R4MaxAgeHours).as("passed"))

  /** R5: z-score anomaly on events.value, sigma = 3.0
    * (`src/dq.py:136-149`): pass 1 exact-decimal stats, pass 2 outlier
    * count; stats row broadcast to the scan. */
  def r5Anomaly(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select("value")
    val stats = valueStats(e).select(
      col("n").as("n_checked"),
      (col("sm") / col("n")).as("mean"),
      sqrt((col("smsq") - col("sm") * col("sm") / col("n")) / col("n"))
        .as("std_pop"))
    e.crossJoin(broadcast(stats))
      .groupBy("n_checked", "mean", "std_pop")
      .agg(sum(when(abs(col("value") - col("mean")) / col("std_pop") > 3.0,
        1L).otherwise(0L)).as("n_outliers"))
      .select(col("n_checked"), col("mean"), col("std_pop"),
        col("n_outliers"), (col("n_outliers") === 0).as("passed"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_s4_sample_scan" -> s4SampleScan,
    "dq_p1_counts" -> p1Counts,
    "dq_p2_numeric_profile" -> p2Numeric,
    "dq_p3_ts_profile" -> p3Timestamp,
    "dq_p4_strlen_profile" -> p4StringLength,
    "dq_p5_topk_values" -> p5TopK,
    "dq_r1_not_null" -> r1NotNull,
    "dq_r2_unique" -> r2Unique,
    "dq_r3_range" -> r3Range,
    "dq_r4_freshness_fixed" -> r4Freshness,
    "dq_r5_anomaly" -> r5Anomaly
  )

  def oracleSql: Map[String, String] = Map(
    "dq_s4_sample_scan" ->
      s"""SELECT event_id, user_id, event_type, value FROM events
        |WHERE value > $S4MinValue AND event_type = '$S4EventType'
        |ORDER BY event_id NULLS FIRST, user_id NULLS FIRST,
        |         event_type NULLS FIRST, value NULLS FIRST
        |LIMIT 100""".stripMargin,
    "dq_p1_counts" ->
      """SELECT column_name, n_rows, n_nulls, n_distinct FROM (
        |  SELECT 'event_id' AS column_name, COUNT(*) AS n_rows,
        |         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |         COUNT(DISTINCT event_id) AS n_distinct FROM events
        |  UNION ALL
        |  SELECT 'user_id', COUNT(*),
        |         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(DISTINCT user_id) FROM events
        |  UNION ALL
        |  SELECT 'event_type', COUNT(*),
        |         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(DISTINCT event_type) FROM events
        |  UNION ALL
        |  SELECT 'value', COUNT(*),
        |         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(DISTINCT value) FROM events
        |  UNION ALL
        |  SELECT 'props', COUNT(*),
        |         CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(DISTINCT props) FROM events)
        |ORDER BY column_name""".stripMargin,
    "dq_p2_numeric_profile" ->
      s"""WITH $statsSqlCte,
        |q AS (SELECT MIN(value) AS min_val, MAX(value) AS max_val,
        |             quantile_cont(value, 0.5) AS p50,
        |             quantile_cont(value, 0.95) AS p95
        |      FROM events)
        |SELECT a.n, q.min_val, q.max_val, a.sm / a.n AS mean,
        |       SQRT((a.smsq - a.sm * a.sm / a.n) / a.n) AS std_pop,
        |       q.p50, q.p95
        |FROM a CROSS JOIN q""".stripMargin,
    "dq_p3_ts_profile" ->
      """SELECT strftime(MIN(date_trunc('second', ts)), '%Y-%m-%d %H:%M:%S') AS ts_min,
        |       strftime(MAX(date_trunc('second', ts)), '%Y-%m-%d %H:%M:%S') AS ts_max
        |FROM events""".stripMargin,
    "dq_p4_strlen_profile" ->
      """SELECT CAST(MIN(LENGTH(text)) AS BIGINT) AS min_len,
        |       CAST(MAX(LENGTH(text)) AS BIGINT) AS max_len,
        |       quantile_cont(CAST(LENGTH(text) AS DOUBLE), 0.95) AS p95_len
        |FROM documents""".stripMargin,
    "dq_p5_topk_values" ->
      s"""SELECT event_type AS value, COUNT(*) AS cnt FROM events
        |GROUP BY event_type
        |ORDER BY cnt DESC, value NULLS FIRST LIMIT $TopK""".stripMargin,
    "dq_r1_not_null" ->
      """SELECT CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
        |       COUNT(*) AS total,
        |       ROUND(CAST(100 AS DOUBLE)
        |             * SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |             / COUNT(*), 4) AS null_rate_pct,
        |       SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) = 0 AS passed
        |FROM events""".stripMargin,
    "dq_r2_unique" ->
      """SELECT COUNT(*) AS total,
        |       COUNT(DISTINCT event_id) AS n_distinct,
        |       COUNT(*) - COUNT(DISTINCT event_id) AS duplicates,
        |       COUNT(*) - COUNT(DISTINCT event_id) = 0 AS passed
        |FROM events""".stripMargin,
    "dq_r3_range" ->
      s"""SELECT CAST(SUM(CASE WHEN value < $R3Lo THEN 1 ELSE 0 END) AS BIGINT) AS below_min,
        |       CAST(SUM(CASE WHEN value > $R3Hi THEN 1 ELSE 0 END) AS BIGINT) AS above_max,
        |       SUM(CASE WHEN value < $R3Lo THEN 1 ELSE 0 END)
        |       + SUM(CASE WHEN value > $R3Hi THEN 1 ELSE 0 END) = 0 AS passed
        |FROM events""".stripMargin,
    "dq_r4_freshness_fixed" ->
      s"""SELECT age_hours, age_hours <= $R4MaxAgeHours AS passed FROM (
        |  SELECT CAST(epoch(TIMESTAMP '$R4AsOf')
        |              - MAX(epoch(date_trunc('second', ts))) AS DOUBLE) / 3600.0 AS age_hours
        |  FROM events)""".stripMargin,
    "dq_r5_anomaly" ->
      s"""WITH $statsSqlCte,
        |s AS (SELECT n AS n_checked, sm / n AS mean,
        |             SQRT((smsq - sm * sm / n) / n) AS std_pop
        |      FROM a)
        |SELECT s.n_checked, s.mean, s.std_pop,
        |       CAST(SUM(CASE WHEN ABS(e.value - s.mean) / s.std_pop > 3.0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       SUM(CASE WHEN ABS(e.value - s.mean) / s.std_pop > 3.0
        |                THEN 1 ELSE 0 END) = 0 AS passed
        |FROM events e CROSS JOIN s
        |GROUP BY s.n_checked, s.mean, s.std_pop""".stripMargin
  )
}
