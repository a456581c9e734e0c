package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal operators over the `events` stream table: as-of join,
  * sessionization, and range (interval) join — the three event-time
  * primitives the reference's SQL surface cannot express in one query
  * and that every large-scale behavioural / training-data pipeline
  * needs (feature attribution, session segmentation, time-windowed
  * joins).
  *
  * Each is built Spark-first as an equi-shuffle plan — never a
  * per-row subquery and never a broadcast-nested-loop join:
  *
  *   - '''As-of join''' ([[asofJoin]]): union the two sides, tag them,
  *     and take `last(tagged, ignoreNulls)` over a per-user
  *     event-time window. ONE hash shuffle on `user_id`; the
  *     textbook inequality-join formulation is O(purchases × views)
  *     per user and un-plannable at scale.
  *   - '''Sessionization''' ([[sessionize]]): gap detection via `lag`,
  *     session ids via a running sum, then two aggregations that
  *     REUSE the window's `user_id` hash partitioning
  *     (`HashPartitioning(user_id)` satisfies the clustered
  *     distribution of both `(user_id, session_id)` and `user_id`) —
  *     one shuffle end-to-end, verified in PlanQualitySpec.
  *   - '''Range join''' ([[rangeJoinViews]]): time is bucketed to the
  *     window length and the build side is expanded to its two
  *     covering buckets, turning the interval predicate into an
  *     equi-join on `(user_id, bucket)` + a residual filter. Each
  *     probe row meets only its own two buckets' rows, so the plan
  *     is a plain shuffled hash join that scales linearly — the
  *     standard interval-bucketing rewrite (cf. Spark's own
  *     range-join hints in Databricks runtime, absent in OSS).
  *
  * Determinism contract: all outputs are integers (epoch micros,
  * counts, ids) or doubles copied verbatim from the input parquet —
  * no cross-row float arithmetic — so Spark and the DuckDB oracle
  * hash-match bitwise. Ties inside the as-of window are broken by
  * `(ts, tag, event_id)` on both engines.
  */
object EventPipeline extends graft.Registry {

  /** Session gap: events further apart than this start a new session. */
  private val SessionGapUs: Long = 30L * 60 * 1000 * 1000
  /** Range-join lookback window length (also the bucket width). */
  private val RangeWindowUs: Long = 3600L * 1000 * 1000
  private val ProbeType = "purchase"
  private val BuildType = "view"

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  private def us(c: Column): Column = unix_micros(c)

  /** e01: as-of join — for every `purchase`, the latest `view` of the
    * same user at-or-before the purchase (inclusive, the ASOF JOIN
    * default), ties broken toward the larger view event_id.
    *
    * Plan shape: filter → union → ONE shuffle on `user_id` → window
    * `last(ignoreNulls)` → filter to probe rows. The `view` columns
    * ride the union as nulls on probe rows, so no second join
    * materializes the matched row.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val tagged = e
      .where(col("event_type").isin(BuildType, ProbeType))
      .select(
        col("user_id"),
        us(col("ts")).as("ev_us"),
        // build rows sort BEFORE probe rows at equal ts: inclusive
        // (<=) as-of semantics
        when(col("event_type") === BuildType, lit(0)).otherwise(lit(1))
          .as("tag"),
        col("event_id"),
        col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy("ev_us", "tag", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      // both carried columns in ONE projection → a single Window
      // operator (chained withColumn would leave two)
      .select(col("*"),
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true)
          .over(w).as("view_id"),
        last(when(col("tag") === 0, col("ev_us")), ignoreNulls = true)
          .over(w).as("view_us"))
      .where(col("tag") === 1)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ev_us").as("purchase_us"),
        col("value"),
        col("view_id"),
        col("view_us"),
        (col("ev_us") - col("view_us")).as("gap_us"))
      // total order: event_id is unique in shipped testdata, but the
      // oracle compare is row-order exact, so tie-break on the full
      // purchase identity in case a corpus carries duplicate ids
      .orderBy("purchase_id", "user_id", "purchase_us")
      .limit(200)
  }

  /** e02: sessionization — 30-minute-gap sessions per user, reduced to
    * per-user session stats. Strict `>` on the gap; a lone event is a
    * zero-length session. One shuffle: the session window, the
    * per-session aggregate and the per-user aggregate all cluster on
    * (a superset of) `user_id`.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ev_us", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), us(col("ts")).as("ev_us"), col("event_id"))
      .withColumn("new_sess",
        when(col("ev_us") - lag("ev_us", 1).over(wOrd) > SessionGapUs
          || lag("ev_us", 1).over(wOrd).isNull, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_id", sum("new_sess").over(wRun))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("sess_events"),
        (max("ev_us") - min("ev_us")).as("sess_us"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("sess_events").as("n_events"),
        sum("sess_us").as("total_session_us"),
        max("sess_events").as("max_session_events"))
      .orderBy("user_id")
  }

  /** e03: range join — per `purchase`, how many `view`s by the same
    * user landed in the lookback window `(p.ts − 1h, p.ts]`.
    *
    * The interval predicate is rewritten as an equi-join: views are
    * expanded to their two covering 1-hour buckets (`b`, `b+1`), the
    * probe keeps its single bucket, and `(user_id, bucket)` equi-join
    * + residual time filter replaces the inequality join. A probe row
    * only ever meets its own two buckets' build rows, so there is no
    * BNLJ anywhere (pinned in PlanQualitySpec). Purchases with no
    * prior view keep a zero count via the left join.
    */
  def rangeJoinViews(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val views = e.where(col("event_type") === BuildType)
      .select(col("user_id").as("v_user"), us(col("ts")).as("v_us"))
      .withColumn("v_bucket",
        explode(array(floor(col("v_us") / RangeWindowUs),
          floor(col("v_us") / RangeWindowUs) + 1)))
    val purchases = e.where(col("event_type") === ProbeType)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        us(col("ts")).as("p_us"),
        floor(us(col("ts")) / RangeWindowUs).as("bucket"))
    // The residual time filter must be part of the JOIN condition:
    // as a post-join WHERE it would also drop probe rows whose
    // candidates ALL missed the window, losing their zero counts.
    val counted = purchases.join(views,
        purchases("user_id") === views("v_user") &&
          purchases("bucket") === views("v_bucket") &&
          views("v_us") > purchases("p_us") - RangeWindowUs &&
          views("v_us") <= purchases("p_us"),
        "left")
      .groupBy("purchase_id", "user_id", "p_us")
      .agg(count(col("v_us")).as("n_views_1h"))
    counted
      .select(col("purchase_id"), col("user_id"),
        col("p_us").as("purchase_us"), col("n_views_1h"))
      .orderBy("purchase_id", "user_id", "purchase_us")
      .limit(200)
  }

  /** Funnel hop horizon: each stage must follow the previous one
    * within this window (at-or-after, inclusive on both ends). */
  private val FunnelHorizonUs: Long = 86400L * 1000 * 1000

  /** e05: multi-stage funnel attribution (view → click → purchase,
    * each hop within [[FunnelHorizonUs]]) — per user: funnel entry
    * time, first qualified click, first converted purchase, and the
    * conversion count.
    *
    * The textbook formulation is a correlated EXISTS per stage —
    * quadratic per user and un-plannable at scale (that form IS the
    * independent oracle). The engine instead generalizes the e01
    * union-window trick to N stages in ONE shuffle on `user_id`:
    * sort each user's events once (stage-priority tie-break so
    * equal-timestamp hops stay inclusive), then per stage k a running
    * `max` of the stage-(k-1) qualification time marks stage-k events
    * that fall inside the horizon — "is there a qualified prior
    * event within H" collapses to "is the LATEST qualified prior
    * event within H", which a prefix window answers in O(events).
    * The per-user report reuses the window's hash partitioning, so
    * adding funnel stages adds window ops but never exchanges. */
  def funnel(s: SparkSession, dir: String): DataFrame =
    funnelWith(s, dir, FunnelHorizonUs)

  /** [[funnel]] with an explicit hop horizon — the declared query
    * binds [[FunnelHorizonUs]]; the streaming agreement test binds a
    * compact timeline. */
  private[graft] def funnelWith(
      s: SparkSession, dir: String, horizonUs: Long): DataFrame = {
    val staged = events(s, dir)
      .where(col("event_type").isin("view", "click", ProbeType))
      .select(col("user_id"), us(col("ts")).as("ev_us"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .otherwise(2).as("stage"),
        col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy("ev_us", "stage", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = staged
      .select(col("*"),
        max(when(col("stage") === 0, col("ev_us"))).over(w).as("last_view_us"))
      .withColumn("qc_us",
        when(col("stage") === 1 &&
          col("ev_us") - col("last_view_us") <= horizonUs,
          col("ev_us")))
      .select(col("*"), max("qc_us").over(w).as("last_qc_us"))
      .withColumn("conv_us",
        when(col("stage") === 2 &&
          col("ev_us") - col("last_qc_us") <= horizonUs,
          col("ev_us")))
    marked.groupBy("user_id")
      .agg(
        min(when(col("stage") === 0, col("ev_us"))).as("first_view_us"),
        min("qc_us").as("first_qual_click_us"),
        min("conv_us").as("first_conversion_us"),
        count("conv_us").as("n_conversions"))
      // funnel entrants only: users who never viewed have no funnel
      .where(col("first_view_us").isNotNull)
      .orderBy("user_id")
  }

  /** e04: semi-structured property extraction — parse the `props`
    * JSON column, bucket the extracted `k` field, and aggregate event
    * stats per (event_type, k-decile). The metadata-filtering step of
    * an event pipeline: at scale the JSON path evaluation is per-row
    * codegen (`GetJsonObject`, no shuffle) and the only exchange is
    * the final small group-by.
    *
    * Determinism contract: `min`/`max` over doubles are order-free;
    * the value total is quantized per-row to integer cents
    * (`floor(value*100)` is the same IEEE op on both engines) so its
    * cross-row sum is exact integer math, never a float reduction.
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .select(
        col("event_type"),
        floor(col("k").cast("double") / 10.0d).cast("long").as("k_decile"),
        col("value"),
        floor(col("value") * 100.0d).cast("long").as("cents"))
      .groupBy("event_type", "k_decile")
      .agg(
        count(lit(1)).as("n_events"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        sum("cents").as("total_cents"))
      .orderBy("event_type", "k_decile")

  /** e06: inter-event gap distribution — the latency telemetry every
    * event platform dashboards: discrete quantiles of the gap
    * (whole seconds) between a user's consecutive events, grouped by
    * the LATER event's type ("how long does a user idle before a
    * purchase"). Quantiles use the td21 integer-rank method
    * (smallest value whose 1-based rank clears ⌈p·n⌉ — no engine
    * interpolation) and the gap floors in integer micros space, so
    * the report is bit-identical across engines.
    *
    * Scale shape: the quantiles are computed over the DISTINCT-VALUE
    * histogram, never a rank sort of raw rows. `groupBy(event_type,
    * gap_s)` compacts map-side to ≤ |types| × |distinct whole-second
    * gaps| rows (a bounded domain, independent of corpus size), and
    * only that histogram enters the per-type cumulative window —
    * equivalent because equal values occupy consecutive ranks, so the
    * smallest row with rank·100 ≥ n·p is exactly the smallest value
    * whose cumulative count clears the same bound. The naive
    * `row_number` form sorts every gap row inside ≤ |event_type|
    * partitions — a handful of reducers each sorting a
    * fact-table-sized partition at 100 TB. Pinned shuffle budget:
    * the per-user lag window, the histogram exchange, and the tiny
    * per-type histogram window (PlanQualitySpec). */
  def gapQuantiles(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ev_us", "event_id")
    val wCum = Window.partitionBy("event_type").orderBy("gap_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    def atLeast(pct: Int) =
      min(when(col("cum") * 100 >= col("n") * pct, col("gap_s")))
    events(s, dir)
      .select(col("user_id"), col("event_type"), us(col("ts")).as("ev_us"),
        col("event_id"))
      .withColumn("prev_us", lag("ev_us", 1).over(wOrd))
      .where(col("prev_us").isNotNull)
      .withColumn("gap_s", expr("(ev_us - prev_us) div 1000000"))
      .groupBy("event_type", "gap_s")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
      .groupBy("event_type")
      .agg(
        sum("cnt").as("n_gaps"),
        min("gap_s").as("min_gap_s"),
        atLeast(50).as("p50_gap_s"),
        atLeast(95).as("p95_gap_s"),
        max("gap_s").as("max_gap_s"))
      .orderBy("event_type")
  }

  /** e07 decay calibration: the week-0 weight (2¹²). Weights halve
    * per whole week of age — 4096, 2048, 1024, … — and zero out past
    * 12 weeks (the explicit truncation horizon both engines apply
    * identically; a longer memory raises the base). */
  private[graft] val DecayBaseQ = 4096
  private[graft] val DecayZeroWeeks = 13

  /** e07: recency-weighted user engagement — the feature-store
    * staple (recommendation/churn features weight activity by
    * exponential decay) computed in EXACT integer space: the usual
    * `Σ value·e^(−λ·age)` is a cross-row float sum whose result
    * depends on aggregation order (and on each engine's exp), so it
    * can never hash-match an oracle nor reproduce across re-runs or
    * repartitions. Halving per WHOLE WEEK of age instead makes every
    * weight a power of two ([[DecayBaseQ]] ≫ weeks) — integers, so
    * the per-user decayed mass is an exact integer sum, and the
    * normalized score divides by 2¹² (exact in IEEE). Half-life
    * granularity (a week) trades smoothness for bit-reproducibility;
    * per-day halving is the same plan with a bigger base.
    *
    * Scale shape: the reference instant is a 1-row broadcast (the
    * corpus max ts — production passes NOW); weights are row-local;
    * ONE user-keyed shuffle with map-side partial sums; the ordered
    * report is a TakeOrderedAndProject heap, never a global sort. */
  def decayedEngagement(s: SparkSession, dir: String): DataFrame = {
    val ref = events(s, dir).agg(max(us(col("ts"))).as("ref_us"))
    events(s, dir)
      .select(col("user_id"), col("event_type"), us(col("ts")).as("ev_us"))
      .crossJoin(broadcast(ref))
      // CALENDAR-day ages (reference day − event day), not elapsed
      // micros / 86400e6: daily-snapshot aging is the feature-store
      // semantics (a score computed "as of today" treats everything
      // from one calendar day alike), and it is what makes the
      // operator streamable with bounded per-day state — the
      // streaming twin (EventStreams.decayedEngagement) keeps one
      // bucket per (user, day) and any reader folds the same weights
      // at its own reference day.
      .select(col("user_id"), col("event_type"),
        expr("ref_us div 86400000000 - ev_us div 86400000000")
          .as("age_days"))
      .select(col("user_id"), col("age_days"),
        when(expr("age_days div 7") >= DecayZeroWeeks, lit(0L))
          .otherwise(expr(
            s"shiftright($DecayBaseQ, CAST(age_days div 7 AS INT))"))
          .as("w_q"),
        col("event_type"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("age_days") < 7, 1L).otherwise(0L)).as("n_recent"),
        min("age_days").as("last_seen_days"),
        sum("w_q").as("engagement_q"),
        sum(when(col("event_type") === ProbeType, col("w_q"))
          .otherwise(0L)).as("purchase_q"))
      .select(col("user_id"), col("n_events"), col("n_recent"),
        col("last_seen_days"), col("engagement_q"),
        (col("engagement_q").cast("double") / DecayBaseQ).as("engagement"),
        col("purchase_q"))
      .orderBy(desc("engagement_q"), col("user_id"))
      .limit(100)
  }

  /** e08: event-transition matrix — first-order Markov counts over
    * each user's time-ordered event stream (prev type → next type),
    * with the conditional transition probability in exact integer
    * ppm. The session-model fingerprint behind funnel design and
    * behavioral-sequence training data (which transitions exist, at
    * what rate), and the drift monitor's structural complement: a
    * shifted transition matrix flags instrumentation changes that
    * marginal type counts cannot see.
    *
    * Scale shape: ONE user-keyed lag window (the e06 pattern), then
    * a groupBy on (prev, next) that compacts map-side to the ≤
    * |types|² domain; the per-prev totals come from a SUM window
    * over that bounded matrix, never a second pass over events.
    * Integer counts and `div` ppm end-to-end. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ev_us", "event_id")
    events(s, dir)
      .select(col("user_id"), col("event_type"), us(col("ts")).as("ev_us"),
        col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(wOrd))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p_ppm",
        expr("n_transitions * 1000000 div " +
          "sum(n_transitions) OVER (PARTITION BY prev_type)"))
      .orderBy("prev_type", "next_type")
  }

  /** e09: daily-volume anomaly flags — each event type's daily count
    * against that type's own distribution over the observed days,
    * flagged when the squared deviation exceeds four times the
    * population variance (|z| > 2). The pipeline-health monitor that
    * catches an instrumentation outage or a bot flood the day it
    * happens: a type whose volume collapses (or spikes) shows up as a
    * flagged day without anyone choosing a threshold per type.
    *
    * Determinism: the z-test is evaluated entirely in BIGINT —
    * with n days, s1 = Σcnt and s2 = Σcnt², the |z| > 2 test
    * `(cnt−μ)² > 4σ²` multiplies out to
    * `(cnt·n − s1)² > 4·(n·s2 − s1²)`, exact on both engines (no
    * float mean/stddev anywhere). Range audit: safe while daily
    * counts stay below ~5×10⁷ at 30-day windows (4n²·cnt² < 2⁶³);
    * beyond that, swap the inequality's operands to DECIMAL(38,0) —
    * the plan shape is unchanged.
    *
    * Scale shape: ONE groupBy shuffle compacts events map-side to the
    * (type × day) domain; the per-type moment windows then run over
    * that bounded matrix, never over raw events. */
  def dailyAnomaly(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    events(s, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("s1", sum("cnt").over(w))
      .withColumn("s2", sum(expr("cnt * cnt")).over(w))
      .select(col("event_type"), col("day"), col("cnt"),
        (col("cnt") * col("n_days") - col("s1")).as("dev_n"),
        when(
          expr("(cnt * n_days - s1) * (cnt * n_days - s1)" +
            " > 4 * (n_days * s2 - s1 * s1)"), 1L)
          .otherwise(0L).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** e10: rolling user-activity features — per (user, day): that
    * day's event count plus the trailing-7-day event count and
    * active-day count via a RANGE window over the integer day axis.
    * The feature-store staple (rolling engagement windows feed every
    * churn/propensity model) and e07's uniform-window complement:
    * e07 weights by recency, this counts inside a sharp horizon.
    *
    * Determinism: counts and integer day numbers only. The RANGE
    * frame is over the integer `day` ORDER BY key — identical
    * semantics on both engines (frame = days in [day−6, day], not
    * 7 physical rows, so gap days are handled correctly).
    *
    * Scale shape: the explicit `repartition(user_id)` makes the
    * day-compaction groupBy and the per-user RANGE window REUSE one
    * user-keyed exchange (HashPartitioning(user_id) satisfies the
    * clustered distribution of both (user_id, day) and user_id —
    * e02's one-shuffle layout); the window then runs over per-day
    * compacted rows, never raw events. */
  def rollingFeatures(s: SparkSession, dir: String): DataFrame = {
    val w7 = Window.partitionBy("user_id").orderBy("day")
      .rangeBetween(-6, Window.currentRow)
    events(s, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .repartition(col("user_id"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_day"))
      .withColumn("n_7d", sum("n_day").over(w7))
      .withColumn("active_days_7d", count(lit(1)).over(w7))
      .orderBy("user_id", "day")
  }

  /** e11: cohort retention matrix — users grouped by first-active day
    * (their cohort), then for every later active day the count of
    * that cohort's users still active at that day offset, with the
    * retained share in exact ppm of the cohort's size. The classic
    * growth-accounting triangle (q12 reports one 7-day cut of it;
    * this is the full cohort × offset surface a retention curve is
    * drawn from).
    *
    * Determinism: BIGINT day numbers, counts, and `div` ppm
    * end-to-end — no date types, no floats. Offset 0 always exists
    * for every cohort (the first active day is active), so
    * `cohort_size` is total on both engines. Range audit: the ppm
    * product needs n_active_users < 2⁶³/10⁶ ≈ 9×10¹² users — beyond
    * any cohort.
    *
    * Scale shape: the explicit `repartition(user_id)` lets the
    * (user, day) activity compaction and the per-user MIN window
    * REUSE one user-keyed exchange (e02/e10's one-shuffle layout);
    * the cohort groupBy then compacts map-side onto the bounded
    * cohort × offset triangle (≤ days² rows — grows with TIME², not
    * volume), and the cohort-size window runs over that triangle,
    * never over events. */
  def cohortMatrix(s: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy("user_id")
    val wCohort = Window.partitionBy("cohort_day")
    events(s, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .repartition(col("user_id"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_ev"))
      .withColumn("cohort_day", min("day").over(wUser))
      // second (and last) data exchange: hash on cohort_day alone so
      // the triangle groupBy AND the cohort-size window both reuse it
      .repartition(col("cohort_day"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active_users"),
        sum("n_ev").cast("long").as("n_events"))
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active_users")))
          .over(wCohort))
      .withColumn("retained_ppm",
        expr("n_active_users * 1000000 div cohort_size"))
      .orderBy("cohort_day", "day_offset")
  }

  // -------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e11_cohort_matrix" -> cohortMatrix,
    "e01_asof_join" -> asofJoin,
    "e02_sessionize" -> sessionize,
    "e03_range_join" -> rangeJoinViews,
    "e04_json_props" -> jsonProps,
    "e05_funnel" -> funnel,
    "e06_gap_quantiles" -> gapQuantiles,
    "e07_decayed_engagement" -> decayedEngagement,
    "e08_event_transitions" -> eventTransitions,
    "e09_daily_anomaly" -> dailyAnomaly,
    "e10_rolling_features" -> rollingFeatures
  )

  def oracleSql: Map[String, String] = Map(
    // Obviously-correct quadratic form: correlated inequality join +
    // ROW_NUMBER. The engine's union-window plan must reproduce it
    // exactly, including the (ts DESC, event_id DESC) tie-break.
    "e01_asof_join" ->
      s"""WITH pv AS (
         |  SELECT p.event_id AS purchase_id, p.user_id,
         |         epoch_us(p.ts) AS purchase_us, p.value,
         |         v.event_id AS view_id, epoch_us(v.ts) AS view_us,
         |         ROW_NUMBER() OVER (
         |           -- row identity: distinct purchase ROWS sharing an
         |           -- event_id each keep their own as-of match (SQL
         |           -- cannot key BIT-IDENTICAL duplicate rows apart,
         |           -- so full-row duplicates remain out of oracle
         |           -- scope — every lesser duplication is covered)
         |           PARTITION BY p.event_id, p.user_id, p.ts
         |           ORDER BY v.ts DESC, v.event_id DESC) AS rn
         |  FROM events p
         |  LEFT JOIN events v
         |    ON v.user_id = p.user_id AND v.event_type = '$BuildType'
         |       AND v.ts <= p.ts
         |  WHERE p.event_type = '$ProbeType')
         |SELECT purchase_id, user_id, purchase_us, value, view_id, view_us,
         |       purchase_us - view_us AS gap_us
         |FROM pv WHERE rn = 1
         |ORDER BY purchase_id, user_id, purchase_us LIMIT 200""".stripMargin,
    "e02_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ev_us, event_id FROM events),
         |gaps AS (
         |  SELECT user_id, ev_us, event_id,
         |         CASE WHEN lag(ev_us) OVER w IS NULL
         |                OR ev_us - lag(ev_us) OVER w > $SessionGapUs
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ev_us, event_id)),
         |sess AS (
         |  SELECT user_id, ev_us,
         |         SUM(new_sess) OVER (PARTITION BY user_id
         |                             ORDER BY ev_us, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM gaps),
         |per_sess AS (
         |  SELECT user_id, session_id, COUNT(*) AS sess_events,
         |         MAX(ev_us) - MIN(ev_us) AS sess_us
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, COUNT(*) AS n_sessions,
         |       CAST(SUM(sess_events) AS BIGINT) AS n_events,
         |       CAST(SUM(sess_us) AS BIGINT) AS total_session_us,
         |       CAST(MAX(sess_events) AS BIGINT) AS max_session_events
         |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e03_range_join" ->
      s"""SELECT p.event_id AS purchase_id, p.user_id,
         |       epoch_us(p.ts) AS purchase_us,
         |       CAST(COUNT(v.user_id) AS BIGINT) AS n_views_1h
         |FROM events p
         |LEFT JOIN events v
         |  ON v.user_id = p.user_id AND v.event_type = '$BuildType'
         |     AND epoch_us(v.ts) > epoch_us(p.ts) - $RangeWindowUs
         |     AND epoch_us(v.ts) <= epoch_us(p.ts)
         |WHERE p.event_type = '$ProbeType'
         |GROUP BY p.event_id, p.user_id, epoch_us(p.ts)
         |ORDER BY purchase_id, p.user_id, purchase_us LIMIT 200""".stripMargin,
    "e04_json_props" ->
      s"""WITH k AS (
         |  SELECT event_type,
         |         CAST(floor(CAST(CAST(json_extract_string(props, '$$.k')
         |                              AS BIGINT) AS DOUBLE) / 10.0)
         |              AS BIGINT) AS k_decile,
         |         value,
         |         CAST(floor(value * 100.0) AS BIGINT) AS cents
         |  FROM events)
         |SELECT event_type, k_decile, COUNT(*) AS n_events,
         |       MIN(value) AS min_value, MAX(value) AS max_value,
         |       CAST(SUM(cents) AS BIGINT) AS total_cents
         |FROM k GROUP BY event_type, k_decile
         |ORDER BY event_type, k_decile""".stripMargin,
    // Obviously-correct correlated-EXISTS form, per stage — the
    // engine's single-shuffle window plan must reproduce it exactly,
    // including inclusive horizon bounds and equal-timestamp hops.
    "e06_gap_quantiles" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS ev_us, event_id
         |  FROM events),
         |g AS (
         |  SELECT event_type,
         |         (ev_us - LAG(ev_us) OVER (PARTITION BY user_id
         |            ORDER BY ev_us, event_id)) // 1000000 AS gap_s
         |  FROM e),
         |gg AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
         |ranked AS (
         |  SELECT event_type, gap_s,
         |         ROW_NUMBER() OVER (PARTITION BY event_type
         |                            ORDER BY gap_s) AS rn,
         |         COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM gg)
         |SELECT event_type, COUNT(*) AS n_gaps,
         |       MIN(gap_s) AS min_gap_s,
         |       MIN(CASE WHEN rn * 100 >= n * 50 THEN gap_s END) AS p50_gap_s,
         |       MIN(CASE WHEN rn * 100 >= n * 95 THEN gap_s END) AS p95_gap_s,
         |       MAX(gap_s) AS max_gap_s
         |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e05_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
         |qc AS (
         |  SELECT c.user_id, c.us FROM e c
         |  WHERE c.event_type = 'click' AND EXISTS (
         |    SELECT 1 FROM v WHERE v.user_id = c.user_id
         |      AND v.us <= c.us AND v.us >= c.us - $FunnelHorizonUs)),
         |cv AS (
         |  SELECT p.user_id, p.us FROM e p
         |  WHERE p.event_type = '$ProbeType' AND EXISTS (
         |    SELECT 1 FROM qc WHERE qc.user_id = p.user_id
         |      AND qc.us <= p.us AND qc.us >= p.us - $FunnelHorizonUs))
         |SELECT u.user_id, u.first_view_us,
         |       (SELECT MIN(us) FROM qc WHERE qc.user_id = u.user_id)
         |         AS first_qual_click_us,
         |       (SELECT MIN(us) FROM cv WHERE cv.user_id = u.user_id)
         |         AS first_conversion_us,
         |       CAST((SELECT COUNT(*) FROM cv WHERE cv.user_id = u.user_id)
         |            AS BIGINT) AS n_conversions
         |FROM (SELECT user_id, MIN(us) AS first_view_us
         |      FROM v GROUP BY user_id) u
         |ORDER BY u.user_id""".stripMargin,
    "e07_decayed_engagement" ->
      s"""WITH r AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
         |a AS (
         |  SELECT user_id, event_type,
         |         r.ref_us // 86400000000 - epoch_us(ts) // 86400000000
         |           AS age_days
         |  FROM events CROSS JOIN r),
         |wq AS (
         |  SELECT user_id, event_type, age_days,
         |         CASE WHEN age_days // 7 >= $DecayZeroWeeks
         |              THEN CAST(0 AS BIGINT)
         |              ELSE CAST($DecayBaseQ AS BIGINT) >> (age_days // 7)
         |         END AS w_q
         |  FROM a),
         |g AS (
         |  SELECT user_id, COUNT(*) AS n_events,
         |         CAST(SUM(CASE WHEN age_days < 7 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_recent,
         |         MIN(age_days) AS last_seen_days,
         |         CAST(SUM(w_q) AS BIGINT) AS engagement_q,
         |         CAST(SUM(CASE WHEN event_type = '$ProbeType' THEN w_q
         |                       ELSE 0 END) AS BIGINT) AS purchase_q
         |  FROM wq GROUP BY user_id)
         |SELECT user_id, n_events, n_recent, last_seen_days, engagement_q,
         |       CAST(engagement_q AS DOUBLE) / $DecayBaseQ AS engagement,
         |       purchase_q
         |FROM g ORDER BY engagement_q DESC, user_id LIMIT 100""".stripMargin,
    "e08_event_transitions" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS ev_us, event_id
         |  FROM events),
         |p AS (
         |  SELECT event_type AS next_type,
         |         LAG(event_type) OVER (PARTITION BY user_id
         |           ORDER BY ev_us, event_id) AS prev_type
         |  FROM e),
         |m AS (
         |  SELECT prev_type, next_type, COUNT(*) AS n_transitions
         |  FROM p WHERE prev_type IS NOT NULL
         |  GROUP BY prev_type, next_type)
         |SELECT prev_type, next_type, n_transitions,
         |       n_transitions * 1000000
         |         // CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
         |                AS BIGINT)
         |         AS p_ppm
         |FROM m ORDER BY prev_type, next_type""".stripMargin,
    "e09_daily_anomaly" ->
      s"""WITH c AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |         COUNT(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |w AS (
         |  SELECT event_type, day, cnt,
         |         CAST(COUNT(*) OVER (PARTITION BY event_type)
         |              AS BIGINT) AS n_days,
         |         CAST(SUM(cnt) OVER (PARTITION BY event_type)
         |              AS BIGINT) AS s1,
         |         CAST(SUM(cnt * cnt) OVER (PARTITION BY event_type)
         |              AS BIGINT) AS s2
         |  FROM c)
         |SELECT event_type, day, cnt,
         |       cnt * n_days - s1 AS dev_n,
         |       CAST(CASE WHEN (cnt * n_days - s1) * (cnt * n_days - s1)
         |                      > 4 * (n_days * s2 - s1 * s1)
         |                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM w ORDER BY event_type, day""".stripMargin,
    "e10_rolling_features" ->
      s"""WITH daily AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |         COUNT(*) AS n_day
         |  FROM events GROUP BY 1, 2)
         |SELECT user_id, day, n_day,
         |       CAST(SUM(n_day) OVER w AS BIGINT) AS n_7d,
         |       CAST(COUNT(*) OVER w AS BIGINT) AS active_days_7d
         |FROM daily
         |WINDOW w AS (PARTITION BY user_id ORDER BY day
         |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, day""".stripMargin,
    "e11_cohort_matrix" ->
      s"""WITH d AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |         COUNT(*) AS n_ev
         |  FROM events GROUP BY 1, 2),
         |f AS (
         |  SELECT user_id, day, n_ev,
         |         MIN(day) OVER (PARTITION BY user_id) AS cohort_day
         |  FROM d),
         |m AS (
         |  SELECT cohort_day, day - cohort_day AS day_offset,
         |         CAST(COUNT(*) AS BIGINT) AS n_active_users,
         |         CAST(SUM(n_ev) AS BIGINT) AS n_events
         |  FROM f GROUP BY 1, 2),
         |z AS (
         |  SELECT cohort_day, day_offset, n_active_users, n_events,
         |         CAST(MAX(CASE WHEN day_offset = 0 THEN n_active_users
         |                       END)
         |              OVER (PARTITION BY cohort_day) AS BIGINT)
         |           AS cohort_size
         |  FROM m)
         |SELECT cohort_day, day_offset, n_active_users, n_events,
         |       cohort_size,
         |       n_active_users * 1000000 // cohort_size AS retained_ppm
         |FROM z ORDER BY cohort_day, day_offset""".stripMargin
  )
}
