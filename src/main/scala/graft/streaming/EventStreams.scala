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
  *
  * CHECKPOINT COMPATIBILITY: the retention work added a `lastEventUs`
  * field to every kept-state class (FunnelState / AsofState /
  * AdjState / EngState / ActState), which changes the state-store
  * schema of the five twins. Restarting a streaming query from a
  * checkpoint written by a pre-retention build fails Spark's state
  * schema compatibility check even when `retentionMinutes` is left
  * unset — a deployment upgrading across that boundary must start
  * from a FRESH checkpoint (replaying the source) rather than resume.
  * State schemas are not versioned here on purpose: a compatibility
  * shim would have to carry the old encoder forever for a one-time
  * migration the source replay already provides.
  */
object EventStreams {

  final case class Event(
      eventId: Long, userId: Long, eventType: String,
      value: Double, ts: Timestamp)

  /** Calendar-day bucket of a timestamp, shared by every day-keyed
    * stream below (e07/e09/e11 twins). PRECONDITION — non-negative
    * epochs: the batch twins compute `unix_micros(ts) div 86400000000`
    * where Spark's `div` truncates toward zero, their DuckDB oracles
    * use `//` (floor), and this helper floors millis — the three
    * agree on every ts ≥ 1970-01-01 and diverge below it. Event data
    * is generated ≥ 2024, so the precondition holds by construction;
    * a deployment with pre-epoch timestamps must pick ONE truncation
    * and mirror it across all three sites. */
  private[streaming] def dayOf(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 86400000L)

  /** Event-time micros of a timestamp, exactly matching the batch
    * twins' `unix_micros(ts)`: `getTime` is millisecond-resolution
    * (sub-millisecond digits live in `getNanos`), so a bare
    * `getTime * 1000` would truncate micros and let same-millisecond
    * events tie — diverging from batch gap/ordering arithmetic on
    * data with sub-millisecond timestamps. Shared by every stateful
    * twin that orders or differences event times (funnel, as-of,
    * adjacent-pair). */
  private[streaming] def microsOf(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Inverse of [[microsOf]]: a Timestamp carrying the full
    * sub-millisecond precision (constructor ms + setNanos for the
    * fractional second, the JDBC-spec conversion). */
  private[streaming] def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos(((us - Math.floorDiv(us, 1000000L) * 1000000L) * 1000L).toInt)
    t
  }

  final case class Session(
      userId: Long, start: Timestamp, end: Timestamp,
      nEvents: Long, totalValue: Double)

  // Scala-private would compile to a JVM-private class the encoder's
  // generated Java cannot touch; private[streaming] stays public in
  // bytecode while hiding it from the API.
  private[streaming] final case class SessionState(
      start: Long, end: Long, n: Long, total: Double) // bounds in µs

  /** Streaming source over a parquet event directory. Carries `props`
    * too — omitting it left the module's own source unable to feed
    * its e04 twin ([[jsonPropsWindowed]] resolves `props` and would
    * fail analysis with UNRESOLVED_COLUMN). */
  def fromParquetDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING, ts TIMESTAMP")
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

  /** Streaming twin of the batch e04 JSON-property report
    * ([[graft.queries.EventPipeline.jsonProps]]): the JSON-path
    * extraction and decile/cents projection are row-local (stateless),
    * so the stream is the batch projection plus a watermarked window
    * around the same (event_type, k_decile) aggregate. Every emitted
    * aggregate is DISTRIBUTIVE (count/min/max/integer-cents sum), so
    * [[jsonPropsAt]] folds the per-window rows onto the batch totals
    * exactly — no float sums anywhere (cents are floored integers,
    * exactly the batch trick). */
  def jsonPropsWindowed(events: DataFrame,
      watermark: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .select(col("ts"), col("event_type"),
        floor(col("k").cast("double") / 10.0d).cast("long").as("k_decile"),
        col("value"),
        floor(col("value") * 100.0d).cast("long").as("cents"))
      .groupBy(window(col("ts"), windowLength),
        col("event_type"), col("k_decile"))
      .agg(count(lit(1)).as("n_events"),
        min("value").as("min_value"), max("value").as("max_value"),
        sum("cents").as("total_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("k_decile"), col("n_events"), col("min_value"),
        col("max_value"), col("total_cents"))

  final case class JsonPropsRow(
      eventType: String, kDecile: Long, nEvents: Long,
      minValue: Double, maxValue: Double, totalCents: Long)

  /** Fold per-window [[jsonPropsWindowed]] rows into the batch e04
    * report — all four aggregates are distributive, so the merge is
    * exact. Input tuples: (event_type, k_decile, n, min, max, cents). */
  def jsonPropsAt(
      rows: Seq[(String, Long, Long, Double, Double, Long)])
      : Seq[JsonPropsRow] =
    rows.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case ((t, d), v) =>
        JsonPropsRow(t, d, v.map(_._3).sum, v.map(_._4).min,
          v.map(_._5).max, v.map(_._6).sum)
      }

  /** Shared quiet-timeout keep/evict arm for the three kept-state
    * operators ([[funnel]] / [[asofJoin]] / [[adjacentPairs]]): keep
    * the compact state (exact batch parity) unless a retention bound
    * is set and the watermark has passed lastEvent + retention — then
    * drop it. Inside the bound, re-arm an event-time timeout at that
    * point so eviction eventually fires without new arrivals; the arm
    * CEILS to milliseconds — a truncated timestamp could land AT the
    * current watermark (illegal) or fire with the microsecond eviction
    * condition still false and re-arm at the same value forever. */
  private def keepOrEvict[S](state: GroupState[S], kept: S,
      lastEventUs: Long, retentionUs: Option[Long]): Unit = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    retentionUs match {
      case Some(r) if wmUs >= lastEventUs + r => state.remove()
      case Some(_) =>
        state.update(kept)
        armRetention(state, lastEventUs, retentionUs)
      case None => state.update(kept)
    }
  }

  /** The single owner of the retention-arm arithmetic: timeout at
    * lastEvent + retention, CEILED to milliseconds — a truncated
    * timestamp could land AT the current watermark (illegal) or fire
    * with the microsecond eviction condition still false and re-arm
    * at the same value forever. */
  private def armRetention[S](state: GroupState[S],
      lastEventUs: Long, retentionUs: Option[Long]): Unit =
    retentionUs.foreach(r =>
      state.setTimeoutTimestamp((lastEventUs + r + 999L) / 1000L))

  /** The single owner of the minutes → microseconds retention
    * conversion, and the fail-fast validation gate all five
    * retention-capable operators share: `Some(0)` or a negative value
    * would arm a timeout timestamp at or below the current watermark,
    * making Spark's setTimeoutTimestamp throw IllegalArgumentException
    * MID-STREAM (first arming batch) instead of at construction —
    * require here so the bad knob fails before a query starts. */
  private def retentionMicros(retentionMinutes: Option[Long]): Option[Long] = {
    require(retentionMinutes.forall(_ > 0),
      s"retentionMinutes must be positive, got $retentionMinutes")
    retentionMinutes.map(_ * 60000000L)
  }

  /** Watermark/timeout preamble shared by the retention-capable
    * histogram twins: retention needs event-time timeouts, which need
    * a watermarked input. CAVEAT the callers document: the watermark
    * also bounds late-event ABSORPTION for live users — a row later
    * than the bound is dropped even when its user is nowhere near
    * eviction — so a deployment enabling retention must size
    * `watermark` to its corpus's real disorder, where the default
    * (no retention) twins absorb arbitrary lateness. */
  private def retentionSource(events: Dataset[Event],
      retentionUs: Option[Long], watermark: String)
      : (Dataset[Event], GroupStateTimeout) =
    if (retentionUs.isDefined)
      (events.withWatermark("ts", watermark),
        GroupStateTimeout.EventTimeTimeout)
    else (events, GroupStateTimeout.NoTimeout)

  final case class FunnelReport(
      userId: Long, firstViewUs: Long, firstQualClickUs: Option[Long],
      firstConversionUs: Option[Long], nConversions: Long)

  private[streaming] final case class PendEv(us: Long, stage: Int, id: Long)

  private[streaming] final case class FunnelState(
      pending: Seq[PendEv],
      lastViewUs: Option[Long], lastQcUs: Option[Long],
      firstViewUs: Option[Long], firstQcUs: Option[Long],
      firstConvUs: Option[Long], nConv: Long, lastEventUs: Long)

  /** Streaming multi-stage funnel — the continuous form of the batch
    * `e05_funnel` (view → click → purchase, each hop within
    * `horizonMinutes`, inclusive): one CUMULATIVE report per user per
    * quiet period (`quietMinutes` of EVENT time with no arrivals).
    * Append mode cannot retract, so a user active across several
    * quiet gaps emits one report per gap, each covering their whole
    * history — the LAST report per user equals the batch row, the
    * standard last-write-wins reading of an append stream.
    *
    * Exactness under reordering: the batch operator's prefix-max trick
    * needs events in event-time order, so arrivals are BUFFERED in
    * state and only folded into the compact machine once the watermark
    * passes them — any arrival order inside the lateness bound yields
    * the batch answer bit-for-bit (asserted against
    * [[graft.queries.EventPipeline.funnel]] in EventStreamsSpec). The
    * buffer holds at most the user's events from one watermark delay,
    * and the folded machine is six longs, which is what an idle user
    * costs after their buffer flushes — kept BY DEFAULT, so a return
    * inside `horizonMinutes` still chains off its pre-gap predecessor.
    *
    * `retentionMinutes` bounds that idle state for long-running
    * deployments (unbounded distinct users would otherwise grow the
    * state store forever): once the watermark passes
    * `lastEvent + retention`, the user's state is dropped — the
    * eviction fire first re-emits the cumulative report (content-
    * identical to the user's last quiet report, since any intervening
    * event would have re-armed the quiet timeout), so the stream's
    * last-write-wins reading is unchanged; a user returning AFTER
    * eviction restarts the machine, losing the cross-gap chain —
    * that divergence from the batch twin is the documented price of
    * the bound. Retention below `quietMinutes` evicts at the first
    * quiet fire. None (default) = keep, exact batch parity. */
  def funnel(events: Dataset[Event],
      horizonMinutes: Long = 24 * 60,
      quietMinutes: Long = 60,
      watermark: String = "10 minutes",
      retentionMinutes: Option[Long] = None): Dataset[FunnelReport] = {
    import events.sparkSession.implicits._
    val horizonUs = horizonMinutes * 60000000L
    val quietMs = quietMinutes * 60000L
    val retentionUs = retentionMicros(retentionMinutes)

    def fold(st: FunnelState, evs: Seq[PendEv]): FunnelState =
      // (us, stage, id) ascending = the batch window's sort order:
      // equal-ts hops stay inclusive (view before click before buy)
      evs.sortBy(e => (e.us, e.stage, e.id)).foldLeft(st) { (s, e) =>
        e.stage match {
          case 0 =>
            s.copy(lastViewUs = Some(e.us),
              firstViewUs = s.firstViewUs.orElse(Some(e.us)))
          case 1 =>
            if (s.lastViewUs.exists(v => e.us - v <= horizonUs))
              s.copy(lastQcUs = Some(e.us),
                firstQcUs = s.firstQcUs.orElse(Some(e.us)))
            else s
          case _ =>
            if (s.lastQcUs.exists(c => e.us - c <= horizonUs))
              s.copy(nConv = s.nConv + 1,
                firstConvUs = s.firstConvUs.orElse(Some(e.us)))
            else s
        }
      }

    def report(userId: Long, closed: FunnelState): Iterator[FunnelReport] =
      // the batch operator only reports funnel ENTRANTS (>=1 view)
      closed.firstViewUs.iterator.map(fv =>
        FunnelReport(userId, fv, closed.firstQcUs, closed.firstConvUs,
          closed.nConv))

    events
      .where(col("eventType").isin("view", "click", "purchase"))
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelReport](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // timeout ⇒ watermark passed lastEvent + quiet, so every
            // pending event is already orderable: fold the tail, emit
            // a CUMULATIVE report, and keep the compact machine (the
            // adjacentPairs discipline) — a user returning inside
            // horizonMinutes must still chain off their pre-gap
            // view/click, and their next quiet report then supersedes
            // this one. Without the keep, the default parameters
            // (horizon 24 h >> quiet 1 h) would lose a qualifying
            // predecessor across every quiet gap and diverge from the
            // batch twin. With a retention bound, the keep lasts until
            // the watermark passes lastEvent + retention: the fire at
            // that point re-emits the (unchanged) cumulative report
            // and drops the state.
            val closed = fold(state.get, state.get.pending)
            keepOrEvict(state, closed.copy(pending = Vector.empty),
              closed.lastEventUs, retentionUs)
            report(userId, closed)
          } else {
            val empty = FunnelState(Vector.empty, None, None, None, None,
              None, 0L, 0L)
            val st0 = state.getOption.getOrElse(empty)
            val arrivals = it.map { e =>
              val stage = e.eventType match {
                case "view" => 0; case "click" => 1; case _ => 2
              }
              PendEv(microsOf(e.ts), stage, e.eventId)
            }.toVector
            // fold only what the watermark has STRICTLY sealed
            // (us < wm, matching asofJoin's discipline). Measured
            // boundary (EventStreamsSpec): Spark's late filter drops
            // rows with eventTime <= watermark, so every admitted
            // arrival is strictly ABOVE wm and an inclusive seal is
            // also safe today — the strict seal keeps both operators
            // on one rule and stays correct even if that admission
            // boundary ever becomes exclusive.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (ready, still) =
              (st0.pending ++ arrivals).partition(_.us < wmUs)
            val folded = fold(st0, ready)
            val lastUs = (st0.lastEventUs +: arrivals.map(_.us)).max
            state.update(folded.copy(pending = still, lastEventUs = lastUs))
            state.setTimeoutTimestamp(lastUs / 1000L + quietMs)
            Iterator.empty
          }
      }
  }

  /** One streaming as-of match: a purchase paired with the latest
    * prior-or-equal view by the same user (None = no view yet). */
  final case class AsofMatch(purchaseId: Long, userId: Long,
      purchaseUs: Long, value: Double, viewId: Option[Long],
      viewUs: Option[Long], gapUs: Option[Long])

  private[streaming] final case class PendAsof(
      us: Long, tag: Int, id: Long, value: Double)

  private[streaming] final case class AsofState(
      pending: Seq[PendAsof], lastBuildId: Option[Long],
      lastBuildUs: Option[Long], lastEventUs: Long)

  /** Streaming as-of join — the continuous form of the batch
    * `e01_asof_join`: each purchase is matched to the latest view by
    * the same user at-or-before it (inclusive ties, same
    * `(us, tag, id)` order as the batch window's sort).
    *
    * Same reorder-buffer discipline as [[funnel]], but EMIT-ON-SEAL:
    * arrivals buffer in state and fold once the watermark passes them
    * — matched rows stream out as soon as their order is decidable,
    * not when the user goes quiet. The fold carries only the running
    * "latest view" (two longs), so state is the reorder buffer plus
    * three scalars; an event-time quiet timeout flushes idle users'
    * buffers but keeps those scalars (the [[adjacentPairs]]
    * discipline), so a purchase after an idle gap still matches its
    * pre-gap view exactly as batch e01 does. `retentionMinutes`
    * bounds the keep for long-running deployments: once the watermark
    * passes `lastEvent + retention` the user's state is dropped, and
    * a purchase arriving after the eviction matches `viewId = None`
    * across the evicted gap — the documented price of the bound.
    * None (default) = keep, exact batch parity. Sealing is STRICT
    * (`us < watermark`): Spark admits
    * late rows AT the watermark, so an inclusive seal could fold a
    * probe before an equal-timestamp view arrives and miss the
    * tie-inclusive match. */
  def asofJoin(events: Dataset[Event],
      quietMinutes: Long = 60,
      watermark: String = "10 minutes",
      retentionMinutes: Option[Long] = None): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    val quietMs = quietMinutes * 60000L
    val retentionUs = retentionMicros(retentionMinutes)

    def fold(userId: Long, st: AsofState, evs: Seq[PendAsof])
        : (AsofState, Vector[AsofMatch]) = {
      var s = st
      var out = Vector.empty[AsofMatch]
      evs.sortBy(e => (e.us, e.tag, e.id)).foreach { e =>
        if (e.tag == 0)
          s = s.copy(lastBuildId = Some(e.id), lastBuildUs = Some(e.us))
        else
          out :+= AsofMatch(e.id, userId, e.us, e.value,
            s.lastBuildId, s.lastBuildUs, s.lastBuildUs.map(e.us - _))
      }
      (s, out)
    }

    events
      .where(col("eventType").isin("view", "purchase"))
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[AsofState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark > timeout ≥ every pending event: all sealed.
            // Flush the buffer but KEEP the last-view scalars (the
            // adjacentPairs discipline): a purchase after an idle gap
            // must still match the pre-gap view, exactly as batch e01
            // does — unbounded eviction here would turn that match
            // into a wrong viewId=None. With a retention bound, the
            // keep ends once the watermark passes lastEvent +
            // retention (opt-in state cap; post-eviction purchases
            // match None).
            val (s2, out) = fold(userId, state.get, state.get.pending)
            keepOrEvict(state, s2.copy(pending = Vector.empty),
              s2.lastEventUs, retentionUs)
            out.iterator
          } else {
            val st0 = state.getOption
              .getOrElse(AsofState(Vector.empty, None, None, 0L))
            val arrivals = it.map { e =>
              PendAsof(microsOf(e.ts),
                if (e.eventType == "view") 0 else 1, e.eventId, e.value)
            }.toVector
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (ready, still) =
              (st0.pending ++ arrivals).partition(_.us < wmUs)
            val (s2, out) = fold(userId, st0, ready)
            val lastUs = (st0.lastEventUs +: arrivals.map(_.us)).max
            state.update(s2.copy(pending = still, lastEventUs = lastUs))
            state.setTimeoutTimestamp(lastUs / 1000L + quietMs)
            out.iterator
          }
      }
  }

  final case class AdjPair(
      userId: Long, prevType: String, nextType: String, gapUs: Long)
  private[streaming] final case class PendAdj(us: Long, id: Long, tpe: String)
  private[streaming] final case class AdjState(
      pending: Seq[PendAdj], lastUs: Long, lastId: Long, lastType: String,
      hasLast: Boolean, lastEventUs: Long)

  /** Streaming per-user ADJACENT-EVENT pairs — the shared primitive
    * under the batch lag-window operators (`e06_gap_quantiles`,
    * `e08_event_transitions`): each consecutive (prev, next) pair of
    * a user's event-time-ordered stream is emitted EXACTLY once, as
    * soon as the watermark makes its order decidable (the
    * [[asofJoin]] reorder-buffer discipline, strict `us <` seal).
    *
    * The chain survives quiet periods: the event-time timeout flushes
    * every sealed pair but KEEPS the compact last-event scalars
    * (three longs + a type) instead of evicting, so a user returning
    * after an idle gap still pairs with their pre-gap last event —
    * without that, the twin would drop exactly the long-gap pairs
    * e06's p95 exists to surface. Idle-user state is therefore three
    * scalars, the same per-user footprint the batch operator's
    * shuffle holds. `retentionMinutes` bounds it for long-running
    * deployments: once the watermark passes `lastEvent + retention`
    * the chain head is dropped, losing exactly the boundary pair a
    * post-eviction return would have formed. None (default) = keep,
    * exact batch parity.
    *
    * Read-side folds [[transitionsAt]] / [[gapQuantilesAt]] aggregate
    * the emitted pairs into the batch reports with identical integer
    * arithmetic (EventStreamsSpec pins both batch-exact). */
  def adjacentPairs(events: Dataset[Event],
      quietMinutes: Long = 60,
      watermark: String = "10 minutes",
      retentionMinutes: Option[Long] = None): Dataset[AdjPair] = {
    import events.sparkSession.implicits._
    val quietMs = quietMinutes * 60000L
    val retentionUs = retentionMicros(retentionMinutes)

    def fold(userId: Long, st: AdjState, evs: Seq[PendAdj])
        : (AdjState, Vector[AdjPair]) = {
      var s = st
      var out = Vector.empty[AdjPair]
      // (us, id) ascending = the batch window's (ev_us, event_id) sort
      evs.sortBy(e => (e.us, e.id)).foreach { e =>
        if (s.hasLast)
          out :+= AdjPair(userId, s.lastType, e.tpe, e.us - s.lastUs)
        s = s.copy(lastUs = e.us, lastId = e.id, lastType = e.tpe,
          hasLast = true)
      }
      (s, out)
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AdjState, AdjPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[AdjState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark > timeout ≥ every pending event: all sealed.
            // Keep the compact chain head; drop only the buffer —
            // unless a retention bound says the watermark has passed
            // lastEvent + retention, in which case drop it all.
            val (s2, out) = fold(userId, state.get, state.get.pending)
            keepOrEvict(state, s2.copy(pending = Vector.empty),
              s2.lastEventUs, retentionUs)
            out.iterator
          } else {
            val st0 = state.getOption.getOrElse(
              AdjState(Vector.empty, 0L, 0L, "", hasLast = false, 0L))
            val arrivals = it.map(e =>
              PendAdj(microsOf(e.ts), e.eventId, e.eventType)).toVector
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (ready, still) =
              (st0.pending ++ arrivals).partition(_.us < wmUs)
            val (s2, out) = fold(userId, st0, ready)
            val lastUs = (st0.lastEventUs +: arrivals.map(_.us)).max
            state.update(s2.copy(pending = still, lastEventUs = lastUs))
            state.setTimeoutTimestamp(lastUs / 1000L + quietMs)
            out.iterator
          }
      }
  }

  final case class Transition(
      prevType: String, nextType: String, nTransitions: Long, pPpm: Long)

  /** Fold emitted [[AdjPair]]s into the batch e08 transition matrix —
    * identical BIGINT count / `div` ppm arithmetic. */
  def transitionsAt(pairs: Seq[AdjPair]): Seq[Transition] = {
    val counts = pairs.groupBy(p => (p.prevType, p.nextType))
      .map { case (k, v) => k -> v.size.toLong }
    val prevTotals = counts.groupBy(_._1._1)
      .map { case (p, m) => p -> m.values.sum }
    counts.toSeq.sortBy(_._1).map { case ((p, n), c) =>
      Transition(p, n, c, c * 1000000L / prevTotals(p))
    }
  }

  final case class GapQuantiles(
      eventType: String, nGaps: Long, minGapS: Long,
      p50GapS: Long, p95GapS: Long, maxGapS: Long)

  /** Fold emitted [[AdjPair]]s into the batch e06 gap-quantile rows:
    * whole-second gaps grouped by the LATER event's type, quantiles by
    * the same integer-rank rule (smallest value whose cumulative count
    * clears ⌈p·n⌉ — `cum·100 ≥ n·p`). */
  def gapQuantilesAt(pairs: Seq[AdjPair]): Seq[GapQuantiles] = {
    pairs.groupBy(_.nextType).toSeq.sortBy(_._1).map { case (t, ps) =>
      val gaps = ps.map(p => Math.floorDiv(p.gapUs, 1000000L)).sorted
      val n = gaps.length.toLong
      def atLeast(pct: Int): Long =
        gaps(gaps.indices.find(i => (i + 1).toLong * 100 >= n * pct).get)
      GapQuantiles(t, n, gaps.head, atLeast(50), atLeast(95), gaps.last)
    }
  }

  /** Streaming range join — the continuous form of the batch
    * `e03_range_join`: for every purchase, how many views by the same
    * user in the prior `lookbackMinutes` (exclusive-open,
    * inclusive-close bounds, identical to batch). One report row per
    * purchase, including ZERO-view purchases.
    *
    * Shape: two filtered branches of the SAME event stream meet in a
    * stream-stream LEFT OUTER join with an event-time interval
    * condition — Spark's join state keeps only the lookback horizon
    * per side (bounded by the watermark), and unmatched purchases
    * surface as null-view rows once the horizon expires, preserving
    * the batch operator's zero counts. The per-purchase count is a
    * chained streaming aggregation grouped on a 1-minute window of
    * the purchase time (multiple stateful operators in append mode;
    * the window is finer than any report cadence and each purchase_id
    * is unique, so the window key only schedules EMISSION — it never
    * merges or splits purchases). */
  def viewsBeforePurchase(events: Dataset[Event],
      lookbackMinutes: Long = 60,
      watermark: String = "10 minutes"): DataFrame = {
    val views = events.toDF()
      .where(col("eventType") === "view")
      .select(col("userId").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val purchases = events.toDF()
      .where(col("eventType") === "purchase")
      .select(col("eventId").as("purchase_id"),
        col("userId").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    purchases
      .join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") > col("p_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
          col("v_ts") <= col("p_ts"),
        "left_outer")
      .groupBy(col("purchase_id"), col("p_user").as("user_id"),
        window(col("p_ts"), "1 minute"))
      .agg(count(col("v_ts")).as("n_views"))
      .select(col("purchase_id"), col("user_id"),
        col("window.start").as("purchase_minute"), col("n_views"))
  }

  private[streaming] final case class SessPend(
      us: Long, id: Long, value: Double)
  private[streaming] final case class SessState(
      pending: Seq[SessPend], open: Option[SessionState])

  /** Gap-based sessionization — the continuous per-session form of
    * the batch `e02_sessionize` gap rule: events strictly more than
    * `gapMinutes` apart start a new session, micros arithmetic, ties
    * ordered by `(us, event_id)` like the batch window sort.
    *
    * Same reorder-buffer discipline as [[funnel]]/[[asofJoin]]:
    * arrivals buffer in state and fold only once the watermark seals
    * them (strict `us < wm`), so the emitted session set is a pure
    * function of the EVENT set, never of micro-batch boundaries. The
    * two divergences this discipline removes: an in-batch gap used to
    * close a session eagerly, before the watermark ruled out a
    * late-but-admissible bridging event in a later batch (mis-split);
    * and a late event older than the stored start used to extend the
    * session backwards with no gap check (mis-merge whenever the
    * watermark delay exceeds the gap). Seals are monotone in the
    * watermark, so nothing sealed now can precede anything sealed
    * earlier — the fold sees one globally ordered stream, exactly the
    * batch window's view. A session closes only when the split is
    * DECIDED: a sealed event strictly more than the gap after its
    * end, or the watermark itself passing `end + gap` (every future
    * admissible event is then past the gap). State fully evicts once
    * closed — unlike [[adjacentPairs]] no scalar survives, because
    * the batch gap rule carries nothing across a closed gap. */
  def sessionize(events: Dataset[Event],
      gapMinutes: Long = 30,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    def fold(userId: Long, open0: Option[SessionState], evs: Seq[SessPend])
        : (Option[SessionState], Vector[Session]) = {
      var open = open0
      var out = Vector.empty[Session]
      evs.sortBy(e => (e.us, e.id)).foreach { e =>
        open match {
          case Some(s) if e.us - s.end > gapUs =>
            out :+= Session(userId, tsOfMicros(s.start),
              tsOfMicros(s.end), s.n, s.total)
            open = Some(SessionState(e.us, e.us, 1, e.value))
          case Some(s) =>
            open = Some(SessionState(s.start, math.max(s.end, e.us),
              s.n + 1, s.total + e.value))
          case None =>
            open = Some(SessionState(e.us, e.us, 1, e.value))
        }
      }
      (open, out)
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          // one body serves both data arrivals and timeout wakeups:
          // fold whatever the watermark has sealed, then let the
          // watermark decide any remaining close
          val st0 = state.getOption.getOrElse(SessState(Vector.empty, None))
          val arrivals = it.map(e =>
            SessPend(microsOf(e.ts), e.eventId, e.value)).toVector
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, still) =
            (st0.pending ++ arrivals).partition(_.us < wmUs)
          var (open, out) = fold(userId, st0.open, ready)
          open match {
            case Some(s) if wmUs > s.end + gapUs =>
              out :+= Session(userId, tsOfMicros(s.start),
                tsOfMicros(s.end), s.n, s.total)
              open = None
            case _ => ()
          }
          if (open.isEmpty && still.isEmpty) state.remove()
          else {
            state.update(SessState(still, open))
            // wake at the EARLIEST decision point: the open session's
            // gap lapse, or the first buffered event's seal; clamped
            // strictly above the current watermark (firing at
            // wm_ms > floor(us/1000) guarantees the strict micros
            // inequality on both decisions)
            val wakeUs = (open.map(_.end + gapUs).toSeq ++
              still.map(_.us)).min
            state.setTimeoutTimestamp(math.max(
              Math.floorDiv(wakeUs, 1000L),
              state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }

  final case class DayBucket(day: Long, n: Long, nPurchase: Long)

  final case class EngagementBuckets(
      userId: Long, nEvents: Long, lastDay: Long, buckets: Seq[DayBucket])

  final case class EngagementScore(
      userId: Long, nEvents: Long, nRecent: Long, lastSeenDays: Long,
      engagementQ: Long, engagement: Double, purchaseQ: Long)

  private[streaming] final case class EngState(
      buckets: Map[Long, (Long, Long)], nEvents: Long, lastEventUs: Long)

  /** Streaming twin of the batch `e07_decayed_engagement`: per-user
    * decayed-engagement STATE maintained continuously. The batch
    * operator's calendar-day aging is exactly what makes this
    * streamable with bounded state: the ref-dependent part of the
    * score is only the per-day weight, so the state is the per-user
    * histogram of (event day → count, purchases) and ANY reader folds
    * the same power-of-two weights at its own reference day
    * ([[scoreAt]]) — bit-identical to running the batch query with
    * that reference, because both sides do exact integer arithmetic.
    *
    * State bound: buckets [[graft.queries.EventPipeline.DecayZeroWeeks]]
    * weeks behind the user's newest day carry weight zero at every
    * later reference, so they are pruned on update — at most ~13
    * weeks × 7 day-entries per active user, regardless of history
    * length (`nEvents` keeps counting the pruned mass, matching the
    * batch `n_events`). Emitted in Update mode per trigger; the
    * latest row per user is the user's current histogram.
    *
    * The PER-USER bound still multiplies by unbounded distinct users;
    * `retentionMinutes` caps that for long-running deployments: the
    * input is watermarked (`watermark`, only then) and a user idle
    * past the bound has their final histogram re-emitted (content-
    * identical — last-write-wins readers are unchanged) and their
    * state dropped. TWO documented prices: a return after eviction
    * restarts `n_events` from zero, and the watermark bounds
    * late-event ABSORPTION for live users too — a row arriving later
    * than the bound is dropped where the unwatermarked default
    * absorbs arbitrary lateness via the histogram re-statement — so
    * size `watermark` to the corpus's real disorder. None (default)
    * = keep, exact batch parity, no watermark applied. */
  def decayedEngagement(events: Dataset[Event],
      purchaseType: String = "purchase",
      retentionMinutes: Option[Long] = None,
      watermark: String = "10 minutes"): Dataset[EngagementBuckets] = {
    val spark = events.sparkSession
    import spark.implicits._
    val horizonDays = 7L * graft.queries.EventPipeline.DecayZeroWeeks
    val retentionUs = retentionMicros(retentionMinutes)
    val (src, timeout) = retentionSource(events, retentionUs, watermark)
    src
      .groupByKey(_.userId)
      .mapGroupsWithState[EngState, EngagementBuckets](timeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[EngState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            // idle past retention: re-emit the final histogram
            // (unchanged content) and drop the state
            val prev = state.get
            val maxDay = prev.buckets.keys.max
            state.remove()
            EngagementBuckets(userId, prev.nEvents, maxDay,
              prev.buckets.toSeq.sortBy(_._1)
                .map { case (d, (c, p)) => DayBucket(d, c, p) })
          } else {
            val prev = state.getOption.getOrElse(EngState(Map.empty, 0L, 0L))
            var buckets = prev.buckets
            var n = prev.nEvents
            // the arm must come from the user's RUNNING-max event time,
            // not this batch's max: an out-of-order trailing arrival
            // (admitted above the watermark but behind the user's
            // newest event) would otherwise pull eviction earlier than
            // the documented lastEvent + retention
            var lastUs = prev.lastEventUs
            evs.foreach { e =>
              val day = dayOf(e.ts)
              val (c, p) = buckets.getOrElse(day, (0L, 0L))
              buckets += day ->
                (c + 1L, p + (if (e.eventType == purchaseType) 1L else 0L))
              n += 1
              lastUs = math.max(lastUs, microsOf(e.ts))
            }
            val maxDay = buckets.keys.max
            buckets = buckets.filter { case (d, _) => maxDay - d < horizonDays }
            state.update(EngState(buckets, n, lastUs))
            armRetention(state, lastUs, retentionUs)
            EngagementBuckets(userId, n, maxDay,
              buckets.toSeq.sortBy(_._1)
                .map { case (d, (c, p)) => DayBucket(d, c, p) })
          }
      }
  }

  final case class DayCount(day: Long, n: Long)
  final case class TypeDayCounts(
      eventType: String, nDays: Long, buckets: Seq[DayCount])
  final case class DayAnomaly(
      eventType: String, day: Long, cnt: Long, devN: Long, isAnomaly: Long)
  private[streaming] final case class DailyState(buckets: Map[Long, Long])

  /** Streaming twin of the batch e09 daily-volume anomaly
    * ([[graft.queries.EventPipeline.dailyAnomaly]]): per event type,
    * maintain the (day → count) histogram as keyed state and emit it
    * per trigger; the |z| > 2 decision needs the full-window moments,
    * so the test itself is the read-side fold [[anomaliesAt]] over the
    * emitted histogram — the e07 split (stream accumulates exact
    * integers, reader folds), which keeps the stream bit-identical to
    * the batch rows at any point in time.
    *
    * State bound: ONE bucket per calendar day per type — state grows
    * with elapsed TIME (365 entries/type/year), not with event
    * volume, and the type domain is the instrumentation's bounded
    * vocabulary. A deployment wanting a rolling baseline prunes
    * buckets older than its window here, exactly like e07's horizon
    * prune; the batch operator's all-days semantics keeps them. */
  def dailyCounts(events: Dataset[Event]): Dataset[TypeDayCounts] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .mapGroupsWithState[DailyState, TypeDayCounts](
        GroupStateTimeout.NoTimeout) {
        (tpe: String, evs: Iterator[Event], state: GroupState[DailyState]) =>
          var buckets = state.getOption.map(_.buckets)
            .getOrElse(Map.empty[Long, Long])
          evs.foreach { e =>
            val day = dayOf(e.ts)
            buckets += day -> (buckets.getOrElse(day, 0L) + 1L)
          }
          state.update(DailyState(buckets))
          TypeDayCounts(tpe, buckets.size.toLong,
            buckets.toSeq.sortBy(_._1).map { case (d, n) => DayCount(d, n) })
      }
  }

  /** Fold a type's day histogram into the batch e09 rows — the same
    * all-BIGINT `(cnt·n − s1)² > 4·(n·s2 − s1²)` inequality. */
  def anomaliesAt(t: TypeDayCounts): Seq[DayAnomaly] = {
    val n = t.buckets.length.toLong
    val s1 = t.buckets.map(_.n).sum
    val s2 = t.buckets.map(b => b.n * b.n).sum
    t.buckets.map { b =>
      val dev = b.n * n - s1
      DayAnomaly(t.eventType, b.day, b.n, dev,
        if (dev * dev > 4L * (n * s2 - s1 * s1)) 1L else 0L)
    }
  }

  final case class UserActivity(
      userId: Long, cohortDay: Long, buckets: Seq[DayCount])
  final case class CohortCell(
      cohortDay: Long, dayOffset: Long, nActiveUsers: Long,
      nEvents: Long, cohortSize: Long, retainedPpm: Long)
  private[streaming] final case class ActState(
      buckets: Map[Long, Long], lastEventUs: Long)

  /** Streaming twin of the batch e11 cohort retention matrix
    * ([[graft.queries.EventPipeline.cohortMatrix]]): per user,
    * maintain the (active day → event count) histogram as keyed
    * state and emit it (with the user's current cohort = min day)
    * per trigger; the matrix needs cross-user aggregation, so the
    * test is the read-side fold [[cohortMatrixAt]] over the latest
    * per-user rows — the e07/e09 split (stream accumulates exact
    * integers, reader folds). Out-of-order arrivals are absorbed by
    * construction: a late earlier-day event just lowers the user's
    * min, and the next emission re-states the whole histogram.
    *
    * State bound: one bucket per ACTIVE calendar day per user —
    * grows with time, not event volume (e07's horizon-prune applies
    * verbatim for deployments with a bounded retention window).
    * `retentionMinutes` additionally caps the unbounded DISTINCT-USER
    * axis, exactly like [[decayedEngagement]]'s knob: watermarked
    * input (only then), idle-past-bound users re-emit their final
    * histogram (content-identical) and drop; a post-eviction return
    * restarts the user's cohort at their new min day, and the
    * watermark bounds late-event absorption for live users (size it
    * to the corpus's disorder — see [[decayedEngagement]]) — the
    * documented prices. None (default) = keep, exact batch parity. */
  def userActivity(events: Dataset[Event],
      retentionMinutes: Option[Long] = None,
      watermark: String = "10 minutes"): Dataset[UserActivity] = {
    val spark = events.sparkSession
    import spark.implicits._
    val retentionUs = retentionMicros(retentionMinutes)
    val (src, timeout) = retentionSource(events, retentionUs, watermark)
    src
      .groupByKey(_.userId)
      .mapGroupsWithState[ActState, UserActivity](timeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[ActState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            val buckets = state.get.buckets
            state.remove()
            UserActivity(userId, buckets.keys.min,
              buckets.toSeq.sortBy(_._1).map { case (d, n) => DayCount(d, n) })
          } else {
            val prev = state.getOption.getOrElse(ActState(Map.empty, 0L))
            var buckets = prev.buckets
            // running-max arm, see decayedEngagement
            var lastUs = prev.lastEventUs
            evs.foreach { e =>
              val day = dayOf(e.ts)
              buckets += day -> (buckets.getOrElse(day, 0L) + 1L)
              lastUs = math.max(lastUs, microsOf(e.ts))
            }
            state.update(ActState(buckets, lastUs))
            armRetention(state, lastUs, retentionUs)
            UserActivity(userId, buckets.keys.min,
              buckets.toSeq.sortBy(_._1).map { case (d, n) => DayCount(d, n) })
          }
      }
  }

  final case class RollingFeature(
      userId: Long, day: Long, nDay: Long, n7d: Long, activeDays7d: Long)

  /** Fold a user's day histogram into the batch e10 rolling-feature
    * rows ([[graft.queries.EventPipeline.rollingFeatures]]): per
    * active day, that day's count plus the trailing-7-day event count
    * and active-day count over the integer day axis ([day−6, day] —
    * the batch RANGE frame, so gap days are skipped identically).
    * Same state shape as e07/e09/e11: the stream accumulates exact
    * per-day integers, the reader folds — so out-of-order and late
    * arrivals are absorbed by the histogram re-statement, and the
    * fold is bit-identical to batch at any point in time. */
  def rollingFeaturesAt(u: UserActivity): Seq[RollingFeature] =
    u.buckets.sortBy(_.day).map { b =>
      val in7 = u.buckets.filter(x => x.day >= b.day - 6 && x.day <= b.day)
      RollingFeature(u.userId, b.day, b.n, in7.map(_.n).sum, in7.size.toLong)
    }

  /** Fold the latest per-user activity rows into the batch e11
    * matrix — identical BIGINT count/ppm arithmetic. */
  def cohortMatrixAt(users: Seq[UserActivity]): Seq[CohortCell] = {
    val cells = users
      .flatMap(u => u.buckets.map(b =>
        (u.cohortDay, b.day - u.cohortDay) -> b.n))
      .groupBy(_._1)
      .map { case ((c, o), vs) => (c, o, vs.size.toLong, vs.map(_._2).sum) }
      .toSeq
    val sizes = cells.collect { case (c, 0L, nu, _) => c -> nu }.toMap
    cells.sortBy(x => (x._1, x._2)).map { case (c, o, nu, ne) =>
      val size = sizes(c)
      CohortCell(c, o, nu, ne, size, nu * 1000000L / size)
    }
  }

  /** Fold a user's day histogram into the batch e07 report row at
    * reference day `refDay` — the read-side scoring every consumer
    * runs against its own "now". Exact integer arithmetic identical
    * to the batch operator's. */
  def scoreAt(b: EngagementBuckets, refDay: Long): EngagementScore = {
    import graft.queries.EventPipeline.{DecayBaseQ, DecayZeroWeeks}
    // A reference before the user's newest event would mean negative
    // ages (a negative shift count — silent garbage in JVM `>>`);
    // the state is also only exact for references at or after its
    // pruning horizon's anchor. Refuse loudly instead.
    require(refDay >= b.lastDay,
      s"refDay $refDay precedes user ${b.userId}'s newest day ${b.lastDay}")
    def wq(ageDays: Long): Long = {
      val weeks = Math.floorDiv(ageDays, 7L)
      if (weeks >= DecayZeroWeeks) 0L else DecayBaseQ.toLong >> weeks.toInt
    }
    val ages = b.buckets.map(d => (refDay - d.day, d))
    // one binding: engagement must equal engagementQ / DecayBaseQ by
    // construction, not by two expressions staying textually in sync
    val engagementQ = ages.map { case (a, d) => d.n * wq(a) }.sum
    EngagementScore(
      b.userId,
      b.nEvents,
      ages.collect { case (a, d) if a < 7 => d.n }.sum,
      refDay - b.lastDay,
      engagementQ,
      engagementQ.toDouble / DecayBaseQ,
      ages.map { case (a, d) => d.nPurchase * wq(a) }.sum)
  }
}
