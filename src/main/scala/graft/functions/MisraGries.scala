package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries frequency summary: at most `capacity`
  * counters plus the exact stream length.
  *
  * Invariant (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): for every token,
  * `est ≤ true ≤ est + D` where `D` is the cumulative decrement —
  * and `D ≤ total / (capacity + 1)`, because each unit of decrement
  * removes `capacity + 1` units of count mass (the arriving token's
  * plus one from each stored counter) and only `total` mass ever
  * enters. Hence any token whose true frequency exceeds
  * `total / (capacity + 1)` is guaranteed a surviving counter.
  * `counts.values.sum == total` if and only if no decrement ever
  * happened, i.e. the summary is exact.
  */
final case class MgSummary(counts: Map[String, Long], total: Long)

/** Typed Spark aggregator computing [[MgSummary]] over a token
  * column. Spark's partial aggregation runs [[reduce]] per partition
  * and [[merge]] across partitions, so the shuffle carries one
  * ≤`capacity`-entry map per partition instead of the full token
  * vocabulary — this is what makes corpus-scale top-k feasible
  * without a vocabulary-wide Exchange (see
  * [[graft.queries.TextPipeline]] td19).
  *
  * The miss-on-full path decrements all counters (O(capacity), the
  * textbook step); heavy-hitter-skewed streams take it rarely
  * because hot tokens hit their counter. A SpaceSaving-style
  * min-eviction would be O(log capacity) but overcounts, breaking
  * the `est ≤ true` direction the td19 validity check relies on.
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, MgSummary, MgSummary] {
  require(capacity > 0, s"capacity must be positive: $capacity")

  override def zero: MgSummary = MgSummary(Map.empty, 0L)

  override def reduce(b: MgSummary, token: String): MgSummary = {
    val c = b.counts
    val next = c.get(token) match {
      case Some(v) => c.updated(token, v + 1L)
      case None if c.size < capacity => c.updated(token, 1L)
      case None =>
        // full + miss: the arriving token and one unit from every
        // stored counter annihilate (capacity + 1 mass per step)
        c.collect { case (k, v) if v > 1L => k -> (v - 1L) }
    }
    MgSummary(next, b.total + 1L)
  }

  override def merge(a: MgSummary, b: MgSummary): MgSummary = {
    val summed = b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    val trimmed =
      if (summed.size <= capacity) summed
      else {
        // subtract the (capacity+1)-th largest count from every
        // counter and drop the non-positive — the mergeable-summaries
        // analogue of the decrement step, same error accounting
        val cut = summed.valuesIterator.toArray
          .sorted(Ordering[Long].reverse).apply(capacity)
        summed.collect { case (k, v) if v > cut => k -> (v - cut) }
      }
    MgSummary(trimmed, a.total + b.total)
  }

  override def finish(r: MgSummary): MgSummary = r
  override def bufferEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
