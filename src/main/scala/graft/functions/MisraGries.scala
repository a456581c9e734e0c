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

/** Mutable aggregation buffer for [[MisraGries]] (r20): the reduce
  * path used to thread an immutable `Map`, allocating a fresh HAMT
  * node path per arriving token — pure per-row constant on a pass
  * that exists to scan whole corpora. Spark's typed imperative
  * aggregation (ObjectHashAggregate) keeps the buffer as a live
  * object per partition and only serializes it at the shuffle
  * boundary, so an in-place java.util.HashMap update is safe and
  * removes the per-row allocation entirely. Kryo-encoded: one
  * ≤capacity-entry map per partition crosses the shuffle, exactly as
  * before. */
final class MgBuf(
    val counts: java.util.HashMap[String, java.lang.Long],
    var total: Long) extends Serializable

/** Typed Spark aggregator computing [[MgSummary]] over a token
  * column. Spark's partial aggregation runs [[reduce]] per partition
  * and [[merge]] across partitions, so the shuffle carries one
  * ≤`capacity`-entry map per partition instead of the full token
  * vocabulary — this is what makes corpus-scale top-k feasible
  * without a vocabulary-wide Exchange (see
  * [[graft.queries.TextPipeline]] td19).
  *
  * The miss-on-full path decrements all counters in place
  * (O(capacity), the textbook step) and drops the zeros; on the
  * near-uniform profiles where misses dominate, most counters sit at
  * 1 and die on the first sweep, so the sweep amortizes to O(1) per
  * arrival. A SpaceSaving-style min-eviction would be O(log capacity)
  * worst-case but overcounts, breaking the `est ≤ true` direction the
  * td19 validity check relies on.
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, MgBuf, MgSummary] {
  require(capacity > 0, s"capacity must be positive: $capacity")

  override def zero: MgBuf =
    new MgBuf(new java.util.HashMap[String, java.lang.Long], 0L)

  override def reduce(b: MgBuf, token: String): MgBuf = {
    val c = b.counts
    val cur = c.get(token)
    if (cur != null) c.put(token, cur + 1L)
    else if (c.size < capacity) c.put(token, 1L)
    else {
      // full + miss: the arriving token and one unit from every
      // stored counter annihilate (capacity + 1 mass per step)
      val it = c.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - 1L
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
    b.total += 1L
    b
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    val bit = b.counts.entrySet.iterator
    while (bit.hasNext) {
      val e = bit.next()
      val prev = a.counts.get(e.getKey)
      a.counts.put(e.getKey,
        if (prev == null) e.getValue else prev + e.getValue)
    }
    if (a.counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from every
      // counter and drop the non-positive — the mergeable-summaries
      // analogue of the decrement step, same error accounting
      val vals = new Array[Long](a.counts.size)
      var i = 0
      val vit = a.counts.values.iterator
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - 1 - capacity)
      val it = a.counts.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - cut
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
    a.total += b.total
    a
  }

  override def finish(r: MgBuf): MgSummary = {
    val b = Map.newBuilder[String, Long]
    val it = r.counts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> e.getValue.longValue
    }
    MgSummary(b.result(), r.total)
  }

  override def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
