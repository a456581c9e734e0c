package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Cache-ownership discipline for operator-intermediate frames, in
  * ONE place (TextPipeline and VectorPipeline each carried a verbatim
  * copy): frames are cached once per (session, canonicalized plan) —
  * same source + same query shape hits the same entry, so re-runs
  * reuse instead of re-materializing — and dropped per session by
  * [[invalidate]]. A bare per-invocation `.cache()` has NO owner
  * (ContextCleaner reclaims RDDs, not Dataset cache entries), so each
  * re-run would pin one more cached copy until session stop, and a
  * re-ingested corpus would keep serving the OLD data (Spark's
  * CacheManager substitutes by canonicalized plan). */
private[graft] final class PlanKeyedCache {

  private val entries = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, LogicalPlan), DataFrame]()

  /** The cached twin of `df` (materialized lazily by the first
    * action, shared by every later call with the same plan). */
  def apply(df: DataFrame): DataFrame =
    entries.computeIfAbsent(
      (df.sparkSession, df.queryExecution.analyzed.canonicalized),
      _ => df.cache())

  /** Unpersist and forget this session's entries (session stop /
    * corpus re-ingest). */
  def invalidate(s: SparkSession): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        e.getValue.unpersist()
        it.remove()
      }
    }
  }
}
