package graft.dq

/** Per-column profile results, mirroring the reference DQ engine's
  * nested-dict profile (reference `src/dq.py:39-79`): counts, nulls,
  * distinct (null-excluded, pandas `nunique` semantics), type-specific
  * stats, and top-k value counts.
  */
final case class NumericStats(
    min: Double, max: Double, mean: Double, stdPop: Double,
    p50: Double, p95: Double)

final case class TimestampStats(min: String, max: String)

final case class StringLengthStats(minLen: Long, maxLen: Long, p95Len: Double)

final case class TopValue(value: String, count: Long)

final case class ColumnProfile(
    column: String,
    count: Long,
    nulls: Long,
    distinct: Long,
    numeric: Option[NumericStats] = None,
    timestamp: Option[TimestampStats] = None,
    stringLength: Option[StringLengthStats] = None,
    topValues: Seq[TopValue] = Nil)

/** Result of one rule evaluation (reference `src/dq.py:83-87`). */
final case class RuleResult(
    rule: String,
    column: String,
    passed: Boolean,
    details: Map[String, String])

final case class DqReport(
    profile: Seq[ColumnProfile],
    results: Seq[RuleResult],
    markdown: String) {
  def passed: Boolean = results.forall(_.passed)
}
