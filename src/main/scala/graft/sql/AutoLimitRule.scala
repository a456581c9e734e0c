package graft.sql

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Command, GlobalLimit, Limit, LocalLimit, LogicalPlan, Subquery}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-level auto-LIMIT (SURVEY.md §4; reference appends `LIMIT 200`
  * to the SQL text when the substring "limit" is absent,
  * `src/sql_runner.py:28-31`): a Catalyst `Rule[LogicalPlan]` that
  * wraps a PARSED statement plan lacking any limit in
  * `GlobalLimit(rows)` — semantically what the reference intends, but
  * robust to "limit" appearing in identifiers or string literals.
  *
  * It is deliberately applied by [[QueryRunner]] to the parsed plan of
  * the guarded statement, NOT injected into the session's
  * analyzer/optimizer via extensions. Both injection phases were tried
  * and are unsound for this rule: optimizer-phase rules re-run on
  * every subquery with a `Subquery` root that `OptimizeSubqueries`
  * then destructures (crash on any IN/EXISTS query), and
  * `EliminateLimits` can legitimately erase a user's explicit `LIMIT`
  * before the rule looks for one (silent re-cap → wrong results);
  * analyzer post-hoc rules additionally run on internal encoder plan
  * fragments that must round-trip unchanged. The parsed statement
  * plan is exactly what the user wrote — the right place to decide.
  */
class AutoLimitRule(rows: Int) extends Rule[LogicalPlan] {

  private def hasLimit(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case _: GlobalLimit => ()
      case _: LocalLimit => ()
    }.isDefined

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case c: Command => c
    case s: Subquery => s
    case p if hasLimit(p) => p
    case p => Limit(Literal(rows), p)
  }
}
