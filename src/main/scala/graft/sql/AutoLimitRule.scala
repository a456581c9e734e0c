package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Command, GlobalLimit, Limit, LocalLimit, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-level auto-LIMIT (SURVEY.md §4; reference appends `LIMIT 200`
  * to the SQL text when the substring "limit" is absent,
  * `src/sql_runner.py:28-31`). Here it is a Catalyst optimizer rule:
  * if a guarded query's plan contains no limit anywhere, wrap it in
  * `GlobalLimit(rowLimit)` — semantically what the reference intends,
  * but robust to "limit" appearing in identifiers or strings.
  *
  * The rule is scoped: it only fires while the session conf
  * `graft.sql.autoLimit.enabled` is true (set by [[QueryRunner]]
  * around guarded executions), so internal/engine queries are never
  * capped. Idempotent by construction — a wrapped plan has a limit.
  */
class AutoLimitRule extends Rule[LogicalPlan] {

  private def hasLimit(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case _: GlobalLimit => ()
      case _: LocalLimit => ()
    }.isDefined

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val sqlConf = conf
    if (!sqlConf.getConfString("graft.sql.autoLimit.enabled", "false").toBoolean) plan
    else {
      val rows = sqlConf.getConfString("graft.sql.autoLimit.rows", "200").toInt
      plan match {
        case c: Command => c
        case p if hasLimit(p) => p
        case p => Limit(Literal(rows), p)
      }
    }
  }
}

/** `SparkSessionExtensions` installer: register with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.sql.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => new AutoLimitRule)
}
