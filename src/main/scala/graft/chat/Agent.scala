package graft.chat

import org.apache.spark.sql.SparkSession
import graft.metrics.Metrics
import graft.sql.{QueryRunner, SqlGuard}
import graft.sql.SqlGuard.IncorrectQuestionError

/** NL→SQL provider contract (reference `src/provider.py:103-110`).
  * Implementations return MARKDOWN (usually a ```sql fenced block).
  * The LLM-backed providers are out of parity scope (network); the
  * deterministic stub serves known question shapes for tests/demos.
  */
trait NlToSql {
  def complete(question: String, rowLimit: Int): String
}

/** Deterministic no-network provider: answers the reference's
  * canonical demo questions over the testdata schema; anything else
  * falls back to a probe query. Enough to drive the §3.1/§3.2 control
  * flow end-to-end without an LLM. */
class StubNlToSql extends NlToSql {
  override def complete(question: String, rowLimit: Int): String = {
    val q = question.toLowerCase
    val sql =
      if (q.contains("top") && q.contains("revenue"))
        """SELECT n_name AS nation, round(SUM(o_totalprice), 2) AS revenue
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
          |GROUP BY 1
          |ORDER BY revenue DESC
          |LIMIT 5""".stripMargin
      else if (q.contains("how many") || q.contains("count"))
        "SELECT COUNT(*) AS n FROM orders"
      else if (q.contains("drop") || q.contains("delete"))
        // adversarial-question stand-in: emits what a naive model might
        "DROP TABLE orders"
      else s"SELECT 1 AS x LIMIT $rowLimit"
    s"```sql\n$sql\n```"
  }
}

final case class CandidateSql(sql: String, reason: String)

final case class AgentResult(
    plan: String,
    candidates: Seq[CandidateSql],
    chosenSql: String,
    rows: Seq[String],
    explain: String,
    telemetry: Map[String, Long],
    lastError: Option[String])

/** Bounded generate → safety-check → execute → refine loop
  * (SURVEY.md §3.2; reference `src/route/chat.py:75-184`). The
  * "execute" leg is the Spark path via [[QueryRunner]]; control flow
  * is plain driver-side Scala.
  */
class Agent(
    spark: SparkSession,
    provider: NlToSql,
    // by-name so a facade-held agent re-reads the docs each run and a
    // POST /schema/refresh between runs is visible to the planner,
    // mirroring the reference's load_schema_docs() call INSIDE
    // make_plan (`chain.py:97`) rather than at worker start
    schemaDocs: => String,
    rowLimit: Int = 200,
    queryTimeoutMs: Long = 0) {

  private val runner = new QueryRunner(spark, rowLimit, queryTimeoutMs = queryTimeoutMs)

  /** Regenerate with feedback appended (reference `chain.py:42-55`;
    * the reduced row limit 100 is the reference's constant). */
  private def refine(question: String, feedback: String): String = {
    val hint =
      s"\nConstraints: Fix issue -> $feedback. Keep it a single safe " +
        "SELECT. Prefer simpler joins, ensure reasonable LIMIT."
    provider.complete(question + hint, rowLimit = 100)
  }

  /** §3.1 single-shot chat: generate → guard → run. Throws
    * [[IncorrectQuestionError]] for unsafe SQL (HTTP 400 analogue). */
  def chat(question: String): graft.sql.QueryResult = {
    Metrics.inc("ai_requests_total", Map("route" -> "chat"))
    runner.run(provider.complete(question, rowLimit))
  }

  /** §3.2 agent loop with bounded refine steps. `maxSteps` comes raw
    * off the HTTP body, so it is normalized like the reference's
    * `(inp.max_steps or 2)` — 0 is falsy in Python, so 0 (and
    * negatives, which would skip the loop and return an empty
    * non-answer) mean the default 2 — and CAPPED at 16: the reference
    * trusts the field unbounded, which lets one request drive
    * millions of provider calls + Spark queries on a handler thread
    * (resource DoS). 16 is far past any useful refine depth. */
  def run(question: String, maxSteps: Int = 2): AgentResult = {
    val steps = math.min(16, if (maxSteps <= 0) 2 else maxSteps)
    Metrics.inc("ai_requests_total", Map("route" -> "agent"))
    val plan = Planner.makePlan(question, schemaDocs)
    var candidates = Vector.empty[CandidateSql]
    var chosenSql = ""
    var rows = Seq.empty[String]
    var explain = ""
    var genMs = 0L
    var execMs = 0L
    var retries = 0
    var lastError: Option[String] = None

    def generate(q: String, rl: Int): String = {
      val t0 = System.nanoTime()
      val md = provider.complete(q, rl)
      genMs += (System.nanoTime() - t0) / 1000000
      md
    }

    // refinement generations count toward gen_ms too (the reference
    // times every nl_to_sql call, chat.py:88-154)
    def refineTimed(q: String, fb: String): String = {
      val t0 = System.nanoTime()
      val md = refine(q, fb)
      genMs += (System.nanoTime() - t0) / 1000000
      md
    }

    var draftMd = generate(question, rowLimit)
    var sql = SqlGuard.extractSqlFromMarkdown(draftMd)
    val (ok0, reason0) = SqlGuard.isSafe(sql)
    if (!ok0) {
      candidates :+= CandidateSql(sql, s"blocked: $reason0")
      retries += 1
      draftMd = refineTimed(question, s"unsafe: $reason0")
      sql = SqlGuard.extractSqlFromMarkdown(draftMd)
    }

    // Two deliberate parity quirks of this loop (both match the
    // reference exactly, `chat.py:108-176`): lastError is STICKY — a
    // later successful step does not clear it, so telemetry can carry
    // last_error="empty" alongside a non-empty answer and the
    // empty-results counter counts recoveries; and the FINAL
    // iteration still pays a refine whose draft nothing consumes —
    // its retries/gen_ms are part of the declared response shape.
    var step = 0
    var done = false
    while (step < steps && !done) {
      step += 1
      val (ok, reason) = SqlGuard.isSafe(sql)
      if (!ok) {
        candidates :+= CandidateSql(sql, s"blocked: $reason")
        retries += 1
        draftMd = refineTimed(question, s"unsafe: $reason")
        sql = SqlGuard.extractSqlFromMarkdown(draftMd)
      } else {
        try {
          val res = runner.run(sql)
          execMs += res.execMs
          candidates :+= CandidateSql(sql, s"ok:${res.rows.length}rows, ${res.execMs}ms")
          if (res.rows.nonEmpty && chosenSql.isEmpty) {
            chosenSql = sql
            rows = res.rows
            explain = s"Query follows the plan: $plan. " +
              "Tables and filters match the description. "
            done = true
          } else if (res.rows.isEmpty) {
            lastError = Some("empty")
            retries += 1
            draftMd = refineTimed(question,
              "empty result, add broader filters or remove overly strict predicates")
            sql = SqlGuard.extractSqlFromMarkdown(draftMd)
          }
        } catch {
          // Refine on ANY execution failure — guard rejections, but
          // also analysis errors (bad column/table, the most common
          // LLM failure mode) and timeouts. (The reference only
          // catches its guard error and would 500 on a binder error;
          // refining is the loop's documented intent.)
          case scala.util.control.NonFatal(err) =>
            val msg = err match {
              case IncorrectQuestionError(m) => m
              case e => Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
            }
            lastError = Some(msg)
            candidates :+= CandidateSql(sql, s"error:$msg")
            Metrics.inc("ai_errors_total", Map("stage" -> "execute"))
            retries += 1
            draftMd = refineTimed(question, s"execution error: $msg")
            sql = SqlGuard.extractSqlFromMarkdown(draftMd)
        }
      }
    }

    // Fallback: last ok candidate (its rows were empty by construction
    // — a non-empty success would have been chosen — so no pointless
    // re-execution), else the last candidate of any kind.
    if (chosenSql.isEmpty) {
      candidates.reverse.find(_.reason.startsWith("ok")).foreach { c =>
        chosenSql = c.sql
        rows = Seq.empty
      }
      if (chosenSql.isEmpty && candidates.nonEmpty) {
        chosenSql = candidates.last.sql
        // a blocked-only run must not masquerade as a clean answer
        if (lastError.isEmpty &&
            candidates.last.reason.startsWith("blocked"))
          lastError = Some(candidates.last.reason)
      }
    }

    Metrics.observeMs("ai_sql_generation_ms", genMs)
    Metrics.observeMs("ai_sql_exec_ms", execMs)
    if (lastError.contains("empty"))
      Metrics.inc("ai_sql_empty_results_total")

    AgentResult(
      plan = plan,
      candidates = candidates,
      chosenSql = chosenSql,
      rows = rows,
      explain =
        if (explain.nonEmpty) explain
        else "Query generated according to the plan. Last status: " +
          candidates.lastOption.map(_.reason).getOrElse("n/a") + ".",
      telemetry = Map(
        "gen_ms" -> genMs, "exec_ms" -> execMs, "retries" -> retries.toLong),
      lastError = lastError)
  }
}
