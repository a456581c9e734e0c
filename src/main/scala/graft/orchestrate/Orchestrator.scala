package graft.orchestrate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.net.{HttpCall, HttpTransport}

/** Prefect-style orchestration proxy (reference
  * `src/orchestrator.py:22-61`): start a flow run through a
  * deployment — auto-discovering the first deployment of the flow
  * when none is named — and poll run status.
  *
  * Parity note: the request shapes here mirror the REFERENCE's client
  * verbatim (its filter body and name-based create_flow_run route),
  * because the reference is the behavioral spec being rebuilt. Where
  * a live Prefect server's canonical API differs from what the
  * reference sends (e.g. id-based create_flow_run, enum sort values),
  * that divergence exists in the reference too; adapting to a
  * specific server version is a transport-level concern for a real
  * deployment, not parity. The wire call is behind [[HttpTransport]].
  */
object Orchestrator {
  final case class OrchestratorError(message: String)
      extends RuntimeException(message)
}

class Orchestrator(transport: HttpTransport,
    apiBase: String = "http://localhost:4200/api") {
  import Orchestrator.OrchestratorError

  private val mapper = new ObjectMapper()

  /** Percent-encode one URL path segment (flow/deployment names are
    * user input and may carry spaces, '/', '?' — same treatment as
    * [[graft.git.GitHubClient]]'s path encoding). */
  private def enc(segment: String): String =
    java.net.URLEncoder.encode(segment, "UTF-8").replace("+", "%20")

  private def checked(r: graft.net.HttpReply, what: String): JsonNode = {
    if (r.status >= 300) throw OrchestratorError(s"$what -> ${r.status}: ${r.body}")
    mapper.readTree(r.body)
  }

  /** Reference `run_flow`: resolve the deployment (filter by flow name
    * when not given), then `create_flow_run` with parameters. */
  def runFlow(flowName: String, deploymentName: Option[String] = None,
      params: Map[String, Any] = Map.empty): JsonNode = {
    val deployment = deploymentName.getOrElse {
      val filter = mapper.createObjectNode()
      filter.put("offset", 0)
      filter.put("limit", 20)
      filter.put("sort", "DESC")
      filter.putObject("deployments").putNull("name_like")
      filter.putObject("flows").putObject("name")
        .putArray("any_").add(flowName)
      val found = checked(
        transport.send(HttpCall("POST", s"$apiBase/deployments/filter",
          Map("Content-Type" -> "application/json"),
          Some(mapper.writeValueAsString(filter)))),
        s"POST $apiBase/deployments/filter")
      if (!found.isArray || found.size() == 0)
        throw OrchestratorError(
          s"No deployments found for flow '$flowName'. Build and apply a deployment first.")
      found.get(0).path("name").asText()
    }
    val body = mapper.createObjectNode()
    val p = body.putObject("parameters")
    params.foreach {
      case (k, v: String) => p.put(k, v)
      case (k, v: Int) => p.put(k, v)
      case (k, v: Long) => p.put(k, v)
      case (k, v: Double) => p.put(k, v)
      case (k, v: Float) => p.put(k, v)
      case (k, v: Boolean) => p.put(k, v)
      case (k, null) => p.putNull(k)
      // a catch-all String.valueOf would ship Scala toString for
      // lists/maps ("List(us, eu)") as a typed-string parameter —
      // Prefect then rejects it or the flow runs on garbage; unsupported
      // types must fail HERE, naming the key, not downstream
      case (k, v) => throw new IllegalArgumentException(
        s"unsupported flow parameter type for '$k': ${v.getClass.getName}")
    }
    val url =
      s"$apiBase/deployments/name/${enc(flowName)}/${enc(deployment)}/create_flow_run"
    checked(
      transport.send(HttpCall("POST", url,
        Map("Content-Type" -> "application/json"),
        Some(mapper.writeValueAsString(body)))),
      s"POST $url")
  }

  /** Reference `get_status`: fetch a flow run by id. */
  def getStatus(flowRunId: String): JsonNode = {
    val url = s"$apiBase/flow_runs/${enc(flowRunId)}"
    checked(transport.send(HttpCall("GET", url)), s"GET $url")
  }
}

/** The reference's one demo flow (`flows/daily_sales.py:6-30` —
  * extract → transform → load), rebuilt Spark-native: extract counts
  * the orders placed in the trailing `daysBack` window of the data's
  * own clock (max order date — injected-clock style, deterministic),
  * transform doubles the row figure like the reference stub, load
  * renders the reference's message. Each task is a plain function so
  * an external orchestrator can schedule them individually.
  */
object DailySalesFlow {

  final case class Payload(rows: Long, date: String, rowsTransformed: Long = 0L)

  def extract(spark: SparkSession, dir: String, daysBack: Int = 1): Payload = {
    val orders = graft.sources.Tables.table(spark, dir, "orders")
    val row = orders
      .agg(max(col("o_orderdate")).cast("string").as("mx"))
      .collect()(0)
    // An empty orders table has no max date: a clean zero-row payload,
    // not a timestamp-parse crash on an interpolated null.
    if (row.isNullAt(0)) Payload(rows = 0L, date = "")
    else {
      val mx = row.getString(0)
      val n = orders
        .where(col("o_orderdate") >= expr(s"timestamp'$mx' - INTERVAL $daysBack DAYS"))
        .count()
      Payload(rows = n, date = mx)
    }
  }

  def transform(p: Payload): Payload = p.copy(rowsTransformed = p.rows * 2)

  def load(p: Payload): String =
    s"Loaded ${p.rowsTransformed} rows on ${p.date}"

  /** `@flow daily_sales`: the 3-task chain. */
  def run(spark: SparkSession, dir: String, daysBack: Int = 1): String =
    load(transform(extract(spark, dir, daysBack)))
}
