package graft.net

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.chat.{Providers, ProviderNlToSql}
import graft.chat.Providers.{LlmConfig, LlmError}
import graft.git.GitHubClient
import graft.git.GitHubClient.GitHubError
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator.OrchestratorError

/** Scripted transport: queue of canned replies, records every call so
  * tests assert the exact request shapes the adapters emit. */
class FakeTransport(replies: HttpReply*) extends HttpTransport {
  val calls: mutable.Buffer[HttpCall] = mutable.Buffer.empty
  private val queue = mutable.Queue(replies: _*)
  override def send(call: HttpCall): HttpReply = {
    calls += call
    if (queue.isEmpty) HttpReply(500, "fake transport exhausted")
    else queue.dequeue()
  }
}

/** LLM provider / GitHub / orchestrator adapters: the reference's
  * request construction, dispatch, error surfacing and response
  * parsing (`src/provider.py`, `src/github_client.py`,
  * `src/orchestrator.py`) verified against scripted transports —
  * no network, full logic coverage.
  */
class AdaptersSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def chatReply(content: String): HttpReply =
    HttpReply(200,
      s"""{"choices":[{"message":{"role":"assistant","content":${mapper.writeValueAsString(mapper.valueToTree(content))}}}]}""")

  private val cfg = LlmConfig("openai", "gpt-test", openaiApiKey = Some("sk-x"),
    openrouterApiKey = Some("or-x"))

  test("openai adapter: auth header, gen params, content parse") {
    val t = new FakeTransport(chatReply("```sql\nSELECT 1\n```"))
    val out = Providers.openaiComplete(cfg, t, "sys", "usr")
    assert(out === "```sql\nSELECT 1\n```")
    val call = t.calls.head
    assert(call.url === "https://api.openai.com/v1/chat/completions")
    assert(call.headers("Authorization") === "Bearer sk-x")
    assert(call.timeoutMs === 30000)
    val p = mapper.readTree(call.body.get)
    assert(p.get("model").asText() === "gpt-test")
    assert(p.get("temperature").asDouble() === 0.05)
    assert(p.get("top_p").asDouble() === 0.9)
    assert(p.get("max_tokens").asInt() === 800)
    assert(p.get("messages").get(0).get("role").asText() === "system")
    assert(p.get("messages").get(1).get("content").asText() === "usr")
  }

  test("openrouter adapter: attribution headers + 45s timeout") {
    val t = new FakeTransport(chatReply("ok"))
    Providers.openrouterComplete(
      cfg.copy(referer = "https://example.test", title = "t"), t, "s", "u")
    val call = t.calls.head
    assert(call.url === "https://openrouter.ai/api/v1/chat/completions")
    assert(call.headers("HTTP-Referer") === "https://example.test")
    assert(call.headers("X-Title") === "t")
    assert(call.timeoutMs === 45000)
  }

  test("ollama adapter: base-url endpoint, stream=false, legacy fallback parse") {
    val t = new FakeTransport(
      HttpReply(200, """{"message":{"content":"legacy shape"}}"""))
    val out = Providers.ollamaComplete(
      cfg.copy(ollamaBaseUrl = "http://box:11434"), t, "s", "u")
    assert(out === "legacy shape")
    val call = t.calls.head
    assert(call.url === "http://box:11434/v1/chat/completions")
    assert(mapper.readTree(call.body.get).get("stream").asBoolean() === false)
    assert(call.timeoutMs === 60000)
  }

  test("provider errors: missing key, http >=300, unknown provider, bad body") {
    intercept[LlmError](Providers.openaiComplete(
      cfg.copy(openaiApiKey = None), new FakeTransport(), "s", "u"))
    val denied = intercept[LlmError](Providers.openaiComplete(
      cfg, new FakeTransport(HttpReply(429, "rate limited")), "s", "u"))
    assert(denied.getMessage.contains("429"))
    intercept[LlmError](Providers.complete(
      cfg.copy(provider = "clippy"), new FakeTransport(), "s", "u"))
    intercept[LlmError](Providers.ollamaComplete(
      cfg, new FakeTransport(HttpReply(200, """{"weird": true}""")), "s", "u"))
  }

  test("ProviderNlToSql formats the reference system prompt and user turn") {
    val t = new FakeTransport(chatReply("```sql\nSELECT 1\n```"))
    val nl = new ProviderNlToSql(cfg, t, "## orders\n- o_custkey")
    nl.complete("top 5 revenue", rowLimit = 200)
    val p = mapper.readTree(t.calls.head.body.get)
    val sys = p.get("messages").get(0).get("content").asText()
    assert(sys.contains("LIMIT 200"))
    assert(sys.contains("## orders"))
    assert(sys.contains("FORBIDDEN: INSERT/UPDATE/DELETE/DDL/ATTACH/COPY"))
    assert(p.get("messages").get(1).get("content").asText()
      === "Q: top 5 revenue\nSQL:\n")
  }

  // ------------------------------------------------------------- GitHub

  private def gh(t: HttpTransport) =
    new GitHubClient(t, token = "tok", repo = "owner/repo")

  test("github: create branch from default, 422 falls back to existing sha") {
    val t = new FakeTransport(
      HttpReply(200, """{"object":{"sha":"base-sha"}}"""), // get base ref
      HttpReply(201, """{"object":{"sha":"new-sha"}}""")) // create ref
    assert(gh(t).createBranch("feat") === "new-sha")
    assert(t.calls(0).url ===
      "https://api.github.com/repos/owner/repo/git/ref/heads/main")
    assert(t.calls(1).method === "POST")
    val refBody = mapper.readTree(t.calls(1).body.get)
    assert(refBody.get("ref").asText() === "refs/heads/feat")
    assert(refBody.get("sha").asText() === "base-sha")

    val t2 = new FakeTransport(
      HttpReply(200, """{"object":{"sha":"base-sha"}}"""),
      HttpReply(422, """{"message":"Reference already exists"}"""),
      HttpReply(200, """{"object":{"sha":"existing-sha"}}"""))
    assert(gh(t2).createBranch("feat") === "existing-sha")

    // a 422 for any OTHER validation failure (invalid ref name) must
    // surface the real cause, not chase a nonexistent branch and
    // report a nonsensical "Branch not found"
    val t3 = new FakeTransport(
      HttpReply(200, """{"object":{"sha":"base-sha"}}"""),
      HttpReply(422, """{"message":"'feat..x' is not a valid ref name"}"""))
    val e = intercept[GitHubClient.GitHubError](gh(t3).createBranch("feat..x"))
    assert(e.getMessage.contains("Create branch failed"))
    assert(e.getMessage.contains("not a valid ref name"))
  }

  test("github: upsert encodes base64, carries prior sha only when file exists") {
    val t = new FakeTransport(
      HttpReply(404, "{}"), // no prior file
      HttpReply(201, """{"content":{"sha":"c1"}}"""))
    val r = gh(t).upsertFile("models/x.sql", "SELECT 1", "feat", "msg")
    assert(r.path("content").path("sha").asText() === "c1")
    val put = mapper.readTree(t.calls(1).body.get)
    assert(!put.has("sha"))
    assert(new String(java.util.Base64.getDecoder.decode(
      put.get("content").asText()), "UTF-8") === "SELECT 1")
    assert(put.get("committer").get("name").asText() === "graft")

    val t2 = new FakeTransport(
      HttpReply(200, """{"sha":"old-sha"}"""),
      HttpReply(200, """{"content":{"sha":"c2"}}"""))
    gh(t2).upsertFile("models/x.sql", "SELECT 2", "feat", "msg")
    assert(mapper.readTree(t2.calls(1).body.get).get("sha").asText() === "old-sha")
  }

  test("github: PR creation and error mapping") {
    val t = new FakeTransport(
      HttpReply(201, """{"html_url":"https://github.test/pr/1"}"""))
    val pr = gh(t).createPullRequest("title", head = "feat")
    assert(pr.get("html_url").asText() === "https://github.test/pr/1")
    val body = mapper.readTree(t.calls.head.body.get)
    assert(body.get("base").asText() === "main")

    intercept[GitHubError](gh(new FakeTransport(HttpReply(404, "{}")))
      .getBranchSha("missing"))
    intercept[GitHubError](
      new GitHubClient(new FakeTransport(), token = "", repo = "o/r")
        .getBranchSha("main"))
  }

  // ------------------------------------------------------- orchestrator

  test("orchestrator: named deployment run + status") {
    val t = new FakeTransport(
      HttpReply(201, """{"id":"run-1","state":{"type":"SCHEDULED"}}"""),
      HttpReply(200, """{"id":"run-1","state":{"type":"COMPLETED"}}"""))
    val o = new Orchestrator(t, apiBase = "http://prefect:4200/api")
    val run = o.runFlow("daily_sales", Some("daily_sales_depl"),
      Map("days_back" -> 2))
    assert(run.get("id").asText() === "run-1")
    assert(t.calls(0).url ===
      "http://prefect:4200/api/deployments/name/daily_sales/daily_sales_depl/create_flow_run")
    assert(mapper.readTree(t.calls(0).body.get)
      .get("parameters").get("days_back").asInt() === 2)
    assert(o.getStatus("run-1").get("state").get("type").asText() === "COMPLETED")
  }

  test("orchestrator: deployment auto-discovery and no-deployment error") {
    val t = new FakeTransport(
      HttpReply(200, """[{"name":"found_depl"}]"""),
      HttpReply(201, """{"id":"run-2"}"""))
    val o = new Orchestrator(t)
    o.runFlow("daily_sales")
    val filter = mapper.readTree(t.calls(0).body.get)
    assert(filter.get("flows").get("name").get("any_").get(0).asText()
      === "daily_sales")
    assert(t.calls(1).url.endsWith(
      "/deployments/name/daily_sales/found_depl/create_flow_run"))

    val empty = new Orchestrator(new FakeTransport(HttpReply(200, "[]")))
    val err = intercept[OrchestratorError](empty.runFlow("ghost"))
    assert(err.getMessage.contains("No deployments found"))
  }

  test("ProviderDbtModelGen sends the dbt prompt and feeds generate()") {
    val two =
      "```sql\nSELECT o_orderkey AS order_id FROM orders\n```\n" +
        "```yaml\nversion: 2\nmodels:\n  - name: mart_orders\n    columns:\n" +
        "      - name: order_id\n        tests: [not_null]\n```"
    val t = new FakeTransport(chatReply(two))
    val gen = new graft.dbt.ProviderDbtModelGen(cfg, t)
    val model = graft.dbt.DbtGenerator.generate(gen, "orders mart",
      Some("mart_orders"), schemaDocs = "## orders\n| col | type |")
    assert(model.modelName === "mart_orders")
    assert(model.modelSql.contains("o_orderkey"))
    assert(model.schemaYml.contains("name: mart_orders"))
    val p = mapper.readTree(t.calls.head.body.get)
    val sys = p.get("messages").get(0).get("content").asText()
    // schema docs survive verbatim (stripMargin must not eat '|' rows)
    assert(sys.contains("| col | type |"))
    assert(sys.contains("Suggested model_name: \"mart_orders\""))
    assert(sys.contains("senior Analytics Engineer"))
    assert(p.get("messages").get(1).get("content").asText()
      .contains("exactly as specified"))
  }

  test("orchestrator: flow/deployment/run-id path segments are percent-encoded") {
    val t = new FakeTransport(
      HttpReply(201, """{"id":"run-3"}"""),
      HttpReply(200, """{"id":"run x/y","state":{"type":"COMPLETED"}}"""))
    val o = new Orchestrator(t, apiBase = "http://prefect:4200/api")
    o.runFlow("daily sales/v2", Some("depl?one"))
    assert(t.calls(0).url ===
      "http://prefect:4200/api/deployments/name/daily%20sales%2Fv2/depl%3Fone/create_flow_run")
    o.getStatus("run x/y")
    assert(t.calls(1).url === "http://prefect:4200/api/flow_runs/run%20x%2Fy")
  }
}
