package graft.net

import java.net.InetSocketAddress
import java.net.http.HttpTimeoutException
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.chat.Providers
import graft.chat.Providers.{LlmConfig, LlmError}
import graft.git.GitHubClient
import graft.git.GitHubClient.GitHubError
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator.OrchestratorError

/** End-to-end exercise of [[JdkHttpTransport]] — the REAL wire path —
  * against an in-process loopback HTTP server, driving the same
  * provider / GitHub / orchestrator adapters the scripted-transport
  * suite covers. No external network: the server binds 127.0.0.1 on
  * an ephemeral port. Covers the three things a fake transport
  * cannot: real request serialization on the socket, real status/body
  * decoding, and the JDK client's timeout behavior. */
class LoopbackTransportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** (method, path, Content-Type, body) of every request received. */
  private val seen = new ConcurrentLinkedQueue[(String, String, String, String)]()

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(status, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      seen.add((x.getRequestMethod, path,
        Option(x.getRequestHeaders.getFirst("Content-Type")).getOrElse(""), body))
      path match {
        case "/v1/chat/completions" =>
          respond(x, 200,
            """{"choices":[{"message":{"role":"assistant","content":"SELECT 1"}}]}""")
        case "/err/v1/chat/completions" =>
          respond(x, 503, """{"error":"overloaded"}""")
        case "/slow" =>
          Thread.sleep(2000)
          respond(x, 200, "{}")
        case "/repos/o/r/git/ref/heads/main" =>
          respond(x, 200, """{"object":{"sha":"abc123"}}""")
        case "/repos/o/r/git/ref/heads/gone" =>
          respond(x, 404, """{"message":"Not Found"}""")
        case "/api/deployments/filter" =>
          respond(x, 200, """[{"name":"daily-sales-deploy"}]""")
        case p if p.startsWith("/api/deployments/name/") && p.endsWith("/create_flow_run") =>
          respond(x, 201, """{"id":"run-1","state":{"type":"SCHEDULED"}}""")
        case "/api/flow_runs/run-1" =>
          respond(x, 200, """{"id":"run-1","state":{"type":"COMPLETED"}}""")
        case p if p.startsWith("/api/") =>
          respond(x, 500, """{"detail":"boom"}""")
        case _ =>
          respond(x, 404, """{"message":"no route"}""")
      }
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private val transport = new JdkHttpTransport

  test("provider adapter over a real socket: request serialized, reply parsed") {
    val cfg = LlmConfig("ollama", "m-test", ollamaBaseUrl = base)
    val out = Providers.ollamaComplete(cfg, transport, "sys", "usr")
    assert(out === "SELECT 1")
    val (method, path, ctype, body) = seen.asScala
      .find(_._2 == "/v1/chat/completions").get
    assert(method === "POST" && ctype === "application/json")
    val p = mapper.readTree(body)
    assert(p.get("model").asText() === "m-test")
    assert(p.get("stream").asBoolean() === false)
  }

  test("provider adapter surfaces a real non-2xx as LlmError") {
    val cfg = LlmConfig("ollama", "m-test", ollamaBaseUrl = s"$base/err")
    val e = intercept[LlmError] {
      Providers.ollamaComplete(cfg, transport, "sys", "usr")
    }
    assert(e.getMessage.contains("503") && e.getMessage.contains("overloaded"))
  }

  test("github adapter over a real socket: sha parse, auth header, 404 surfacing") {
    val gh = new GitHubClient(transport, "tok-x", "o/r", apiBase = base)
    assert(gh.getBranchSha("main") === "abc123")
    val (_, _, _, _) = seen.asScala.find(_._2.endsWith("/git/ref/heads/main")).get
    assert(intercept[GitHubError] { gh.getBranchSha("gone") }
      .getMessage.contains("Branch not found"))
  }

  test("orchestrator adapter over a real socket: filter → create_flow_run → status") {
    val orch = new Orchestrator(transport, apiBase = s"$base/api")
    val run = orch.runFlow("daily-sales", params = Map("daysBack" -> 1))
    assert(run.path("id").asText() === "run-1")
    assert(orch.getStatus("run-1").path("state").path("type").asText() === "COMPLETED")
    val create = seen.asScala.find(_._2.endsWith("/create_flow_run")).get
    assert(mapper.readTree(create._4).path("parameters").path("daysBack").asInt() === 1)
    assert(intercept[OrchestratorError] { orch.getStatus("nope") }
      .getMessage.contains("500"))
  }

  test("JDK transport enforces the per-call timeout on a stalled server") {
    intercept[HttpTimeoutException] {
      transport.send(HttpCall("GET", s"$base/slow", timeoutMs = 200))
    }
  }
}
