package graft.net

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal HTTP transport boundary for the reference's three
  * network-backed side services (LLM providers `src/provider.py`,
  * GitHub automation `src/github_client.py`, Prefect proxy
  * `src/orchestrator.py`). The adapters own every request/response
  * detail — URLs, auth headers, payload shapes, status handling —
  * while the actual wire call sits behind this trait, so the logic is
  * fully testable in a zero-egress environment (fake transports in
  * tests) and usable as-is outside it via [[JdkHttpTransport]].
  */
trait HttpTransport {
  def send(call: HttpCall): HttpReply
}

final case class HttpCall(
    method: String,
    url: String,
    headers: Map[String, String] = Map.empty,
    body: Option[String] = None,
    timeoutMs: Long = 30000)

final case class HttpReply(status: Int, body: String)

/** Real transport on the JDK 11+ HttpClient (no extra dependency). */
class JdkHttpTransport extends HttpTransport {
  private val client = HttpClient.newHttpClient()

  override def send(call: HttpCall): HttpReply = {
    val builder = HttpRequest.newBuilder(URI.create(call.url))
      .timeout(Duration.ofMillis(call.timeoutMs))
    call.headers.foreach { case (k, v) => builder.header(k, v) }
    // Locale.ROOT: "options".toUpperCase on a Turkish-locale JVM is
    // "OPTİONS" (dotted İ) — an invalid HTTP method token
    val req = call.method.toUpperCase(java.util.Locale.ROOT) match {
      case "GET" => builder.GET()
      case m => builder.method(m,
        call.body.map(HttpRequest.BodyPublishers.ofString(_))
          .getOrElse(HttpRequest.BodyPublishers.noBody()))
    }
    val resp = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    HttpReply(resp.statusCode(), resp.body())
  }
}
