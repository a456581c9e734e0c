package graft.chat

import com.fasterxml.jackson.databind.ObjectMapper

import graft.net.{HttpCall, HttpTransport}

/** LLM provider adapters (reference `src/provider.py:17-110`): the
  * OpenAI-compatible chat-completions call for OpenAI, OpenRouter and
  * Ollama, with the reference's generation parameters, per-provider
  * timeouts, auth headers, error surfacing and the Ollama legacy
  * response fallback. The wire call is behind [[HttpTransport]] —
  * everything else (request construction, dispatch, parsing) is the
  * reference's behavior, testable without network.
  */
object Providers {

  final case class LlmError(message: String) extends RuntimeException(message)

  /** Generation defaults biased for deterministic SQL (reference
    * `GEN_PARAMS`, `src/provider.py:6-10`). */
  val Temperature = 0.05
  val TopP = 0.9
  val MaxTokens = 800

  /** Provider selection + credentials (reference `settings.llm`). */
  final case class LlmConfig(
      provider: String,
      model: String,
      openaiApiKey: Option[String] = None,
      openrouterApiKey: Option[String] = None,
      ollamaBaseUrl: String = "http://localhost:11434",
      /* OpenRouter attribution headers, caller-supplied */
      referer: String = "",
      title: String = "")

  private val mapper = new ObjectMapper()

  private def payload(config: LlmConfig, system: String, user: String,
      stream: Option[Boolean] = None): String = {
    val o = mapper.createObjectNode()
    o.put("model", config.model)
    val msgs = o.putArray("messages")
    val m1 = msgs.addObject(); m1.put("role", "system"); m1.put("content", system)
    val m2 = msgs.addObject(); m2.put("role", "user"); m2.put("content", user)
    o.put("temperature", Temperature)
    o.put("top_p", TopP)
    o.put("max_tokens", MaxTokens)
    stream.foreach(o.put("stream", _))
    mapper.writeValueAsString(o)
  }

  private def content(body: String, provider: String): String = {
    val n = mapper.readTree(body)
    val c = n.path("choices").path(0).path("message").path("content")
    if (!c.isMissingNode && !c.isNull) c.asText()
    else {
      // Ollama legacy /api/chat shape: {"message": {"content": ...}}
      val legacy = n.path("message").path("content")
      if (!legacy.isMissingNode && !legacy.isNull) legacy.asText()
      else throw LlmError(s"$provider unexpected response: $body")
    }
  }

  def openaiComplete(config: LlmConfig, transport: HttpTransport,
      system: String, user: String): String = {
    val key = config.openaiApiKey.filter(_.nonEmpty)
      .getOrElse(throw LlmError("OPENAI_API_KEY is not set"))
    val r = transport.send(HttpCall("POST",
      "https://api.openai.com/v1/chat/completions",
      Map("Authorization" -> s"Bearer $key",
        "Content-Type" -> "application/json"),
      Some(payload(config, system, user)),
      timeoutMs = 30000))
    if (r.status >= 300) throw LlmError(s"OpenAI error ${r.status}: ${r.body}")
    content(r.body, "OpenAI")
  }

  def openrouterComplete(config: LlmConfig, transport: HttpTransport,
      system: String, user: String): String = {
    val key = config.openrouterApiKey.filter(_.nonEmpty)
      .getOrElse(throw LlmError("OPENROUTER_API_KEY is not set"))
    // attribution headers only when configured: empty-valued
    // HTTP-Referer/X-Title are nonstandard and some middleboxes
    // mishandle them
    val attribution = Seq(
      "HTTP-Referer" -> config.referer,
      "X-Title" -> config.title).filter(_._2.nonEmpty)
    val r = transport.send(HttpCall("POST",
      "https://openrouter.ai/api/v1/chat/completions",
      Map("Authorization" -> s"Bearer $key",
        "Content-Type" -> "application/json") ++ attribution,
      Some(payload(config, system, user)),
      timeoutMs = 45000))
    if (r.status >= 300) throw LlmError(s"OpenRouter error ${r.status}: ${r.body}")
    content(r.body, "OpenRouter")
  }

  def ollamaComplete(config: LlmConfig, transport: HttpTransport,
      system: String, user: String): String = {
    val r = transport.send(HttpCall("POST",
      s"${config.ollamaBaseUrl}/v1/chat/completions",
      Map("Content-Type" -> "application/json"),
      Some(payload(config, system, user, stream = Some(false))),
      timeoutMs = 60000))
    if (r.status >= 300) throw LlmError(s"Ollama error ${r.status}: ${r.body}")
    content(r.body, "Ollama")
  }

  /** Dispatch by configured provider (reference `complete`,
    * `src/provider.py:103-110`). */
  def complete(config: LlmConfig, transport: HttpTransport,
      system: String, user: String): String = config.provider match {
    case "openai" => openaiComplete(config, transport, system, user)
    case "openrouter" => openrouterComplete(config, transport, system, user)
    case "ollama" => ollamaComplete(config, transport, system, user)
    case other => throw LlmError(s"Unsupported LLM_PROVIDER: $other")
  }
}

/** [[NlToSql]] backed by a real provider: formats the reference's
  * system prompt with the schema docs and row limit
  * (`src/chain.py:7-39`) and sends the `Q: …\nSQL:` user turn. */
class ProviderNlToSql(
    config: Providers.LlmConfig,
    transport: HttpTransport,
    // by-name, re-read per LLM call: a frozen startup-time string
    // would keep sending the provider a Schema section that predates
    // every uploaded/refreshed table, while the planner and
    // /dbt/generate already see the fresh docs — the reference loads
    // docs inside make_plan (`chain.py:97`), not at worker start
    schemaDocs: => String) extends NlToSql {

  /** Reference `SYSTEM_PROMPT` (`src/chain.py:7-26`), schema and row
    * limit interpolated per call. The schema docs are appended AFTER
    * stripMargin: markdown table rows start with `|`, which stripMargin
    * would treat as its margin character and eat — corrupting every
    * schema line if the docs were interpolated into the margined
    * template. */
  def systemPrompt(rowLimit: Int): String =
    s"""You convert user questions to a single SAFE SQL SELECT. For Russian and English languages.
       |Rules:
       |- Output ONLY a SQL code block (```sql ... ```), no prose.
       |- SELECT only. FORBIDDEN: INSERT/UPDATE/DELETE/DDL/ATTACH/COPY.
       |- Always include explicit column list and LIMIT $rowLimit if not aggregating large sets.
       |- Use ISO timestamps; for year filters use BETWEEN y-01-01 AND (y+1)-01-01.
       |Schema:
       |""".stripMargin + schemaDocs + "\n"

  override def complete(question: String, rowLimit: Int): String =
    Providers.complete(config, transport,
      systemPrompt(rowLimit), s"Q: $question\nSQL:\n")
}
