package graft.chat

import graft.SparkSpec
import graft.net.{FakeTransport, HttpReply}

/** End-to-end §3.1/§3.2 flow with a REAL provider adapter in the
  * loop: the agent asks ProviderNlToSql, which issues the reference's
  * chat-completions request through the transport; a scripted reply
  * carries SQL markdown that the guard + runner then execute against
  * the testdata views. This is the full reference wiring with only
  * the network socket replaced.
  */
class ProviderAgentSpec extends SparkSpec {

  private def reply(sql: String): HttpReply = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val content = s"```sql\n$sql\n```"
    HttpReply(200,
      s"""{"choices":[{"message":{"content":${mapper.writeValueAsString(mapper.valueToTree(content))}}}]}""")
  }

  test("agent loop runs on a provider-backed NlToSql end to end") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val t = new FakeTransport(
      reply("SELECT n_name FROM nation ORDER BY n_name LIMIT 3"))
    val provider = new ProviderNlToSql(
      Providers.LlmConfig("ollama", "test-model"), t, "## nation\n- n_name")
    val agent = new Agent(spark, provider, schemaDocs = "## nation", rowLimit = 50)
    val res = agent.run("first three nations alphabetically")
    assert(res.chosenSql === "SELECT n_name FROM nation ORDER BY n_name LIMIT 3")
    assert(res.rows.length === 3)
    assert(res.lastError.isEmpty)
    // the adapter really issued the reference-shaped request
    assert(t.calls.head.url.endsWith("/v1/chat/completions"))
  }

  test("agent refines through the provider when the first SQL is unsafe") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val t = new FakeTransport(
      reply("DROP TABLE nation"), // blocked by the guard
      reply("SELECT COUNT(*) AS n FROM nation"))
    val provider = new ProviderNlToSql(
      Providers.LlmConfig("ollama", "test-model"), t, "## nation")
    val agent = new Agent(spark, provider, schemaDocs = "## nation")
    val res = agent.run("drop everything")
    assert(res.chosenSql === "SELECT COUNT(*) AS n FROM nation")
    assert(res.rows.length === 1)
    assert(res.candidates.exists(_.reason.startsWith("blocked")))
    // the refine turn reaches the provider with the feedback appended
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val secondUser = mapper.readTree(t.calls(1).body.get)
      .get("messages").get(1).get("content").asText()
    assert(secondUser.contains("Fix issue"))
  }
}
