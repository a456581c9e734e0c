package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

/** Config surface (reference `src/config.py` sections + defaults) and
  * the config→facade assembly path.
  */
class GraftConfigSpec extends SparkSpec {

  test("defaults match the reference's .env.example values") {
    val c = GraftConfig.fromMap(Map.empty)
    assert(c.sql.rowLimit === 200)
    assert(c.sql.queryTimeoutMs === 8000L)
    assert(c.llm.provider === "openai")
    assert(c.llm.model === "gpt-4o-mini")
    assert(c.llm.ollamaBaseUrl === "http://localhost:11434")
    assert(c.server.port === 8000)
    // deliberate deviation: the reference defaults 0.0.0.0 (container
    // deployment); unauthenticated SQL routes default to loopback here
    assert(c.server.host === "127.0.0.1")
    assert(c.git.defaultBranch === "main")
    assert(c.dataQuality.defaultLimit === 10000)
    assert(c.dataQuality.maxLimit === 200000)
    assert(c.dataQuality.defaultSigma === 3.0)
    assert(c.orchestration.prefectApi === "http://localhost:4200/api")
  }

  test("dotted keys and GRAFT_ env names override defaults") {
    val c = GraftConfig.fromMap(Map(
      "sql.row_limit" -> "50",
      "llm.provider" -> "ollama",
      "data_quality.default_sigma" -> "2.5",
      "git.github_token" -> "tok",
      "git.github_repo" -> "o/r",
      "server.upload_dir" -> "/srv/uploads",
      "server.demo_data_dir" -> "/srv/demo"))
    assert(c.sql.rowLimit === 50)
    assert(c.llm.provider === "ollama")
    assert(c.server.uploadDir === Some("/srv/uploads"))
    assert(c.server.demoDataDir === "/srv/demo")
    assert(c.dataQuality.defaultSigma === 2.5)
    assert(c.git.githubToken === Some("tok"))

    val e = GraftConfig.fromEnv(Map(
      "GRAFT_SQL_ROW_LIMIT" -> "77",
      "GRAFT_DATA_QUALITY_MAX_LIMIT" -> "5000",
      "GRAFT_ORCHESTRATION_PREFECT_API" -> "http://p:4200/api",
      "UNRELATED" -> "x"))
    assert(e.sql.rowLimit === 77)
    assert(e.dataQuality.maxLimit === 5000)
    assert(e.orchestration.prefectApi === "http://p:4200/api")
  }

  test("an unknown llm.provider fails buildFacade loudly, never the silent stub") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromMap(Map("llm.provider" -> "Ollama")) // mis-cased
        .buildFacade(spark)
    }
    assert(e.getMessage.contains("Ollama"))
    // the explicit stub opt-in still constructs
    assert(GraftConfig.fromMap(Map("llm.provider" -> "stub"))
      .buildFacade(spark) != null)
  }

  test("buildFacade assembles a serving app from config (stub provider path)") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val dbtDir = Files.createTempDirectory("graft-cfg-dbt")
    // no LLM keys → stub provider; no github creds → /dbt/pr unconfigured
    val facade = GraftConfig.fromMap(Map(
      "sql.row_limit" -> "5",
      "git.dbt_dir" -> dbtDir.toString)).buildFacade(spark)
    facade.start()
    try {
      val client = HttpClient.newHttpClient()
      val mapper = new ObjectMapper()
      val chat = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${facade.port}/chat"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"question": "how many orders"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(chat.statusCode() === 200)
      assert(mapper.readTree(chat.body()).get("rows").size() === 1)
      // orchestrator is always wired (prefect url from config) but the
      // transport will fail fast against the unreachable default — the
      // endpoint must exist (not 400-unconfigured, not 404)
      val orch = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${facade.port}/orchestrate/status/x"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(orch.statusCode() === 500) // connection refused → 500 detail
    } finally facade.stop()
  }

  test("buildFacade threads sql.query_timeout_ms into every served runner") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    spark.range(300L * 1000 * 1000).createOrReplaceTempView("slow_cfg_src")
    val facade = GraftConfig.fromMap(Map(
      "sql.query_timeout_ms" -> "1500")).buildFacade(spark)
    facade.start()
    try {
      val client = HttpClient.newHttpClient()
      val mapper = new ObjectMapper()
      // /dbt/preview executes arbitrary validated SELECTs — without the
      // timeout threaded through, this cartesian square would run for
      // minutes; with it, the watchdog cancels at the configured ms.
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${facade.port}/dbt/preview"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"model_sql": "SELECT COUNT(*) AS n FROM slow_cfg_src a, slow_cfg_src b"}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 500)
      assert(mapper.readTree(r.body()).get("detail").asText()
        .contains("exceeded 1500ms"))
    } finally facade.stop()
  }

  test("startup check retries with bounded backoff and then succeeds") {
    // assert the retry SCHEDULE, not wall-clock: under parallel-suite
    // contention even one trivial Spark job can take minutes, which
    // made the old `< 30 s` form flake (observed 615 s)
    var sleeps = Vector.empty[Long]
    var calls = 0
    Lifespan.startupCheck(spark, attempts = 3,
      minWaitMs = 4, maxWaitMs = 6,
      sleep = ms => sleeps :+= ms,
      probe = _ => { calls += 1; if (calls < 3) sys.error("not up yet") else 1 })
    assert(calls === 3)
    assert(sleeps === Vector(4L, 6L)) // 4, then 8 clamped to max 6
    // exhausted attempts rethrow the last failure
    val e = intercept[RuntimeException](
      Lifespan.startupCheck(spark, attempts = 2, minWaitMs = 1, maxWaitMs = 1,
        sleep = _ => (), probe = _ => sys.error("db down")))
    assert(e.getMessage === "db down")
    // the real probe path still runs end-to-end (no time assertion);
    // real retries absorb transient executor flakes under parallel
    // suites (observed once: a RemoteClassLoaderError task failure) —
    // which is precisely the failure mode a startup check retries over
    Lifespan.startupCheck(spark, attempts = 5, minWaitMs = 100, maxWaitMs = 2000)
  }
}
