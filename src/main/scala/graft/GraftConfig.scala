package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Configuration surface mirroring the reference's `Settings` tree
  * (reference `src/config.py`, defaults `.env.example.yaml`) for the
  * sections this engine consumes: sql, llm, server, git, data_quality,
  * orchestration. Values load from a flat key map (dotted keys, same
  * names as the reference's YAML sections) with the reference's
  * defaults; [[GraftConfig.fromEnv]] reads `GRAFT_<SECTION>_<KEY>`
  * environment variables.
  */
final case class SqlConfig(rowLimit: Int = 200, queryTimeoutMs: Long = 8000)

final case class LlmConfig(
    provider: String = "openai",
    model: String = "gpt-4o-mini",
    openaiApiKey: Option[String] = None,
    openrouterApiKey: Option[String] = None,
    ollamaBaseUrl: String = "http://localhost:11434")

/** `upload_dir` and `demo_data_dir` are engine-side extensions (the
  * reference hardcodes `demo_data` and takes uploads as request
  * bytes): an unset upload_dir disables path-based table upload.
  *
  * `host` deliberately deviates from the reference's `0.0.0.0`
  * default (`src/config.py:139`, a containerized-deployment value):
  * these routes execute SQL and drop databases with no
  * authentication, so the out-of-the-box bind is loopback and
  * exposing the facade wider is an explicit config decision
  * (`server.host` / `GRAFT_SERVER_HOST=0.0.0.0`). */
final case class ServerConfig(
    host: String = "127.0.0.1",
    port: Int = 8000,
    uploadDir: Option[String] = None,
    demoDataDir: String = "demo_data")

final case class GitConfig(
    dbtDir: String = "dbt",
    githubToken: Option[String] = None,
    githubRepo: Option[String] = None,
    defaultBranch: String = "main",
    authorName: String = "Data Platform Copilot",
    authorEmail: String = "bot@example.com")

final case class DataQualityConfig(
    defaultLimit: Int = 10000,
    maxLimit: Int = 200000,
    defaultSigma: Double = 3.0)

final case class OrchestrationConfig(
    prefectApi: String = "http://localhost:4200/api")

final case class GraftConfig(
    sql: SqlConfig = SqlConfig(),
    llm: LlmConfig = LlmConfig(),
    server: ServerConfig = ServerConfig(),
    git: GitConfig = GitConfig(),
    dataQuality: DataQualityConfig = DataQualityConfig(),
    orchestration: OrchestrationConfig = OrchestrationConfig()) {

  /** Assemble a fully-wired [[graft.http.HttpFacade]] from this
    * config, the way the reference's `main.py` assembles its app from
    * `settings`: a real LLM provider when its credentials are present
    * (deterministic stub otherwise), the GitHub client when
    * token+repo are set, the orchestration proxy always, the dbt
    * project dir from git.dbt_dir. */
  def buildFacade(spark: SparkSession,
      transport: graft.net.HttpTransport = new graft.net.JdkHttpTransport,
      catalog: Option[graft.catalog.Catalog] = None): graft.http.HttpFacade = {
    val providerConfigured = llm.provider match {
      case "openai" => llm.openaiApiKey.exists(_.nonEmpty)
      case "openrouter" => llm.openrouterApiKey.exists(_.nonEmpty)
      case "ollama" => true
      case "stub" => false // explicit opt-in to the deterministic stub
      // a typo'd provider name must fail HERE, loudly — silently
      // routing to the stub serves canned demo SQL with HTTP 200 and
      // the misconfiguration is undetectable from the outside
      case other => throw new IllegalArgumentException(
        s"unknown llm.provider '$other' (openai | openrouter | ollama | stub)")
    }
    val llmCfg = graft.chat.Providers.LlmConfig(llm.provider, llm.model,
      llm.openaiApiKey, llm.openrouterApiKey, llm.ollamaBaseUrl)
    // ONE refresh-gated docs cache shared by the provider's system
    // prompt and the facade's planner/dbt surfaces: a frozen copy (or
    // a per-call rebuild) would let the two disagree about which
    // tables exist, and POST /schema/refresh must reach both
    val docsCache = new graft.catalog.SchemaDocsCache(spark)
    val nlToSql: graft.chat.NlToSql =
      if (providerConfigured)
        new graft.chat.ProviderNlToSql(llmCfg, transport, docsCache.get)
      else new graft.chat.StubNlToSql
    // the reference backs /dbt/generate with the same provider stack
    // (`dbt_generator.py:97` → `provider.complete`); stub only when no
    // provider is configured
    val dbtGen: graft.dbt.DbtModelGen =
      if (providerConfigured)
        new graft.dbt.ProviderDbtModelGen(llmCfg, transport)
      else new graft.dbt.StubDbtModelGen
    val github = for {
      token <- git.githubToken.filter(_.nonEmpty)
      repo <- git.githubRepo.filter(_.nonEmpty)
    } yield new graft.git.GitHubClient(transport, token, repo,
      git.defaultBranch, git.authorName, git.authorEmail)
    new graft.http.HttpFacade(spark,
      provider = nlToSql,
      dbtGen = dbtGen,
      catalog = catalog,
      github = github,
      orchestrator =
        Some(new graft.orchestrate.Orchestrator(transport, orchestration.prefectApi)),
      dbtRoot = () => {
        val p = Paths.get(git.dbtDir)
        Files.createDirectories(p)
        p
      },
      demoDataDir = server.demoDataDir,
      uploadRoot = server.uploadDir.map(Paths.get(_)),
      rowLimit = sql.rowLimit,
      queryTimeoutMs = sql.queryTimeoutMs,
      bindHost = server.host,
      dq = dataQuality,
      docsCache = docsCache)
  }
}

object GraftConfig {

  /** Build from dotted keys (reference YAML section.key names);
    * unknown keys are ignored, missing keys take the defaults. */
  def fromMap(kv: Map[String, String]): GraftConfig = {
    def s(k: String, d: String) = kv.getOrElse(k, d)
    def opt(k: String) = kv.get(k).filter(_.nonEmpty)
    def i(k: String, d: Int) = kv.get(k).map(_.trim.toInt).getOrElse(d)
    def l(k: String, d: Long) = kv.get(k).map(_.trim.toLong).getOrElse(d)
    def f(k: String, d: Double) = kv.get(k).map(_.trim.toDouble).getOrElse(d)
    GraftConfig(
      sql = SqlConfig(
        rowLimit = i("sql.row_limit", 200),
        queryTimeoutMs = l("sql.query_timeout_ms", 8000)),
      llm = LlmConfig(
        provider = s("llm.provider", "openai"),
        model = s("llm.model", "gpt-4o-mini"),
        openaiApiKey = opt("llm.openai_api_key"),
        openrouterApiKey = opt("llm.openrouter_api_key"),
        ollamaBaseUrl = s("llm.ollama_base_url", "http://localhost:11434")),
      server = ServerConfig(
        host = s("server.host", "127.0.0.1"),
        port = i("server.port", 8000),
        uploadDir = opt("server.upload_dir"),
        demoDataDir = s("server.demo_data_dir", "demo_data")),
      git = GitConfig(
        dbtDir = s("git.dbt_dir", "dbt"),
        githubToken = opt("git.github_token"),
        githubRepo = opt("git.github_repo"),
        defaultBranch = s("git.default_branch", "main"),
        authorName = s("git.author_name", "Data Platform Copilot"),
        authorEmail = s("git.author_email", "bot@example.com")),
      dataQuality = DataQualityConfig(
        defaultLimit = i("data_quality.default_limit", 10000),
        maxLimit = i("data_quality.max_limit", 200000),
        defaultSigma = f("data_quality.default_sigma", 3.0)),
      orchestration = OrchestrationConfig(
        prefectApi = s("orchestration.prefect_api", "http://localhost:4200/api")))
  }

  /** Read `GRAFT_SQL_ROW_LIMIT`-style variables from the environment
    * (section and key upper-cased, joined with underscores). */
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig =
    fromMap(env.collect {
      case (k, v) if k.startsWith("GRAFT_") =>
        // GRAFT_DATA_QUALITY_DEFAULT_LIMIT → data_quality.default_limit:
        // match the section against the known section names first
        // (sections themselves may contain underscores)
        val rest = k.stripPrefix("GRAFT_").toLowerCase
        val section = Seq("data_quality", "orchestration", "server",
          "sql", "llm", "git").find(sec => rest.startsWith(sec + "_"))
        section match {
          case Some(sec) => s"$sec.${rest.stripPrefix(sec + "_")}" -> v
          case None => rest -> v
        }
    })
}

/** Startup lifecycle (reference `src/lifespan.py:10-21` +
  * `db_connector.py:30-51`): test the engine connection with bounded
  * exponential-backoff retries before serving. */
object Lifespan {

  /** Run `SELECT 1 as test` through the session, retrying up to
    * `attempts` times with exponential backoff clamped to
    * [minWaitMs, maxWaitMs] (reference: 3 attempts, 4–10 s). Throws
    * the last failure if all attempts exhaust. `sleep` and `probe`
    * are injectable so tests can assert the retry/backoff SCHEDULE
    * instead of wall-clock time (which a contended host makes
    * unbounded even for the success path). */
  def startupCheck(spark: SparkSession, attempts: Int = 3,
      minWaitMs: Long = 4000, maxWaitMs: Long = 10000,
      sleep: Long => Unit = Thread.sleep,
      probe: SparkSession => Int =
        _.sql("SELECT 1 as test").collect()(0).getInt(0)): Unit = {
    var attempt = 0
    var ok = false
    while (!ok) {
      attempt += 1
      try {
        if (probe(spark) != 1) throw new RuntimeException("Connection test failed")
        ok = true
      } catch {
        case e: Exception if attempt < attempts =>
          sleep(math.min(maxWaitMs, minWaitMs * (1L << (attempt - 1))))
        case e: Exception => throw e
      }
    }
  }
}
