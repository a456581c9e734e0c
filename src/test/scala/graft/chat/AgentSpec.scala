package graft.chat

import graft.SparkSpec

class PlannerSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val docs =
    """# Data Warehouse Schema (auto-generated)
      |## orders
      || order_id | BIGINT |  |  |  |
      || total_amount | DOUBLE |  |  | order revenue amount |
      |## customers
      || country | VARCHAR |  |  | customer country |
      |""".stripMargin

  test("normalize trims, collapses, maps RU year shorthand") {
    assert(Planner.normalizeQuestion("  top   5\n countries ") === "top 5 countries")
    assert(Planner.normalizeQuestion("продажи за 2024 года") === "продажи за 2024 year")
  }

  test("tokenizer matches the reference token class") {
    assert(Planner.extractTokens("Top-5 Revenue_2024, страна!")
      === Seq("top", "5", "revenue_2024", "страна"))
  }

  test("similarFields ranks lines by overlap with deterministic ties") {
    val hits = Planner.similarFields("revenue by country", docs)
    assert(hits.nonEmpty)
    assert(hits.head.contains("country") || hits.head.contains("revenue"))
  }

  test("plan adds period hint only for time-flavored questions") {
    val withTime = Planner.makePlan("revenue in year 2024", docs)
    assert(withTime.contains("period filter"))
    val noTime = Planner.makePlan("count customers", docs)
    assert(!noTime.contains("period filter"))
    assert(noTime.startsWith("Goal: answer 'count customers'"))
    assert(noTime.endsWith("Output: explicit list of columns, reasonable LIMIT"))
  }
}

class AgentSpec extends SparkSpec {

  private def withTestdata(): String = {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    graft.catalog.SchemaDocs.buildMarkdown(spark)
  }

  test("chat path: flagship question → sql + plan + rows") {
    val docs = withTestdata()
    val agent = new Agent(spark, new StubNlToSql, docs)
    val res = agent.chat("top 5 countries by revenue in 1995")
    assert(res.rows.length === 5)
    assert(res.plan.contains("Physical Plan"))
    assert(res.sql.toLowerCase.contains("group by"))
  }

  test("agent loop: success on first step with non-empty rows") {
    val docs = withTestdata()
    val agent = new Agent(spark, new StubNlToSql, docs)
    val out = agent.run("top 5 countries by revenue in 1995")
    assert(out.chosenSql.nonEmpty)
    assert(out.rows.length === 5)
    assert(out.candidates.exists(_.reason.startsWith("ok:5rows")))
    assert(out.telemetry("retries") === 0)
  }

  test("agent loop: unsafe draft is blocked then refined") {
    val docs = withTestdata()
    // provider that first emits DDL, then a safe query after refine
    val provider = new NlToSql {
      var calls = 0
      override def complete(question: String, rowLimit: Int): String = {
        calls += 1
        if (calls == 1) "```sql\nDROP TABLE orders\n```"
        else "```sql\nSELECT COUNT(*) AS n FROM orders\n```"
      }
    }
    val out = new Agent(spark, provider, docs).run("nuke the warehouse")
    assert(out.candidates.head.reason === "blocked: forbidden keyword")
    assert(out.chosenSql === "SELECT COUNT(*) AS n FROM orders")
    assert(out.rows.length === 1)
    assert(out.telemetry("retries") >= 1)
  }

  test("agent loop: analysis errors (bad column) are refined, not propagated") {
    val docs = withTestdata()
    val provider = new NlToSql {
      var calls = 0
      override def complete(question: String, rowLimit: Int): String = {
        calls += 1
        if (calls == 1) "```sql\nSELECT no_such_col FROM orders\n```"
        else "```sql\nSELECT COUNT(*) AS n FROM orders\n```"
      }
    }
    val out = new Agent(spark, provider, docs).run("typo question")
    assert(out.candidates.head.reason.startsWith("error:"))
    assert(out.chosenSql === "SELECT COUNT(*) AS n FROM orders")
    assert(out.rows.length === 1)
  }

  test("agent loop: empty results trigger refine, fallback keeps last ok") {
    val docs = withTestdata()
    val provider = new NlToSql {
      override def complete(question: String, rowLimit: Int): String =
        "```sql\nSELECT o_orderkey FROM orders WHERE o_totalprice < 0\n```"
    }
    val out = new Agent(spark, provider, docs).run("impossible question", maxSteps = 2)
    assert(out.lastError.contains("empty"))
    assert(out.chosenSql.nonEmpty) // fallback to last ok candidate
    assert(out.rows.isEmpty)
    assert(out.candidates.count(_.reason.startsWith("ok:0rows")) === 2)
  }

  test("agent loop: max_steps is normalized (0 ⇒ default 2) and capped") {
    val docs = withTestdata()
    val provider = new NlToSql {
      override def complete(question: String, rowLimit: Int): String =
        "```sql\nSELECT o_orderkey FROM orders WHERE o_totalprice < 0\n```"
    }
    // 0 is falsy in the reference (`inp.max_steps or 2`): the loop
    // must run the default 2 steps, not skip and return a non-answer
    val zero = new Agent(spark, provider, docs).run("q", maxSteps = 0)
    assert(zero.candidates.count(_.reason.startsWith("ok:0rows")) === 2)
    // an absurd request value is capped (16), not an unbounded
    // provider/Spark loop on a facade handler thread
    val huge = new Agent(spark, provider, docs).run("q", maxSteps = 1000000)
    assert(huge.candidates.count(_.reason.startsWith("ok:0rows")) === 16)
  }
}
