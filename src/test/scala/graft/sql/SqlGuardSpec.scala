package graft.sql

import graft.SparkSpec
import graft.sql.SqlGuard.IncorrectQuestionError
import org.apache.spark.sql.catalyst.plans.logical.GlobalLimit

class SqlGuardSpec extends SparkSpec {

  test("extract pulls the first sql fence, else whole string") {
    assert(SqlGuard.extractSqlFromMarkdown("```sql\nSELECT 1\n```") === "SELECT 1")
    assert(SqlGuard.extractSqlFromMarkdown("pre ```sql SELECT 2 ``` post") === "SELECT 2")
    assert(SqlGuard.extractSqlFromMarkdown("  SELECT 3  ") === "SELECT 3")
  }

  test("validate accepts plain SELECT and CTE queries") {
    assert(SqlGuard.validate(spark, "SELECT 1 AS x") === "SELECT 1 AS x")
    assert(SqlGuard.validate(spark,
      "select x from (select 1 as x)") === "select x from (select 1 as x)")
  }

  test("validate rejects non-SELECT and forbidden keywords") {
    intercept[IncorrectQuestionError](SqlGuard.validate(spark, "DROP TABLE t"))
    intercept[IncorrectQuestionError](SqlGuard.validate(spark, "SHOW TABLES"))
    // the reference's lexical gate blocks 'create' even inside a literal
    intercept[IncorrectQuestionError](
      SqlGuard.validate(spark, "SELECT 'create' AS word"))
    intercept[IncorrectQuestionError](
      SqlGuard.validate(spark, "SELECT 1; DROP TABLE t"))
  }

  test("isSafe mirrors the reference gates (query.http malicious case)") {
    assert(SqlGuard.isSafe("SELECT * FROM t")._1)
    assert(SqlGuard.isSafe("DELETE FROM t") === (false, "forbidden keyword"))
    assert(SqlGuard.isSafe("WITH x AS (SELECT 1) SELECT * FROM x")
      === (false, "only SELECT allowed")) // reference anchors ^SELECT
    assert(SqlGuard.isSafe("SELECT 1; SELECT 2") === (false, "multiple statements"))
    assert(SqlGuard.isSafe("SELECT 1 /* DROP */") === (false, "forbidden keyword"))
    assert(SqlGuard.isSafe("SELECT 1 /* hidden */") === (false, "block comments not allowed"))
    assert(SqlGuard.isSafe("SELECT 1;")._1) // trailing semicolon ok
    assert(SqlGuard.isSafe("") === (false, "empty"))
    assert(SqlGuard.isSafe("```SELECT 1```")._1) // backticks stripped
  }

  test("overrideLimit replaces a trailing LIMIT or appends one") {
    assert(SqlGuard.overrideLimit("SELECT * FROM t LIMIT 200", 5)
      === "SELECT * FROM t LIMIT 5")
    assert(SqlGuard.overrideLimit("SELECT * FROM t", 5)
      === "SELECT * FROM t\nLIMIT 5")
  }

  test("AutoLimitRule wraps unlimited guarded queries, leaves others") {
    spark.range(1000).createOrReplaceTempView("autolimit_src")
    spark.conf.set("graft.sql.autoLimit.enabled", "true")
    spark.conf.set("graft.sql.autoLimit.rows", "7")
    try {
      val df = spark.sql("SELECT id FROM autolimit_src")
      assert(df.queryExecution.optimizedPlan.isInstanceOf[GlobalLimit])
      // collect, not count: count() builds a fresh Aggregate plan whose
      // OUTPUT (1 row) is what the limit would cap — same as SQL-text
      // auto-limit semantics on an aggregate query.
      assert(df.collect().length === 7)
      // explicit limit is respected, not double-wrapped
      assert(spark.sql("SELECT id FROM autolimit_src LIMIT 900").collect().length === 900)
    } finally spark.conf.set("graft.sql.autoLimit.enabled", "false")
    // flag off → no cap
    assert(spark.sql("SELECT id FROM autolimit_src").collect().length === 1000)
  }

  test("query timeout cancels the job group and leaves the session usable") {
    val runner = new QueryRunner(spark, queryTimeoutMs = 1500)
    // cartesian square of 300M rows: cannot finish in 1.5s on local[4]
    spark.range(300L * 1000 * 1000).createOrReplaceTempView("slow_src")
    val err = intercept[Exception] {
      runner.run("SELECT COUNT(*) AS n FROM slow_src a, slow_src b")
    }
    assert(err.getMessage.contains("1500ms"))
    // the session must keep serving queries after the cancellation
    assert(new QueryRunner(spark).run("SELECT 1 AS x").rows.length === 1)
  }

  test("QueryRunner returns plan + bounded preview and records metrics") {
    spark.range(100).createOrReplaceTempView("qr_src")
    val before = graft.metrics.Metrics.counter("ai_requests_total",
      Map("route" -> "chat"))
    val runner = new QueryRunner(spark, rowLimit = 50, previewRows = 20)
    val res = runner.run("```sql\nSELECT id FROM qr_src\n```")
    assert(res.sql === "SELECT id FROM qr_src")
    assert(res.plan.contains("Physical Plan"))
    assert(res.rows.length === 20)
    assert(res.rows.head.startsWith("{\"id\":"))
    assert(before >= 0) // registry accessible
  }
}
