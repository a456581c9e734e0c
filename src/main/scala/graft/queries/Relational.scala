package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The relational query surface the reference copilot emits (SURVEY.md
  * §2.3, Q1–Q14; reference `src/chain.py:17-25`, `query.http:49-155`),
  * transposed onto the driver's TPC-H-ish testdata.
  *
  * Determinism contract (SURVEY.md §4): every declared query carries a
  * total ORDER BY with key tiebreakers; money sums go through
  * decimal(18,2) so the aggregate is exact and order-independent (a
  * plain double sum is not associative — Spark's partial aggregation
  * order would diverge from DuckDB's serial sum in the last ulps),
  * then cast back to double so both engines emit the identical value.
  *
  * Scale notes: fact-fact joins (orders⋈lineitem) shuffle on the join
  * key; dimension joins (nation, region, customer at TPC-H ratios)
  * broadcast. Filters are pushed to the parquet scan — all queries
  * filter/project before joining.
  */
object Relational extends graft.Registry {

  /** Exact, order-independent money sum: decimal in, double out. */
  private def moneySum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Flagship (reference canonical example `src/chain.py:17-25`:
    * "top-5 countries by revenue in <year>"): Q1 projection, Q2 year
    * range filter, Q4/Q5 joins, Q6/Q7 group+sum, Q8 round, Q9 order
    * desc, Q10 limit. Nation is broadcast (25 rows); the orders filter
    * is pushed to the scan.
    */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .where(col("o_orderdate") >= lit("1995-01-01") &&
             col("o_orderdate") <  lit("1996-01-01"))
      .select("o_custkey", "o_totalprice")
    val customer = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val nation   = t(s, dir, "nation").select("n_nationkey", "n_name")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(moneySum("o_totalprice").as("revenue"))
      .orderBy(desc("revenue"), col("nation"))
      .limit(5)
  }

  val flagshipSql: String =
    """SELECT n_name AS nation,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, nation
      |LIMIT 5""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_flagship_revenue_by_nation" -> ((s, dir) => flagship(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_flagship_revenue_by_nation" -> flagshipSql
  )
}
