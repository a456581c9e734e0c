package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared-query registries of every operator module.
  * Each entry pairs a Spark query `(session, sfDir) => DataFrame` with
  * equivalent DuckDB SQL in [[oracleSql]]; the driver hash-compares the
  * two at sf0.01 (column names are matched by sort, so Spark aliases and
  * SQL `AS` names must agree exactly).
  */
object SparkEntry {
  /** Smallest testdata scale factor (driver smoke + bench warmup). */
  val SmallestSfDir = "/root/testdata/sf0.001"

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.flagship(spark, SmallestSfDir)

  private def registry: Seq[Registry] = Seq(
    graft.queries.Relational,
    graft.queries.DqQueries,
    graft.queries.TextPipeline,
    graft.queries.VectorPipeline,
    graft.queries.EventPipeline
  )

  // Map ++ silently keeps the later value on a key collision — a
  // duplicate query name across two registries would silently shrink
  // the bench/verify surface by one. Fail at aggregation instead.
  private def merged[V](parts: Seq[Map[String, V]], what: String): Map[String, V] = {
    val m = parts.reduce(_ ++ _)
    require(m.size == parts.map(_.size).sum,
      s"duplicate $what name across registries: " +
        parts.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    m
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(registry.map(_.queries), "query")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged(registry.map(_.oracleSql), "oracle")
}

/** A module contributing declared queries + oracles. */
trait Registry {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
