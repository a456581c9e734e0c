package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (SURVEY.md §2.1 S3; the reference's alternate
  * PostgreSQL backend selected by `database_type`,
  * `src/database/db_connector.py:115-151`). Thin typed wrapper over
  * `spark.read.format("jdbc")`.
  *
  * Scale note: [[readPartitioned]] is the form that matters on a
  * cluster — N executors each issue a range-bounded query instead of
  * one connection streaming the whole table through the driver. The
  * unpartitioned [[read]] exists for small dimension tables only.
  */
object Jdbc {

  private def props(user: Option[String], password: Option[String],
      driver: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Single-partition read — small tables only. */
  def read(spark: SparkSession, url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(user, password, driver))

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * queries striding `partitionColumn` across [lower, upper].
    * NOTE (Spark JDBC contract): the bounds decide the STRIDE ONLY,
    * not a filter — the first partition's predicate is open below
    * (`col < lo+stride OR col IS NULL`) and the last open above, so
    * every row of the table is returned regardless of the bounds.
    * Rows outside [lower, upper] just pile into the edge partitions;
    * add an explicit `.where` if a range FILTER is wanted. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(user, password, driver))

  /** Write a DataFrame to a JDBC table. */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None): Unit =
    df.write.mode(mode).jdbc(url, table, props(user, password, driver))
}
