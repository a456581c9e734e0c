package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** S3 round-trip against embedded Derby (ships with Spark) — the
  * no-network stand-in for the reference's PostgreSQL backend. */
class JdbcSpec extends SparkSpec {

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_derby")
    s"jdbc:derby:$dir/db;create=true"
  }
  private val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")

  test("read a JDBC table, partitioned read fans out, write round-trips") {
    val con = DriverManager.getConnection(url)
    val st = con.createStatement()
    st.executeUpdate("CREATE TABLE people (id BIGINT, name VARCHAR(32), score DOUBLE)")
    (1 to 40).foreach(i =>
      st.executeUpdate(s"INSERT INTO people VALUES ($i, 'p$i', ${i * 1.5})"))
    st.close(); con.close()

    val df = Jdbc.read(spark, url, "people", driver = driver)
    assert(df.count() === 40)
    assert(df.schema.fieldNames.map(_.toLowerCase).toSet === Set("id", "name", "score"))

    val part = Jdbc.readPartitioned(spark, url, "people",
      partitionColumn = "id", lowerBound = 1, upperBound = 40,
      numPartitions = 4, driver = driver)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === 40)
    assert(part.agg(org.apache.spark.sql.functions.sum("id"))
      .collect()(0).getLong(0) === 820L)

    Jdbc.write(df.selectExpr("id", "score"), url, "scores", driver = driver)
    assert(Jdbc.read(spark, url, "scores", driver = driver).count() === 40)
  }
}
