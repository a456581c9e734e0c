package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S3, PostgreSQL dialect: the reference's alternate backend is a real
  * Postgres (`src/database/db_connector.py:115-151`), which the
  * sandbox cannot reach (zero egress) — JdbcSpec covers the live
  * round-trip against embedded Derby. What IS testable offline, and
  * what this spec pins, is the dialect layer [[Jdbc]] rides on for a
  * `jdbc:postgresql://` URL: Spark resolves PostgresDialect from the
  * URL alone, and that dialect decides the DDL type mapping, the
  * read-side Catalyst types, and identifier quoting for every
  * statement the source/sink issues. A silent fallback to the generic
  * dialect here (e.g. a URL-scheme typo) would produce TEXT-less
  * VARCHAR DDL and unquoted mixed-case identifiers that Postgres
  * folds to lowercase — the exact class of breakage a live test would
  * catch, pinned without the server. */
class PostgresDialectSpec extends AnyFunSuite {

  private val url = "jdbc:postgresql://db.internal:5432/analytics"
  private val dialect = JdbcDialects.get(url)

  test("a postgresql URL resolves the Postgres dialect, not the generic one") {
    assert(dialect.getClass.getName.contains("PostgresDialect"),
      s"got ${dialect.getClass.getName}")
    // the generic fallback for an unknown scheme, for contrast
    assert(!JdbcDialects.get("jdbc:nosuchdb://x/y")
      .getClass.getName.contains("Postgres"))
  }

  test("write-side DDL types match Postgres column types") {
    def ddl(dt: DataType): Option[String] =
      dialect.getJDBCType(dt).map(_.databaseTypeDefinition)
    // Postgres has no VARCHAR-sized default for strings: TEXT
    assert(ddl(StringType) === Some("TEXT"))
    assert(ddl(BinaryType) === Some("BYTEA"))
    assert(ddl(BooleanType) === Some("BOOLEAN"))
    assert(ddl(FloatType) === Some("FLOAT4"))
    assert(ddl(DoubleType) === Some("FLOAT8"))
    assert(ddl(ShortType) === Some("SMALLINT"))
    assert(ddl(ByteType) === Some("SMALLINT"))
    // embeddings column: float array maps to a real PG array type
    assert(ddl(ArrayType(FloatType)) === Some("FLOAT4[]"))
    // LongType has no Postgres override; the common BIGINT mapping
    // applies downstream (dialect returns None, not a wrong type)
    assert(ddl(LongType) === None)
  }

  test("read-side JDBC metadata maps to the Catalyst types the engine expects") {
    def cat(sqlType: Int, typeName: String): Option[DataType] =
      dialect.getCatalystType(sqlType, typeName, 0, new MetadataBuilder)
    // PG 'real' is 4-byte: FloatType, not the generic dialect's Double
    assert(cat(Types.REAL, "float4") === Some(FloatType))
    // PG smallint comes back as ShortType (generic maps to Integer)
    assert(cat(Types.SMALLINT, "int2") === Some(ShortType))
  }

  test("identifier quoting survives Postgres lower-folding") {
    // unquoted identifiers fold to lowercase in PG; the dialect must
    // double-quote so a mixed-case Spark column round-trips
    assert(dialect.quoteIdentifier("MixedCase") === "\"MixedCase\"")
    assert(dialect.quoteIdentifier("with space") === "\"with space\"")
  }
}
