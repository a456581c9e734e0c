package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Regression pin for the events.ts physical-type normalization.
  *
  * The driver's testdata has shipped events.ts as TIMESTAMP(NANOS),
  * raw int64 nanos (ScaleGen output), and TIMESTAMP(MICROS) without
  * UTC adjustment (TIMESTAMP_NTZ) across generations; round 7 broke
  * because the reader assumed one of them. [[Tables.table]] must
  * normalize every form to the same microsecond `TimestampType` value.
  * (Spark cannot WRITE nanos parquet, so the NANOS case is covered by
  * its on-read shape: a raw long column — identical to ScaleGen's.)
  */
class TablesSpec extends SparkSpec {

  // 2024-01-10T01:02:03.004005Z as epoch micros.
  private val EpochUs = 1704848523004005L

  private def writeEvents(schemaTs: DataType, value: Any): String = {
    val dir = Files.createTempDirectory("tables_spec_").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", schemaTs)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, value)), schema)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readBack(dir: String): (DataType, Long) = {
    val out = Tables.table(spark, dir, "events")
    val dt = out.schema("ts").dataType
    val us = out.selectExpr("unix_micros(ts)").first().getLong(0)
    (dt, us)
  }

  test("raw int64 nanos (ScaleGen layout) → TimestampType micros") {
    val dir = writeEvents(LongType, EpochUs * 1000L + 999L) // sub-µs floors
    val (dt, us) = readBack(dir)
    assert(dt == TimestampType)
    assert(us == EpochUs)
  }

  test("TIMESTAMP_NTZ micros (current driver testdata) → TimestampType, value-preserving under UTC") {
    val ntz = java.time.LocalDateTime.ofEpochSecond(
      EpochUs / 1000000L, (EpochUs % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
    val dir = writeEvents(TimestampNTZType, ntz)
    val (dt, us) = readBack(dir)
    assert(dt == TimestampType)
    assert(us == EpochUs)
  }

  test("TimestampType micros passes through unchanged") {
    val inst = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      EpochUs / 1000000L, (EpochUs % 1000000L).toInt * 1000))
    val dir = writeEvents(TimestampType, inst)
    val (dt, us) = readBack(dir)
    assert(dt == TimestampType)
    assert(us == EpochUs)
  }
}
