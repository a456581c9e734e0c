package graft.sources

import graft.SparkSpec

/** Compaction mechanics on a deliberately fragmented table: the
  * report must flag the fragmentation, the rewrite must collapse the
  * file count to the byte-derived target, and the data must survive
  * byte-for-byte (same rows, any order). */
class CompactionSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-compact").toString

  test("report flags a fragmented directory and compact collapses it") {
    import spark.implicits._
    val src = tmp()
    // 40 shards of a ~200k-row table → 40 small part files
    spark.range(200000)
      .select($"id", ($"id" % 97).as("k"),
        concat(lit("row-"), $"id").as("payload"))
      .repartition(40)
      .write.mode("overwrite").parquet(src)

    val before = Compaction.report(spark, src).head()
    assert(before.getAs[Long]("n_files") === 40L)
    assert(before.getAs[Long]("n_small_files") === 40L,
      "every 40th-of-200k-rows shard must sit under the small-file bar")
    val totalBytes = before.getAs[Long]("total_bytes")

    // target ≈ a third of the table → expect 3 output files
    val out = tmp()
    val (nBefore, nAfter) =
      Compaction.compact(spark, src, out, targetFileBytes = totalBytes / 3 + 1)
    assert(nBefore === 40L)
    assert(nAfter === 3L)

    // contents identical (row set, not order)
    val a = spark.read.parquet(src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val b = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(a === b)

    // the compacted layout is no longer flagged
    val after = Compaction.report(spark, out,
      smallBytes = totalBytes / 10).head()
    assert(after.getAs[Long]("n_files") === 3L)
    assert(after.getAs[Long]("n_small_files") === 0L,
      "balanced thirds must all clear a tenth-of-table small bar")
    assert(after.getAs[Long]("total_bytes") > 0L)
  }

  test("compact refuses an empty directory loudly") {
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, tmp(), tmp())
    }
    assert(e.getMessage.contains("nothing to compact"))
  }

  test("compact refuses outDir == dir (overwrite would eat the input)") {
    import spark.implicits._
    val src = tmp()
    spark.range(100).select($"id").write.mode("overwrite").parquet(src)
    // same path spelled differently must still be caught (qualified-URI
    // compare, not string compare)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, src, src.stripSuffix("/") + "/")
    }
    assert(e.getMessage.contains("cannot overwrite or nest into its own input"))
    // containment both ways is the same data loss: an ANCESTOR outDir
    // clears the input via overwrite before the lazy scan runs; an
    // outDir INSIDE dir corrupts later partition discovery
    val up = intercept[IllegalArgumentException] {
      Compaction.compact(spark, src, java.nio.file.Paths.get(src)
        .getParent.toString)
    }
    assert(up.getMessage.contains("cannot overwrite or nest"))
    val in = intercept[IllegalArgumentException] {
      Compaction.compact(spark, src, src + "/compacted")
    }
    assert(in.getMessage.contains("cannot overwrite or nest"))
    // a SIBLING whose name shares a prefix is NOT containment
    val sib = src.stripSuffix("/") + "2"
    Compaction.compact(spark, src, sib)
    assert(spark.read.parquet(sib).count() === 100L)
    // a zero/negative file-size target fails fast, not divide-by-zero
    val z = intercept[IllegalArgumentException] {
      Compaction.compact(spark, src, sib + "b", targetFileBytes = 0L)
    }
    assert(z.getMessage.contains("targetFileBytes"))
    assert(spark.read.parquet(src).count() === 100L, "input must be intact")
  }

  test("report lists hive-partitioned layouts recursively") {
    import spark.implicits._
    val src = tmp()
    spark.range(1000)
      .select($"id", ($"id" % 4).as("day"))
      .write.mode("overwrite").partitionBy("day").parquet(src)
    val rep = Compaction.report(spark, src).head()
    // 4 day= subdirectories, each with ≥1 part file — a flat listing
    // would report 0 files and read as a healthy layout
    assert(rep.getAs[Long]("n_files") >= 4L)
    assert(rep.getAs[Long]("total_bytes") > 0L)
  }

  private def concat(cols: org.apache.spark.sql.Column*) =
    org.apache.spark.sql.functions.concat(cols: _*)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}
