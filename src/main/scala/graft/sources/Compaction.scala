package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for a parquet directory — the lake-hygiene
  * pass every 100 TB deployment schedules: streaming ingest and
  * over-parallel writers fragment tables into thousands of
  * kilobyte-scale files, and scan cost then becomes file-listing +
  * task-scheduling overhead instead of IO (a 1000-executor cluster
  * reading 100 000 × 1 MB files spends longer opening them than
  * scanning them). The reference has no lake layer (it queries
  * in-place files), so this is beyond-parity engine tooling.
  *
  * Design: [[report]] is a driver-side file LISTING (metadata only —
  * no data scan, exactly what a catalog's stats collector does);
  * [[compact]] rewrites the directory through one round-robin
  * `repartition` sized from the measured byte total, so output files
  * land near `targetFileBytes` regardless of input skew. Round-robin
  * (not `coalesce`) is deliberate: `coalesce` merges whole input
  * partitions and inherits their skew, which recreates the very
  * imbalance compaction exists to fix; the one extra shuffle is the
  * price of balanced output and parallelizes linearly. Atomicity at
  * scale follows the same recipe as the catalog's atomic sink
  * (write to a fresh directory, then swap the table location). */
object Compaction {

  final case class FileStat(path: String, bytes: Long)

  /** Parquet part files of `dir` (driver-side metadata listing),
    * RECURSIVE so hive-partitioned layouts (key=value subdirectories
    * from [[Bucketing.writePartitioned]]) report their real file
    * population instead of a misleading 0-file "healthy" answer. */
  def fileStats(spark: SparkSession, dir: String): Seq[FileStat] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[FileStat]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet"))
          buf += FileStat(s.getPath.toString, s.getLen)
      }
      buf.result().sortBy(_.path)
    }
  }

  /** One-row layout report: file count, byte totals/extremes, and how
    * many files sit under `smallBytes` (the fragmentation signal a
    * scheduler alerts on). */
  def report(spark: SparkSession, dir: String,
      smallBytes: Long = 16L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val stats = fileStats(spark, dir)
    Seq((
      stats.size.toLong,
      stats.map(_.bytes).sum,
      stats.map(_.bytes).minOption.getOrElse(0L),
      stats.map(_.bytes).maxOption.getOrElse(0L),
      stats.count(_.bytes < smallBytes).toLong))
      .toDF("n_files", "total_bytes", "min_bytes", "max_bytes", "n_small_files")
  }

  /** Rewrite `dir` into `outDir` with output files sized near
    * `targetFileBytes`; returns (files before, files after). The
    * partition count comes from the MEASURED input byte total, so a
    * directory of 10 000 shards and a directory of 3 big files both
    * land on the same output layout. `outDir` must differ from `dir`
    * (compared as fully-qualified URIs): `mode("overwrite")` onto the
    * source path would delete the input out from under the lazy scan
    * and lose the table. A hive-partitioned input is read through
    * partition discovery and compacted FLAT (partition keys become
    * data columns); re-partition the output via
    * [[Bucketing.writePartitioned]] if the layout should survive. */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val hc = spark.sparkContext.hadoopConfiguration
    val inP = new Path(dir)
    val inQ = inP.getFileSystem(hc).makeQualified(inP)
    val outP = new Path(outDir)
    val outQ = outP.getFileSystem(hc).makeQualified(outP)
    // Containment, not just equality: an outDir that is an ANCESTOR of
    // dir is the same data-loss (overwrite clears it, input included,
    // before the lazy scan runs); outDir INSIDE dir corrupts every
    // later partition discovery of dir. Compare slash-terminated URI
    // strings so /lake/t2 is not treated as a prefix of /lake/t20.
    def uriOf(p: Path) = p.toUri.toString.stripSuffix("/") + "/"
    require(!uriOf(inQ).startsWith(uriOf(outQ)) &&
        !uriOf(outQ).startsWith(uriOf(inQ)),
      s"compact cannot overwrite or nest into its own input: $inQ vs $outQ " +
        "— write to a fresh sibling directory and swap the table " +
        "location (atomic-sink recipe)")
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive: $targetFileBytes")
    val before = fileStats(spark, dir)
    require(before.nonEmpty, s"nothing to compact under $dir")
    val totalBytes = before.map(_.bytes).sum
    // clamp to Int range BEFORE toInt: a tiny target over a large
    // directory would wrap negative and fail after the full listing
    val nOut = math.min(Int.MaxValue.toLong, math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes))
    spark.read.parquet(dir)
      .repartition(nOut.toInt)
      .write.mode("overwrite").parquet(outDir)
    (before.size.toLong, fileStats(spark, outDir).size.toLong)
  }
}
