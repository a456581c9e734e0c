package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table support: the co-location tool for the joins that
  * dominate a 100 TB deployment.
  *
  * A shuffle join on `orders ⋈ lineitem` moves BOTH fact tables across
  * the network every time the join runs. Writing each side bucketed
  * (and sorted) by the join key with the SAME bucket count makes every
  * subsequent join on that key shuffle-free: Spark's bucketed scan
  * exposes the hash-partitioning to Catalyst, so SortMergeJoin runs
  * with no Exchange on either side — the join cost drops from
  * O(data moved) per query to zero movement, paid once at write time.
  * The same applies to repeated `groupBy` on the bucket key.
  *
  * This is the storage-layout analogue of `repartition` — persistent
  * across queries and sessions, which is exactly what a curated lake
  * wants for its canonical join keys. (At 100 TB choose bucket counts
  * so each bucket file lands near the 128 MB–1 GB band; bucket counts
  * must match across tables intended to co-join.)
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table
    * (`CREATE TABLE … CLUSTERED BY … SORTED BY … INTO n BUCKETS`). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "at least one bucket key required")
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Write `df` hive-partitioned by `cols` — the OTHER storage-layout
    * lever: where bucketing kills join/agg shuffles, directory
    * partitioning kills the SCAN for any query filtering on the
    * partition columns. The filter becomes a `PartitionFilters` entry
    * resolved at plan time from the directory listing alone, so a
    * day-partitioned 100 TB table filtered to one day reads that
    * day's files and nothing else — no footer, no row, no byte of the
    * other 36 499 days is touched (pinned by BucketingSpec). Choose
    * partition columns with bounded cardinality (date, source, lang);
    * high-cardinality keys belong in bucketing, where they don't
    * explode the directory tree. */
  def writePartitioned(df: DataFrame, outDir: String,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "at least one partition column required")
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(outDir)
  }
}
