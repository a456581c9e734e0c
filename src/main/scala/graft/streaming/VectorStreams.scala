package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.VectorPipeline

/** Streaming similarity search: live query vectors scored against the
  * STORED LSH-bucketed corpus — the online half of the batch v02
  * query, same planes, same buckets, same exact-cosine rescoring.
  *
  * Scale design: this is a stateless stream-static equijoin on the
  * bucket id. The corpus side is the persisted index (cached here;
  * bucketed/partitioned storage at 100 TB), so each arriving query
  * touches only its own bucket's candidates — no per-query corpus
  * scan, no streaming state to manage, and the join parallelizes over
  * whatever partitioning the index has. Candidates are rescored with
  * the exact codegen'd cosine and thresholded before emission.
  */
object VectorStreams {

  final case class QueryVec(queryId: Long, embedding: Seq[Float], ts: Timestamp)

  /** Score a stream of query vectors (`query_id`, `embedding`, `ts`)
    * against the corpus at `dir`: emits (query_id, neighbor_id, cos,
    * ts) for same-bucket candidates with cos ≥ `minCos`. Works
    * unchanged on a batch frame of queries. */
  def similar(spark: SparkSession, dir: String, queries: DataFrame,
      minCos: Double = 0.3): DataFrame = {
    val (normC, bucketC) = VectorPipeline.normAndBucket(spark)
    val corpus = VectorPipeline.bucketedCorpus(spark, dir)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bucket").as("cbucket"))
      .cache() // the static side: built once, served to every microbatch
    val q = queries.select(
      col("query_id"), col("ts"),
      col("embedding").as("qe"), normC.as("qn"), bucketC.as("bucket"))
    q.join(corpus, col("bucket") === col("cbucket"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        expr("vec_dot(qe, embedding)").divide(col("qn") * col("nrm")).as("cos"),
        col("ts"))
      .where(col("cos") >= minCos)
  }
}
