package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import VectorStreams._

/** Streaming similarity search vs the stored LSH corpus: results must
  * agree exactly with the batch v02 pipeline for the same query
  * vectors (same planes, buckets, and cosine fold).
  */
class VectorStreamsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streamed query vectors score same-bucket candidates like batch v02") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // take 5 corpus vectors as live queries (vec_id < 10 are also the
    // batch v02 query set, so results are directly comparable)
    val qvecs = graft.sources.Tables.table(spark, dir, "embeddings")
      .where("vec_id < 5").collect()
      .map(r => QueryVec(r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq,
        new Timestamp(1700000000000L)))
    val src = MemoryStream[QueryVec]
    val out = similar(spark, dir,
      src.toDF()
        .withColumnRenamed("queryId", "query_id"),
      minCos = 0.2)
    val q = out.writeStream.format("memory").queryName("stream_ann")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(qvecs.toSeq)
      q.processAllAvailable()
      val got = spark.table("stream_ann").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
          r.getAs[Double]("cos")).toMap
      assert(got.nonEmpty)
      // batch reference: same-bucket candidates of the same queries
      // with exact cosine (annLsh before its top-k cut includes these;
      // recompute directly against the bucketed corpus)
      import org.apache.spark.sql.functions._
      val corpus = graft.queries.VectorPipeline.bucketedCorpus(spark, dir)
      val expected = corpus.as("a").where("vec_id < 5")
        .join(corpus.as("b"), col("a.bucket") === col("b.bucket"))
        .select(col("a.vec_id").as("q"), col("b.vec_id").as("n"),
          expr("vec_dot(a.embedding, b.embedding) / (sqrt(vec_dot(a.embedding, a.embedding)) * sqrt(vec_dot(b.embedding, b.embedding)))").as("cos"))
        .where(col("cos") >= 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got.keySet === expected.keySet)
      got.foreach { case (k, c) => assert(c === expected(k), s"cos mismatch at $k") }
    } finally q.stop()
  }
}
