package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import DocStreams._

class DocStreamsSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private def doc(id: Long, text: String, minutes: Long,
      lang: String = "en") = Doc(id, lang, "src0", text, ts(minutes))

  private def snake(df: DataFrame): DataFrame = df
    .withColumnRenamed("docId", "doc_id")
    .withColumnRenamed("ingestTs", "ingest_ts")

  test("streaming exact dedup keeps only first-seen content hashes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val q = dedupExact(snake(src.toDF()), watermark = "30 minutes")
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(
        doc(1, "the quick brown fox", 0),
        doc(2, "the quick brown fox", 1), // exact dup, later id
        doc(3, "a completely different text", 2))
      q.processAllAvailable()
      src.addData(doc(4, "the quick brown fox", 5)) // dup within horizon
      q.processAllAvailable()
      val ids = spark.table("doc_dedup").select("doc_id").collect()
        .map(_.getLong(0)).sorted
      assert(ids === Array(1L, 3L))
    } finally q.stop()
  }

  test("streaming quality gate scores with the batch td02 expressions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val q = qualityFilter(snake(src.toDF()), minScore = 0.5)
      .writeStream.format("memory").queryName("doc_quality")
      .outputMode(OutputMode.Append).start()
    try {
      val good = "plenty of reasonable words arranged sensibly " +
        "without excessive stopword padding here"
      val bad = "the a of and to in is on" // all stopwords
      src.addData(doc(10, good, 0), doc(11, bad, 1))
      q.processAllAvailable()
      val rows = spark.table("doc_quality").collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(10L))
      // the payload and event-time columns rode through the scoring
      // transform — a gated ingest must still LAND the document body
      assert(rows.head.getAs[String]("text") === good)
      assert(rows.head.getAs[Timestamp]("ingest_ts") === ts(0))
      // score equals the batch expression evaluated on the same text
      val batchScore = graft.queries.TextPipeline.scoreQuality(
        Seq((10L, "en", good)).toDF("doc_id", "lang", "text"))
        .collect()(0).getAs[Double]("quality_score")
      assert(rows.head.getAs[Double]("quality_score") === batchScore)
    } finally q.stop()
  }
}
