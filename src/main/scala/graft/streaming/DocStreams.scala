package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document ingest for the `documents` table shape — the
  * live half of the training-data pipeline (batch forms:
  * [[graft.queries.TextPipeline]]). A corpus at 100 TB is not
  * re-scanned per day; new documents arrive continuously and must be
  * deduplicated and quality-gated ON INGEST, before they ever land in
  * the lake.
  *
  * Scale notes: exact dedup state is one (hash → seen) entry per
  * distinct document inside the watermark horizon, hash-partitioned
  * across executors and evicted as event time passes — bounded state,
  * no full-corpus reprocessing. The quality gate is stateless codegen'd
  * column math, so it adds no state at all. Cross-horizon dedup (a
  * duplicate arriving months later) is the batch td05/td09 pass over
  * the accumulated lake — the standard lambda split.
  */
object DocStreams {

  final case class Doc(
      docId: Long, lang: String, source: String, text: String,
      ingestTs: Timestamp)

  /** Streaming exact dedup: only the FIRST document with each content
    * hash (within the watermark horizon) survives. Uses
    * `dropDuplicatesWithinWatermark` so the per-hash state is evicted
    * once the event-time watermark passes — the streaming form of the
    * td05 md5-groupBy. */
  def dedupExact(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .drop("text_hash")

  /** Streaming quality gate: scores each arriving document with the
    * SAME stateless expressions as the batch td02 query and keeps
    * documents at/above `minScore` — identical scoring logic in both
    * halves of the pipeline by construction. */
  def qualityFilter(docs: DataFrame, minScore: Double = 0.5): DataFrame =
    graft.queries.TextPipeline.scoreQuality(docs)
      .where(col("quality_score") >= minScore)
}
