package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, md5}
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

  test("streaming minhash near-dup agrees with the batch td07 pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the full sf0.001 corpus, streamed in arrival order
    val corpus = graft.sources.Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .sortBy(_.getAs[Long]("doc_id"))
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"),
        ts(r.getAs[Long]("doc_id"))))
    val src = MemoryStream[Doc]
    val q = nearDupMinHash(snake(src.toDF()), maxBucketDocs = 1000)
      .writeStream.format("memory").queryName("stream_neardup")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(corpus.toSeq)
      q.processAllAvailable()
      val streamPairs = spark.table("stream_neardup").collect()
        .map(r => (r.getAs[Long]("docA"), r.getAs[Long]("docB"))).toSet
      val batchPairs = graft.queries.TextPipeline.dedupMinHash(spark, dir)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // same constants, same banding, same threshold → same pair set
      assert(streamPairs === batchPairs)
      assert(streamPairs.nonEmpty)
    } finally q.stop()
  }

  test("streaming ingest gate verdicts aggregate to the batch td23 counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val mod = graft.queries.TextPipeline.IngestMod
    val rem = graft.queries.TextPipeline.IngestNewRem
    // stream = the td23 "incoming batch" split; static = the rest
    val newDocs = graft.sources.Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .filter(_.getAs[Long]("doc_id") % mod == rem)
      .sortBy(_.getAs[Long]("doc_id"))
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"),
        ts(r.getAs[Long]("doc_id"))))
    val corpusBands = graft.queries.TextPipeline.minhashBands(spark, dir)
      .where(col("doc_id") % mod =!= rem)
      .select("band", "bkey", "sigarr")
    val corpusMd5 = graft.sources.Tables.table(spark, dir, "documents")
      .where(col("doc_id") % mod =!= rem)
      .select(md5(col("text")).as("mh")).distinct()
    val src = MemoryStream[Doc]
    val q = ingestGate(snake(src.toDF()), corpusBands, corpusMd5)
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(newDocs.toSeq)
      q.processAllAvailable()
      src.addData(doc(999999, "far future closer doc", 100000))
      q.processAllAvailable()
      val got = spark.table("ingest_gate").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[String]("verdict")))
      // one closed-window verdict per streamed doc (closer excluded —
      // its own window never closes)
      assert(got.map(_._1).distinct.length === newDocs.length)
      val bySource = got.groupBy(_._2).view.mapValues { rs =>
        Seq(rs.length.toLong,
          rs.count(_._3 == "exact_dup").toLong,
          rs.count(_._3 == "near_dup").toLong,
          rs.count(_._3 == "admitted").toLong)
      }.toMap
      val want = graft.queries.TextPipeline.ingestDedup(spark, dir).collect()
        .map(r => r.getString(0) -> (1 to 4).map(r.getLong).toSeq).toMap
      // same split, same md5 gate, same band + agreement bar → the
      // streamed verdicts aggregate to the batch report exactly
      assert(bySource === want)
    } finally q.stop()
  }

  test("streaming simhash near-dup agrees with the batch td08 pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.sources.Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .sortBy(_.getAs[Long]("doc_id"))
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"),
        ts(r.getAs[Long]("doc_id"))))
    val src = MemoryStream[Doc]
    val q = nearDupSimHash(snake(src.toDF()), maxBucketDocs = 1000)
      .writeStream.format("memory").queryName("stream_simdup")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(corpus.toSeq)
      q.processAllAvailable()
      val streamPairs = spark.table("stream_simdup").collect()
        .map(r => (r.getAs[Long]("docA"), r.getAs[Long]("docB"),
          r.getAs[Long]("hamming"))).toSet
      val batchPairs = graft.queries.TextPipeline.dedupSimHash(spark, dir)
        .select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // same frozen constants, bit-identical signatures, same banding
      // and Hamming cut → identical pair set INCLUDING distances
      assert(streamPairs === batchPairs)
      assert(streamPairs.nonEmpty)
    } finally q.stop()
  }

  test("late-only arrivals into an expired bucket do not crash the query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val q = nearDupSimHash(snake(src.toDF()), watermark = "30 minutes")
      .writeStream.format("memory").queryName("stream_simdup_late")
      .outputMode(OutputMode.Append).start()
    try {
      val text = "alpha beta gamma delta epsilon zeta eta theta"
      src.addData(doc(1, text, 0))
      q.processAllAvailable()
      // advance the watermark far past doc 1's buckets' TTL
      src.addData(doc(2, "totally different words entirely in here now", 500))
      q.processAllAvailable()
      // a LATE row aimed at those buckets: Spark 4 filters late input
      // ahead of flatMapGroupsWithState (verified: the unclamped
      // variant also survives), and scheduleEviction's watermark clamp
      // defends the query if that pre-filter ever changes
      src.addData(doc(3, text, 1))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("streaming near-dup state is bounded per bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    // identical docs land in the same buckets; cap 2 keeps only the
    // latest two per bucket, so doc 4 pairs with at most 2 others
    val q = nearDupMinHash(snake(src.toDF()), maxBucketDocs = 2)
      .writeStream.format("memory").queryName("stream_neardup_cap")
      .outputMode(OutputMode.Append).start()
    try {
      val text = "alpha beta gamma delta epsilon zeta eta theta"
      src.addData((1L to 3L).map(i => doc(i, text, i)))
      q.processAllAvailable()
      src.addData(doc(4, text, 10))
      q.processAllAvailable()
      val partners = spark.table("stream_neardup_cap").collect()
        .map(r => (r.getAs[Long]("docA"), r.getAs[Long]("docB"))).toSet
        .filter(_._2 == 4L).map(_._1)
      assert(partners === Set(2L, 3L), s"cap 2 must keep only docs 2,3: $partners")
    } finally q.stop()
  }

  test("replayed evicted doc does not re-enter its bucket or re-emit pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val q = nearDupMinHash(snake(src.toDF()), maxBucketDocs = 2)
      .writeStream.format("memory").queryName("stream_neardup_replay")
      .outputMode(OutputMode.Append).start()
    try {
      val text = "alpha beta gamma delta epsilon zeta eta theta"
      src.addData((1L to 3L).map(i => doc(i, text, i)))
      q.processAllAvailable()
      val before = spark.table("stream_neardup_replay").count()
      assert(before > 0)
      // doc 1 was evicted by the cap (buckets retain docs 2,3); an
      // at-least-once source replay redelivers it — the bucket must
      // remember it was already admitted and emit nothing new
      src.addData(doc(1, text, 1))
      q.processAllAvailable()
      val after = spark.table("stream_neardup_replay").count()
      assert(after === before,
        s"replayed evicted doc re-emitted ${after - before} pair rows")
    } finally q.stop()
  }

  test("bucketStep: large replayed batch stays suppressed, seen list bounded") {
    val maxDocs = 4
    val n = 500
    val arrivals = (1L to n.toLong).toVector.map(i =>
      (i, new java.sql.Timestamp(1000L + i), i, "b"))
    val emit = (kid: Long, _: Long, id: Long, _: Long) => Some(kid -> id)
    val (out1, known1, seen1, last1) =
      DocStreams.bucketStep[Long, (Long, Long)](
        arrivals, Seq.empty, Seq.empty, 0L, maxDocs, emit)
    assert(out1.nonEmpty)
    assert(known1.map(_._1) === ((n - maxDocs + 1) to n).map(_.toLong))
    // seen horizon = SeenIdsFactor (8) × doc cap, newest-first trim,
    // insertion order preserved
    assert(seen1 === ((n - maxDocs * 8 + 1) to n).map(_.toLong))
    assert(last1 === 1000L + n)
    // an at-least-once replay of everything inside the seen horizon
    // emits nothing and leaves the state bit-identical
    val (out2, known2, seen2, last2) =
      DocStreams.bucketStep[Long, (Long, Long)](
        arrivals.takeRight(maxDocs * 8), known1, seen1, last1, maxDocs, emit)
    assert(out2.isEmpty, s"replay re-emitted ${out2.size} pairs")
    assert(known2 === known1)
    assert(seen2 === seen1)
    assert(last2 === last1)
  }

  test("dedup state survives a checkpointed query restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-ckpt").toString
    // the memory sink cannot recover from a checkpoint; a file sink is
    // the fault-tolerant path a production ingest would land into
    val outDir = java.nio.file.Files.createTempDirectory("dedup-out").toString
    def start() = dedupExact(snake(src.toDF()), watermark = "2 hours")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      src.addData(doc(1, "the quick brown fox", 0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the same checkpoint: the per-hash state written by
    // the first incarnation must still dedupe — this is the recovery
    // path a production ingest relies on after any executor/driver loss
    val q2 = start()
    try {
      src.addData(
        doc(2, "the quick brown fox", 5), // dup of a PRE-restart doc
        doc(3, "a different text entirely", 6))
      q2.processAllAvailable()
      val ids = spark.read.parquet(outDir).select("doc_id").collect()
        .map(_.getLong(0)).sorted
      assert(ids === Array(1L, 3L), s"post-restart dedupe broken: ${ids.toSeq}")
    } finally q2.stop()
  }

  test("mixture quota admits the top-q per (lang, window) when the watermark closes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val q = mixtureQuota(snake(src.toDF()), quota = 2,
      windowDur = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("doc_quota")
      .outputMode(OutputMode.Append).start()
    try {
      // 3 en docs + 2 de docs inside window [0, 1h); quality rises
      // with word diversity, so doc 12 (all stopwords) ranks last
      val good = "plenty of reasonable words arranged sensibly here"
      val mid = "some words and the of the padding in the middle"
      val bad = "the a of and to in is on"
      src.addData(
        doc(10, good, 1), doc(11, mid, 2), doc(12, bad, 3),
        doc(20, good, 4, lang = "de"), doc(21, mid, 5, lang = "de"))
      q.processAllAvailable()
      // nothing can be admitted while the window is still open
      assert(spark.table("doc_quota").isEmpty)
      // advance the watermark past the window end → both keys close
      src.addData(doc(99, good, 200))
      q.processAllAvailable()
      val rows = spark.table("doc_quota").collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("docId"),
          r.getAs[Int]("rank")))
      assert(rows.toSet === Set(
        ("en", 10L, 1), ("en", 11L, 2), ("de", 20L, 1), ("de", 21L, 2)))
      // ranks agree with the batch td02 scores on the same texts
      val batch = graft.queries.TextPipeline.scoreQuality(
        Seq((10L, "en", good), (11L, "en", mid), (12L, "en", bad))
          .toDF("doc_id", "lang", "text"))
        .orderBy(org.apache.spark.sql.functions.desc("quality_score"))
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      assert(batch.take(2) === Seq(10L, 11L))
      // re-scoring already-scored output is idempotent, not ambiguous
      // (the piiGate discipline): chaining the streaming quality
      // operators must never stack duplicate derived columns
      val scored = graft.queries.TextPipeline.scoreQuality(
        Seq((10L, "en", good)).toDF("doc_id", "lang", "text"))
      val rescored = graft.queries.TextPipeline.scoreQuality(scored)
      assert(rescored.columns.toSeq.sorted === scored.columns.toSeq.sorted)
      assert(rescored.select("doc_id", "quality_score").collect().toSeq
        === scored.select("doc_id", "quality_score").collect().toSeq)
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

  test("streaming LM gate agrees bit-for-bit with batch td32 doc scores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.table(spark, dir, "documents")
    // the stored LM: trained ONCE on the standing corpus (batch)
    val lmNll = graft.queries.TextPipeline.lmNllTable(all).cache()
    val expect = graft.queries.TextPipeline.lmDocScores(all)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("bpb"))).toMap
    val corpus = all.select("doc_id", "lang", "source", "text").collect()
      .sortBy(_.getAs[Long]("doc_id"))
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"),
        ts(r.getAs[Long]("doc_id"))))
    val maxBpb = 40960L // 10 bits/bigram in q12 — an arbitrary gate bar
    val src = MemoryStream[Doc]
    val q = lmScoreGate(snake(src.toDF()), lmNll, maxBpb)
      .writeStream.format("memory").queryName("lm_gate")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(corpus.toSeq)
      q.processAllAvailable()
      src.addData(doc(999999, "zzqx unseen wholly novel phrase", 100000))
      q.processAllAvailable()
      // close 999999's own window so its OOV row emits too
      src.addData(doc(999998, "window closer", 200000))
      q.processAllAvailable()
      val rows = spark.table("lm_gate").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("bpb")),
            r.getAs[Boolean]("admitted"))).toMap
      val closers = Set(999999L, 999998L)
      val got = rows.view.filterKeys(!closers(_)).toMap
        .map { case (k, v) => k -> v._1 }
      assert(got === expect)
      assert(expect.nonEmpty)
      // the admitted verdict is the bpb threshold, verbatim
      rows.foreach { case (id, ((_, bpb), adm)) =>
        assert(adm === (bpb <= maxBpb), s"doc $id verdict")
      }
      // the OOV backoff: a wholly-novel doc is charged the
      // quantization-floor maximum on every bigram and refused
      val ((_, novelBpb), novelAdm) = rows(999999L)
      assert(novelBpb === graft.queries.TextPipeline.LmNllMax)
      assert(!novelAdm)
    } finally q.stop()
  }

  test("streaming quality-bucket gate agrees with batch td33 assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.table(spark, dir, "documents")
    // the standing corpus's stored frames, trained ONCE (batch): the
    // LM table and the per-source tercile cuts
    val lmNll = graft.queries.TextPipeline.lmNllTable(all).cache()
    val perDoc = graft.queries.TextPipeline.lmDocScores(all)
    val cuts = graft.queries.TextPipeline.lmTercileCuts(perDoc).cache()
    // batch truth: each doc's bucket under qualityMixtureOf's exact
    // assign rule (per-doc frame joined to cuts, qmBucket)
    val expect = perDoc
      .join(cuts, Seq("source"))
      .select(col("doc_id"),
        graft.queries.TextPipeline.qmBucket.as("bucket"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
    assert(expect.nonEmpty)
    assert(expect.values.toSet.subsetOf(Set("head", "middle", "tail")))
    val corpus = all.select("doc_id", "lang", "source", "text").collect()
      .sortBy(_.getAs[Long]("doc_id"))
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"),
        ts(r.getAs[Long]("doc_id"))))
    val src = MemoryStream[Doc]
    val q = qualityBucketGate(snake(src.toDF()), lmNll, cuts)
      .writeStream.format("memory").queryName("qm_gate")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(corpus.toSeq)
      q.processAllAvailable()
      // a source the stored cuts have never seen: NULL cuts must
      // fall through to tail (conservative lowest-weight admission)
      src.addData(Doc(999999L, "en", "srcNEW",
        "wholly novel provenance text body", ts(100000)))
      q.processAllAvailable()
      src.addData(doc(999998, "window closer", 200000))
      q.processAllAvailable()
      val rows = spark.table("qm_gate").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
        .toMap
      val closers = Set(999999L, 999998L)
      assert(rows.view.filterKeys(!closers(_)).toMap === expect,
        "online bucket must equal the batch td33 assignment per doc")
      assert(rows(999999L) === "tail",
        "unknown source must land tail, not crash or drop")
    } finally q.stop()
  }

  test("streaming decontamination agrees with the batch td12 pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.table(spark, dir, "documents")
    val evalSh = graft.pipeline.TextPrep
      .shingles(all.where($"source" === "src0"))
      .select("shingle").distinct().cache()
    val nonEval = all.where($"source" =!= "src0")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"),
        ts(r.getAs[Long]("doc_id"))))
    val src = MemoryStream[Doc]
    val q = decontaminate(snake(src.toDF()), evalSh)
      .writeStream.format("memory").queryName("stream_decon")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(nonEval.toSeq)
      q.processAllAvailable()
      src.addData(doc(999999, "far future closer doc", 100000))
      q.processAllAvailable()
      val got = spark.table("stream_decon").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("n_shared_shingles")).toMap
      val want = graft.queries.TextPipeline.decontaminate(spark, dir)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("n_shared_shingles")).toMap
      assert(got === want)
      assert(want.nonEmpty) // the agreement is not vacuous
    } finally q.stop()
  }

  test("decontamination counts DISTINCT eval shingles even from a raw per-doc index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.table(spark, dir, "documents")
    // the NATURAL per-doc eval index — one row per (eval doc, shingle),
    // so shingles shared across eval docs appear with multiplicity;
    // the operator must distinct internally like batch td12 or it
    // inflates n_shared_shingles by that multiplicity
    val evalRaw = graft.pipeline.TextPrep
      .shingles(all.where($"source" === "src0")).select("shingle")
    val nonEval = all.where($"source" =!= "src0")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"),
        ts(r.getAs[Long]("doc_id"))))
    val src = MemoryStream[Doc]
    val q = decontaminate(snake(src.toDF()), evalRaw)
      .writeStream.format("memory").queryName("stream_decon_raw")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(nonEval.toSeq)
      q.processAllAvailable()
      src.addData(doc(999999, "far future closer doc", 100000))
      q.processAllAvailable()
      val got = spark.table("stream_decon_raw").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("n_shared_shingles")).toMap
      val want = graft.queries.TextPipeline.decontaminate(spark, dir)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("n_shared_shingles")).toMap
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("streaming trending tokens: sharded union equals the exact top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val q = trendingTokens(snake(src.toDF()), k = 3, capacity = 64,
        shards = 4, windowDur = "60 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("trend")
      .outputMode(OutputMode.Append).start()
    val w0 = Seq(
      (1L, "alpha alpha beta gamma", 10L),
      (2L, "alpha beta beta delta", 20L),
      (3L, "alpha gamma epsilon zeta", 5L)) // reordered inside the wm
    val w1 = Seq((4L, "omega omega omega psi chi", 70L))
    try {
      src.addData(w0.take(2).map { case (i, t, m) => doc(i, t, m) }: _*)
      q.processAllAvailable()
      src.addData((w0.drop(2) ++ w1).map { case (i, t, m) => doc(i, t, m) }: _*)
      q.processAllAvailable()
      // push the watermark past both window ends (120' + 30' wm)
      src.addData(doc(99, "closer", 200))
      q.processAllAvailable()
      val rows = spark.table("trend").as[TrendingToken].collect()
      assert(rows.forall(_.exact), s"evicting shard in: ${rows.toSeq}")
      // window() aligns to epoch-hour boundaries (not the test's ts
      // base); both doc groups still land in consecutive distinct
      // hours, so identify windows by sorted start
      val starts = rows.map(_.windowStart.getTime).distinct.sorted
      assert(starts.length === 2, s"windows: ${rows.toSeq}")
      def expTop3(docs: Seq[(Long, String, Long)]) = docs
        .flatMap(_._2.split(" ", -1))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(3)
      def gotTop3(startMs: Long) = rows.toSeq
        .filter(_.windowStart.getTime == startMs)
        .map(r => (r.token, r.cnt))
        .sortBy { case (t, c) => (-c, t) }.take(3)
      assert(gotTop3(starts(0)) === expTop3(w0))
      assert(gotTop3(starts(1)) === expTop3(w1))
    } finally q.stop()
  }

  test("trending tokens reports exact=false when a shard sketch evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    // capacity 1 and a single shard: "a a b" must evict (b annihilates
    // one a) — the report must SAY its counts are uncertified
    val q = trendingTokens(snake(src.toDF()), k = 2, capacity = 1,
        shards = 1, windowDur = "60 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("trend_evict")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(doc(1, "a a b", 10))
      q.processAllAvailable()
      src.addData(doc(99, "closer", 200))
      q.processAllAvailable()
      // only doc 1's window has closed (the closer's never does)
      val rows = spark.table("trend_evict").as[TrendingToken].collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => !r.exact), s"claimed exact: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming pii gate tags fold to the batch td31 report exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the PipelineSpec planted corpus, streamed across two batches
    // and two sources-per-batch so the fold genuinely crosses batch
    // boundaries (src order: A A B | B C C D)
    val planted = Seq(
      (1L, "srcA", "contact alice.smith@example.com or bob+spam@mail.co today"),
      (2L, "srcA", "call 555-123-4567 now"),
      (3L, "srcB", "server 192.168.1.254 owner ssn 123-45-6789"),
      (4L, "srcB", "perfectly clean text with no identifiers"),
      (5L, "srcC", "nothing to see here"),
      (6L, "srcC", "still nothing"),
      (7L, "srcD", "mail carol@startup.technology or dev@ngo.international"))
    val src = MemoryStream[Doc]
    val q = DocStreams.piiGate(snake(src.toDF()))
      .writeStream.format("memory").queryName("pii_gate")
      .outputMode(OutputMode.Append).start()
    try {
      val docs = planted.map { case (i, s, t) =>
        Doc(i, "en", s, t, ts(i)) }
      src.addData(docs.take(3): _*)
      q.processAllAvailable()
      src.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val tagged = spark.table("pii_gate")
      // the gate's scale contract IS its statelessness: no state
      // store operator anywhere in the streaming plan (a watermark or
      // dedup sneaking in would silently add per-key state at 100 TB)
      assert(q.lastProgress.stateOperators.isEmpty,
        s"pii gate must be stateless: ${q.lastProgress.stateOperators.toSeq}")
      // per-doc: exactly one emitted row per arriving doc, with the
      // doc identity intact (the gate is a pass-through projection)
      assert(tagged.count() === planted.size.toLong)
      val flagged = tagged.where(col("pii_any")).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(flagged === Array(1L, 2L, 3L, 7L))
      // the batch-exact contract: folding the streamed tags with the
      // SAME report aggregation reproduces batch td31 cell-for-cell
      val streamed = graft.queries.TextPipeline
        .piiReportFromTags(tagged).collect().map(_.toSeq)
      val batch = graft.queries.TextPipeline
        .piiScanDf(planted.toDF("doc_id", "source", "text"))
        .collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq)
      // re-gating already-tagged output is idempotent, not ambiguous:
      // the tag stage drops and re-derives its own columns instead of
      // stacking duplicate c_*/pii_any names that would break the
      // report fold with AMBIGUOUS_REFERENCE
      val regated = DocStreams.piiGate(tagged)
      assert(regated.columns.toSeq === tagged.columns.toSeq)
      assert(graft.queries.TextPipeline.piiReportFromTags(regated)
        .collect().map(_.toSeq).toSeq === streamed.toSeq)
    } finally q.stop()
  }
}
