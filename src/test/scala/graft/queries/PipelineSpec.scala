package graft.queries

import graft.SparkSpec

/** Semantic checks for the training-data pipeline operators on the
  * sf0.001 testdata (500 docs with planted ~0.99-Jaccard near-dup
  * pairs; 500 64-dim embeddings). The t2 oracle hash-checks exact
  * values; these assert the ALGORITHMS behave (dedup recall, ANN
  * shape, signature agreement across methods).
  */
class PipelineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val jaccardPairs =
    TextPipeline.dedupJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("jaccard dedup finds the planted near-dup pairs") {
    assert(jaccardPairs.nonEmpty)
  }

  test("minhash LSH recalls the true high-jaccard pairs") {
    val mh = TextPipeline.dedupMinHash(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // At jaccard ~0.99, P(missing all 4 bands) ≈ (1-0.99^4)^4 ≈ 2e-6:
    // every planted pair must surface as an LSH candidate.
    assert(jaccardPairs.subsetOf(mh), s"missed: ${jaccardPairs -- mh}")
  }

  test("simhash finds the planted pairs within hamming 7") {
    val sh = TextPipeline.dedupSimHash(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jaccardPairs.subsetOf(sh), s"missed: ${jaccardPairs -- sh}")
  }

  test("dedup components form a consistent keep-list over the pair graph") {
    val comp = TextPipeline.dedupComponents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Boolean]("is_duplicate"))).toMap
    // every near-dup pair must land in the same component
    jaccardPairs.foreach { case (a, b) =>
      assert(comp(a)._1 === comp(b)._1, s"pair ($a,$b) split across components")
    }
    // the root is the smallest member and the only non-duplicate
    comp.groupBy(_._2._1).foreach { case (root, members) =>
      assert(members.keys.min === root)
      assert(members.count(!_._2._2) === 1)
      assert(!comp(root)._2)
    }
  }

  test("exact dedup reports a full-corpus summary") {
    val r = TextPipeline.dedupExact(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_docs") === 500L)
    assert(r.getAs[Long]("n_distinct_texts") <= 500L)
  }

  test("brute-force ANN returns exactly top-k per query, cos in [-1,1]") {
    val rows = VectorPipeline.annBrute(spark, dir).collect()
    assert(rows.length === 30) // 10 queries × k=3
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0))
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.forall { case (_, rs) =>
      rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 3L)
    })
  }

  test("LSH ANN results are a subset-ranking consistent with brute force") {
    val brute = VectorPipeline.annBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"))).toSet
    val lsh = VectorPipeline.annLsh(spark, dir).collect()
    // Every LSH hit shares the query's bucket; its cosine must equal
    // the exact cosine (same fold), so any (q,n) pair present in both
    // must carry an identical score.
    val bruteMap = brute.map { case (q, n, c) => (q, n) -> c }.toMap
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bruteMap.get(key).foreach(c => assert(c === r.getAs[Double]("cos")))
    }
  }

  test("IVF ANN returns k ranked candidates per query with exact scores") {
    val rows = VectorPipeline.annIvf(spark, dir).collect()
    assert(rows.length === 30) // 10 queries × k=3 (lists ≥ k members here)
    val brute = VectorPipeline.annBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos")).toMap
    // scores for pairs that also appear in brute-force must be identical
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(c => assert(c === r.getAs[Double]("cos")))
    }
  }

  test("LSH near-dup pairs are a subset of brute force with identical scores") {
    val brute = VectorPipeline.nearDup(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos")).toMap
    val lsh = VectorPipeline.nearDupLsh(spark, dir).collect()
    assert(lsh.nonEmpty, "banded LSH must surface near-dup pairs")
    // Banding only prunes candidates — every surviving pair must exist
    // in the exact all-pairs result with a bit-identical cosine.
    lsh.foreach { r =>
      val key = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(brute.contains(key), s"LSH emitted non-near-dup pair $key")
      assert(brute(key) === r.getAs[Double]("cos"))
    }
    assert(lsh.length <= brute.size)
    // recall floor: hashed (genuinely independent) planes measure ~0.8
    // at the weak 0.4 boundary; a regression to correlated planes
    // (e.g. the affine formula's period-11 collapse) drops below this
    assert(lsh.length >= (0.6 * brute.size).toInt,
      s"LSH recall too low: ${lsh.length}/${brute.size}")
  }

  test("jaccard df-cap drops hot shingles from the candidate join") {
    // cap 0 drops every shingle → no candidates at all
    assert(TextPipeline.dedupJaccard(spark, dir, dfCap = 0L).isEmpty)
    // a cap far above the corpus df ceiling changes nothing vs default
    val capped = TextPipeline.dedupJaccard(spark, dir).collect().toSeq
    val loose =
      TextPipeline.dedupJaccard(spark, dir, dfCap = Long.MaxValue).collect().toSeq
    assert(capped === loose)
  }

  test("language-ID confusion matrix covers every document") {
    val total = TextPipeline.langId(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).collect()(0).getLong(0)
    assert(total === 500L)
  }

  test("fingerprints are stable across invocations") {
    val a = TextPipeline.fingerprint(spark, dir).collect().toSeq
    val b = TextPipeline.fingerprint(spark, dir).collect().toSeq
    assert(a === b)
  }
}
