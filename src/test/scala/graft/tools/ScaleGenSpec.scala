package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the scale-evidence generator at factor 2 over
  * sf0.001: the scaled data must be "the same corpus, only bigger" —
  * FK fan-outs, token/shingle structure and embedding geometry all
  * preserved per replica — or the measured scaling ratios in
  * BASELINE.md would not be evidence about the ENGINE. */
class ScaleGenSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sf2x").toString
    ScaleGen.run(spark, src, dir, 2)
    dir
  }

  private def s(name: String) = spark.read.parquet(s"$src/$name.parquet")
  private def o(name: String) = spark.read.parquet(s"$out/$name.parquet")

  test("dims fixed; fact rows and key uniqueness scale exactly") {
    assert(o("region").count() === s("region").count())
    assert(o("nation").count() === s("nation").count())
    for (t <- Seq("customer", "orders", "lineitem", "events",
        "documents", "embeddings"))
      assert(o(t).count() === 2 * s(t).count(), t)
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "documents" -> "doc_id", "embeddings" -> "vec_id"))
      assert(o(t).select(k).distinct().count() === o(t).count(), s"$t.$k")
  }

  test("FK joins scale exactly: no orphans, fan-out preserved") {
    val orphans = o("orders").join(o("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans === 0L)
    val srcJoin = s("lineitem").join(s("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val outJoin = o("lineitem").join(o("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(outJoin === 2 * srcJoin)
  }

  test("documents: token counts preserved, replicas shingle-disjoint") {
    val srcTok = s("documents")
      .agg(sum(size(split(col("text"), " ")))).first().getLong(0)
    val outTok = o("documents")
      .agg(sum(size(split(col("text"), " ")))).first().getLong(0)
    assert(outTok === 2 * srcTok, "replica tagging must not change token counts")
    // replica 1 of doc 0 is doc 0's tokens, each prefixed zq1
    val kDoc = s("documents").agg(max(col("doc_id"))).first().getLong(0) + 1
    val t0 = o("documents").where(col("doc_id") === 0).select("text")
      .first().getString(0)
    val t1 = o("documents").where(col("doc_id") === kDoc).select("text")
      .first().getString(0)
    assert(t1 === t0.split(" ").map("zq1" + _).mkString(" "))
    // hence zero shared word 3-grams across the replica boundary
    val sh = (c: String) => expr(
      s"explode(array_distinct(transform(sequence(1, size(split($c, ' ')) - 2), " +
        s"i -> concat(element_at(split($c, ' '), i), ' ', " +
        s"element_at(split($c, ' '), i + 1), ' ', " +
        s"element_at(split($c, ' '), i + 2)))))")
    val a = o("documents").where(col("doc_id") < kDoc).select(sh("text").as("g"))
    val b = o("documents").where(col("doc_id") >= kDoc).select(sh("text").as("g"))
    assert(a.join(b, "g").count() === 0L)
  }

  test("embeddings: rotation is a pure permutation of each vector") {
    val kVec = s("embeddings").agg(max(col("vec_id"))).first().getLong(0) + 1
    // rotation permutes elements, so the sorted element multiset must
    // match bit-exactly (float equality is exact here — same values,
    // different positions); norms/cosines within a replica follow
    val base = o("embeddings").where(col("vec_id") < kVec)
      .select(col("vec_id"), sort_array(col("embedding")).as("m"))
    val rot = o("embeddings").where(col("vec_id") >= kVec)
      .select((col("vec_id") - lit(kVec)).as("vec_id"),
        sort_array(col("embedding")).as("m2"))
    val joined = base.join(rot, "vec_id")
    assert(joined.count() === kVec)
    assert(joined.where(col("m") =!= col("m2")).count() === 0L)
    // and it is a genuine rotation, not identity: vectors moved
    val moved = o("embeddings").where(col("vec_id") >= kVec)
      .select((col("vec_id") - lit(kVec)).as("vec_id"),
        col("embedding").as("e2"))
      .join(o("embeddings").where(col("vec_id") < kVec), "vec_id")
      .where(col("embedding") =!= col("e2")).count()
    assert(moved === kVec)
  }

  test("embeddings: signed rotation survives factor > dim without cloning replicas") {
    // factor 66 exercises r ≥ 64: the bare `rotate by r` slice
    // underflowed there (factor-100 sf10 generation died on it), and
    // `r mod dim` alone would make replica 65 clone replica 1. The
    // signed rotation gives 65 the same permutation as 1 plus a
    // one-coordinate negation.
    val dir = java.nio.file.Files.createTempDirectory("graft_sf66x").toString
    ScaleGen.run(spark, src, dir, 66)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = s("embeddings").count()
    assert(e.count() === 66 * n)
    val kVec = s("embeddings").agg(max(col("vec_id"))).first().getLong(0) + 1
    val v1 = e.where(col("vec_id") === kVec)
      .select("embedding").first().getSeq[Float](0)
    val v65 = e.where(col("vec_id") === 65L * kVec)
      .select("embedding").first().getSeq[Float](0)
    assert(v1.map(x => math.abs(x.toDouble)) ===
      v65.map(x => math.abs(x.toDouble)),
      "same rotation ⇒ same magnitudes per position")
    assert(v65.head === -v1.head && v65.tail === v1.tail,
      "replica 65 = replica 1 with exactly the first coordinate negated")
  }
}
