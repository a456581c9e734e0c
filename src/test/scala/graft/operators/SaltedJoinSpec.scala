package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join: result-identical to the plain join, hot key spread
  * across partitions, deterministic across repartitionings. */
class SaltedJoinSpec extends SparkSpec {

  // one pathological key (0) carrying half the probe side
  private lazy val probe = {
    import spark.implicits._
    (0 until 20000).map { i =>
      val k = if (i % 2 == 0) 0L else (i % 97).toLong
      (i.toLong, k, s"p$i")
    }.toDF("row_id", "k", "payload")
  }
  private lazy val build = {
    import spark.implicits._
    (0 until 97).map(k => (k.toLong, s"b$k")).toDF("k", "battr")
  }

  test("salted join equals the plain join exactly") {
    val plain = probe.join(build, Seq("k"))
      .select("row_id", "k", "payload", "battr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(identity[(Long, Long, String, String)])
    val salted = SaltedJoin.join(probe, build, Seq("k"), salts = 8)
      .select("row_id", "k", "payload", "battr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(identity[(Long, Long, String, String)])
    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("the hot key spreads across all salt buckets") {
    val salts = 8
    // reproduce the operator's salt assignment and count distinct
    // salts for the hot key: every bucket must receive a share
    val saltCounts = probe.where(col("k") === 0L)
      .withColumn("__salt",
        pmod(hash(col("row_id"), col("k"), col("payload")), lit(salts)))
      .groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(saltCounts.keySet === (0 until salts).toSet,
      s"hot key must hit all $salts buckets, got ${saltCounts.keySet}")
    // and the spread is balanced enough to matter: no bucket holds
    // more than 2x its fair share
    val fair = saltCounts.values.sum.toDouble / salts
    assert(saltCounts.values.forall(_ < 2 * fair),
      s"salt spread too lopsided: $saltCounts")
  }

  test("explicit saltBy columns and salts=1 degenerate correctly") {
    val plain = probe.join(build, Seq("k")).count()
    // salts=1 is exactly the plain join
    assert(SaltedJoin.join(probe, build, Seq("k"), salts = 1).count() === plain)
    // salting by the stable id column only
    val byId = SaltedJoin.join(probe, build, Seq("k"), salts = 4,
      saltBy = Seq("row_id"))
    assert(byId.count() === plain)
    // deterministic: same result set under a different input layout
    val reshuffled = SaltedJoin.join(probe.repartition(13), build,
      Seq("k"), salts = 4, saltBy = Seq("row_id"))
    assert(reshuffled.count() === plain)
  }

  test("map columns and reserved __salt are handled, not analysis errors") {
    import org.apache.spark.sql.functions._
    val plain = probe.join(build, Seq("k")).count()
    // hash() rejects MapType (SPARK-27619): the row-identity default
    // must skip map columns instead of failing analysis on tables
    // that happen to carry one
    val withMap = probe.withColumn("m",
      map(lit("a"), col("row_id").cast("string")))
    val viaDefault = SaltedJoin.join(withMap, build, Seq("k"), salts = 4)
    assert(viaDefault.count() === plain)
    assert(viaDefault.columns.contains("m"), "map column must survive")
    // hash() rejects maps NESTED in structs/arrays too — the skip
    // must see the whole type tree, not just top-level MapType
    val withNested = probe.withColumn("meta",
      struct(map(lit("a"), lit("b")).as("tags")))
    val viaNested = SaltedJoin.join(withNested, build, Seq("k"), salts = 4)
    assert(viaNested.count() === plain)
    assert(viaNested.columns.contains("meta"))
    // a pre-existing __salt data column must be refused loudly, not
    // silently clobbered and dropped from the result
    val clash = probe.withColumn("__salt", lit(7))
    val e = intercept[IllegalArgumentException] {
      SaltedJoin.join(clash, build, Seq("k"), salts = 4)
    }
    assert(e.getMessage.contains("__salt"))
  }
}
