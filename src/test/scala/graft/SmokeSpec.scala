package graft

/** Driver t1 analogue: flagship entry on sf0.001 must return rows. */
class SmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows on the smallest scale factor") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }
}
