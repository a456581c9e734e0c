package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property for [[TextPipeline.connectedComponents]]:
  * random undirected edge lists (including empty lists, self-loops,
  * duplicate and reversed edges) against an in-memory union-find
  * oracle. The unit suite covers a planted chain and pair-graph
  * consistency; this closes the gap on arbitrary topologies, with
  * ScalaCheck shrinking a failure to a minimal edge list. */
object ComponentsProperties extends Properties("connectedComponents") {

  // Each case runs a multi-round Spark job; cap the case count and
  // graph size so the property stays seconds-scale in the suite.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  /** Up to 40 edges over a deliberately small id space (collisions
    * make interesting topologies: multi-component, cycles, diamonds). */
  private val edges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    maxId <- Gen.choose(1L, 24L)
    es <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, maxId), Gen.choose(0L, maxId)))
  } yield es

  /** Oracle: union-find where the larger root is always attached under
    * the smaller, so each tree's root IS the component's min node id —
    * the same labeling contract as connectedComponents. */
  private def unionFindRoots(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Both regimes of the adaptive switch run against the oracle on
    * every generated graph: driverMaxEdges = 0 forces the distributed
    * Pregel path, the default takes the driver union-find — the
    * equivalence the size-based regime choice depends on. */
  property("labels equal a union-find oracle on random graphs") =
    forAll(edges) { es =>
      if (sys.env.contains("CC_DEBUG")) println(s"[ccprop] es=$es")
      val spark = graft.SparkSpec.session
      import spark.implicits._
      val (labels, rounds) =
        TextPipeline.connectedComponents(
          es.toDF("doc_a", "doc_b"), driverMaxEdges = 0)
      val got = labels.collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("root")).toMap
      val (driverLabels, driverRounds) =
        TextPipeline.connectedComponents(es.toDF("doc_a", "doc_b"))
      val gotDriver = driverLabels.collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("root")).toMap
      val want = unionFindRoots(es)
      Prop.all(
        Prop(got == want) :| s"distributed labels mismatch: got=$got want=$want",
        Prop(gotDriver == want) :| s"driver labels mismatch: got=$gotDriver want=$want",
        Prop(rounds <= 50) :| s"did not converge (rounds=$rounds)",
        Prop(driverRounds == 0) :| "driver path must not iterate")
    }
}
