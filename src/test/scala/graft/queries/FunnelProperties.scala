package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property for [[EventPipeline.funnel]]: random event
  * logs (tie-heavy timestamps, hops straddling the horizon, users
  * missing arbitrary stages) against the brute-force per-user
  * EXISTS semantics computed in memory. The unit suite plants the
  * known edges; this closes the gap on arbitrary interleavings, with
  * shrinking to a minimal failing log. */
object FunnelProperties extends Properties("funnel") {

  // Each case writes a parquet dir and runs three window passes; keep
  // the case count small so the property stays seconds-scale.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val HorizonSec = 86400L

  /** Up to 60 events over few users; timestamps cluster around 0,
    * the horizon boundary, and 2× the horizon so hops regularly land
    * exactly on, just inside, and just outside the window. */
  private val logs: Gen[List[(Long, Long, String)]] = {
    val times = Gen.oneOf(
      Gen.choose(0L, 10L),
      Gen.choose(HorizonSec - 2, HorizonSec + 2),
      Gen.choose(2 * HorizonSec - 2, 2 * HorizonSec + 2),
      Gen.choose(0L, 3 * HorizonSec))
    for {
      n <- Gen.choose(0, 60)
      es <- Gen.listOfN(n, for {
        sec <- times
        user <- Gen.choose(1L, 4L)
        tpe <- Gen.oneOf("view", "click", "purchase", "error")
      } yield (sec, user, tpe))
    } yield es
  }

  /** Brute-force reference: the oracle's correlated-EXISTS semantics
    * verbatim — a click qualifies iff SOME view sits in its lookback
    * window, a purchase converts iff SOME qualified click does. */
  private def ref(es: Seq[(Long, Long, String)])
      : Map[Long, (Long, Option[Long], Option[Long], Long)] = {
    val h = HorizonSec * 1000000L
    es.groupBy(_._2).flatMap { case (u, evs) =>
      def stage(t: String) = evs.filter(_._3 == t).map(_._1 * 1000000L)
      val views = stage("view")
      if (views.isEmpty) None
      else {
        val qc = stage("click").filter(c => views.exists(v => v <= c && v >= c - h))
        val cv = stage("purchase").filter(p => qc.exists(c => c <= p && c >= p - h))
        Some(u -> ((views.min, qc.minOption, cv.minOption, cv.size.toLong)))
      }
    }
  }

  property("matches the brute-force EXISTS semantics on random logs") =
    forAll(logs) { es =>
      val spark = graft.SparkSpec.session
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("funnel-prop").toString
      es.zipWithIndex
        .map { case ((sec, user, tpe), i) => (i.toLong, sec, user, tpe) }
        .toDF("event_id", "sec", "user_id", "event_type")
        .selectExpr("event_id", "sec * 1000000000 AS ts", "user_id",
          "event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = EventPipeline.funnel(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4)))).toMap
      val want = ref(es)
      Prop(got == want) :| s"funnel mismatch: got=$got want=$want"
    }
}
