package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the mergeable [[MisraGries]] summary:
  * random streams chunked and merged pairwise (exercising both the
  * per-partition reduce path and the cross-partition merge-trim
  * path) against exact in-memory counts. Pure JVM — no Spark — so
  * the case count can stay high. */
object MisraGriesProperties extends Properties("MisraGries") {

  /** Zipf-ish streams over a small alphabet: `Gen.frequency` skews
    * toward low token ids so some tokens genuinely clear the
    * heavy-hitter bound while a tail fights for counters. */
  private val streams: Gen[List[String]] = for {
    n <- Gen.choose(0, 500)
    alpha <- Gen.choose(1, 50)
    s <- Gen.listOfN(n,
      Gen.frequency(
        (8, Gen.choose(0, math.max(1, alpha / 8))),
        (2, Gen.choose(0, alpha))).map(i => s"t$i"))
  } yield s

  private val caps: Gen[Int] = Gen.choose(1, 24)
  private val chunkSizes: Gen[Int] = Gen.choose(1, 64)

  property("chunked+merged summary obeys the MG bounds") =
    forAll(streams, caps, chunkSizes) { (s, cap, chunk) =>
      val mg = new MisraGries(cap)
      val parts = s.grouped(chunk).toList
        .map(c => c.foldLeft(mg.zero)(mg.reduce))
      val merged = mg.finish(parts.foldLeft(mg.zero)(mg.merge))
      val truth = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = s.size.toLong
      Prop.all(
        Prop(merged.total == n) :| s"total ${merged.total} != $n",
        Prop(merged.counts.size <= cap) :|
          s"size ${merged.counts.size} > capacity $cap",
        // every estimate undercounts, by at most n/(cap+1)
        Prop(merged.counts.forall { case (k, est) =>
          val t = truth.getOrElse(k, 0L)
          est <= t && (t - est) * (cap + 1L) <= n
        }) :| s"estimate outside [true - n/(cap+1), true]: $merged vs $truth",
        // every true heavy hitter survives
        Prop(truth.forall { case (k, t) =>
          t * (cap + 1L) <= n || merged.counts.contains(k)
        }) :| s"lost a heavy hitter: $merged vs $truth",
        // exactness certificate: counts summing to total ⟺ no decrement,
        // and then every estimate is the true count
        Prop(merged.counts.valuesIterator.sum != n ||
          merged.counts.forall { case (k, est) => truth(k) == est }) :|
          s"claimed-exact summary is not exact: $merged vs $truth")
    }
}
