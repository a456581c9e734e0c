package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property for [[TextPipeline.sourceDriftOf]] (td24): the
  * operator computes the full-vocabulary L1 drift through a folding
  * identity (present-token deviations plus the absent-token expected
  * mass via one global scalar) — this property checks it against a
  * DIRECT sum over every (source, vocabulary-token) pair on random
  * corpora, where duplicate tokens, single-source corpora and
  * sources with disjoint vocabularies all occur naturally. The unit
  * suite covers the real testdata; shrinking here pins any identity
  * bug to a minimal corpus. */
object DriftProperties extends Properties("sourceDrift") {

  // Each case is a multi-join Spark job; keep the corpus small and
  // the case count bounded so the property stays seconds-scale.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  /** 1-12 docs over ≤3 sources and an 8-token vocabulary — small
    * enough that per-source vocabularies overlap AND miss each other. */
  private val corpus: Gen[List[(String, String)]] = for {
    nDocs <- Gen.choose(1, 12)
    docs <- Gen.listOfN(nDocs, for {
      src <- Gen.oneOf("s0", "s1", "s2")
      nTok <- Gen.choose(1, 10)
      toks <- Gen.listOfN(nTok, Gen.oneOf(
        "a", "b", "c", "d", "e", "f", "g", "h"))
    } yield (src, toks.mkString(" ")))
  } yield docs

  property("drift equals a direct full-vocabulary L1 on random corpora") =
    forAll(corpus) { docsList =>
      val spark = graft.SparkSpec.session
      import spark.implicits._
      val st = docsList
        .flatMap { case (src, text) => text.split(" ", -1).map((src, _)) }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val ts = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val ct = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val g = ct.values.sum
      val expPpm = ct.view.mapValues(c => c * 1000000L / g).toMap
      val got = TextPipeline.sourceDriftOf(docsList.toDF("source", "text"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getLong(5)))
      val checks = got.toSeq.map { case (src, nTok, nDist, drift, top, topDev) =>
        val devs = ct.keys.map { t =>
          val obs = st.getOrElse((src, t), 0L) * 1000000L / ts(src)
          t -> math.abs(obs - expPpm(t))
        }.toMap
        val present = st.keys.filter(_._1 == src).map(_._2).toSet
        val wantTop = present.map(t => (t, devs(t)))
          .minBy { case (t, d) => (-d, t) }
        Prop.all(
          Prop(nTok == ts(src)) :| s"$src n_tokens",
          Prop(nDist == present.size.toLong) :| s"$src n_distinct",
          Prop(drift == devs.values.sum) :| s"$src drift: got $drift want ${devs.values.sum}",
          Prop((top, topDev) == wantTop) :| s"$src top: got ($top,$topDev) want $wantTop")
      }
      Prop.all(
        (Prop(got.map(_._1).toSeq == ts.keys.toSeq.sorted)
          :| "one row per source, source-ordered") +: checks: _*)
    }
}
