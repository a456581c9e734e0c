package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** The planted-dup mechanisms [[MultimodalScale]]'s runtime
  * certification leans on, isolated per codec — a generator change
  * that silently breaks a collision (or un-breaks a junk blob) should
  * fail HERE, not as an opaque clusters_intact miss in a 10-minute
  * scale run. */
class MultimodalScaleSpec extends AnyFunSuite {

  test("corpus rows are a pure function of (id, nDocs)") {
    for (id <- Seq(3L, 7L, 1502L, 1507L)) {
      val a = MultimodalScale.row(id, 5000)
      val b = MultimodalScale.row(id, 5000)
      assert(a.text === b.text)
      assert(Option(a.image).map(_.toSeq) === Option(b.image).map(_.toSeq))
      assert(Option(a.audio).map(_.toSeq) === Option(b.audio).map(_.toSeq))
      assert(Option(a.video).map(_.toSeq) === Option(b.video).map(_.toSeq))
    }
  }

  test("even cluster: exact text dup + resolution-invariant image dHash") {
    // ids 0,1,2 form cluster k=0 (even → text+image conflict shape)
    val Seq(base, r1, r2) =
      Seq(0L, 1L, 2L).map(MultimodalScale.row(_, 5000))
    assert(base.text === r1.text, "base's text must dup role1 exactly")
    assert(r2.text !== base.text)
    val hBase = Multimodal.dHash64(base.image)
    val hR2 = Multimodal.dHash64(r2.image)
    assert(hBase.isDefined && hBase === hR2,
      "half-resolution macro-cell PNG must land the identical dHash")
    assert(r1.image == null)
  }

  test("odd cluster: byte-identical audio + resize-tolerant video vHash") {
    // ids 3,4,5 form cluster k=1 (odd → audio+video conflict shape)
    val Seq(base, r1, r2) =
      Seq(3L, 4L, 5L).map(MultimodalScale.row(_, 5000))
    assert(base.audio.toSeq === r1.audio.toSeq,
      "role1's audio is a byte-exact copy — aHash equality guaranteed")
    assert(Multimodal.aHash64(base.audio).isDefined)
    val vBase = Multimodal.vHash64(base.video)
    val vR2 = Multimodal.vHash64(r2.video)
    assert(vBase.isDefined && vR2.isDefined)
    val ham = java.lang.Long.bitCount(vBase.get ^ vR2.get)
    assert(ham <= graft.queries.TextPipeline.MaxHamming,
      s"half-resolution MJPEG must stay within the banding bar, got $ham")
  }

  test("unique docs decode; junk blobs do not") {
    val n = 50000L
    // 3K prefix at n=50000 is 1500; pick unique ids past it
    val img = MultimodalScale.row(1502, n) // even → has image
    assert(Multimodal.dHash64(img.image).isDefined)
    val junkImg = MultimodalScale.row(97 * 20, n) // %97==0 and even
    assert(junkImg.doc_id >= 1500 && junkImg.image != null)
    assert(Multimodal.dHash64(junkImg.image).isEmpty,
      "planted junk must fail image decode")
    assert(Multimodal.aHash64(MultimodalScale.junkBytes(12)).isEmpty)
    assert(Multimodal.vHash64(MultimodalScale.junkBytes(12)).isEmpty)
  }

  test("cluster accounting: expected keep = n - 2K") {
    assert(MultimodalScale.clusterCount(50000) === 500)
    assert(MultimodalScale.clusterCount(5000) === 50)
  }
}
