package graft.pipeline

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {

  private def mediaFixture = {
    import spark.implicits._
    // deterministic synthetic binaries (no media libs in this env)
    val rows = (0L until 20L).map { i =>
      val bytes = Array.tabulate(1000 + i.toInt * 37)(j => ((i * 131 + j * 7) % 251).toByte)
      val kind = if (i % 3 == 0) "video" else if (i % 3 == 1) "image" else "audio"
      MediaFile(i, kind, bytes, Map("source" -> s"cam$i"))
    }
    spark.createDataset(rows)
  }

  test("decode is deterministic and dimension-shaped") {
    val d1 = decode(spread(mediaFixture, 4)).collect().sortBy(_.mediaId)
    val d2 = decode(spread(mediaFixture, 2)).collect().sortBy(_.mediaId)
    assert(d1.toSeq === d2.toSeq) // partitioning must not change results
    assert(d1.forall(d => d.width >= 160 && d.height >= 120 && d.channels === 3))
    assert(d1.map(_.mediaId).toSeq === (0L until 20L))
  }

  test("features: histogram sums to 1, entropy within [0,4] bits") {
    val f = features(mediaFixture).collect()
    assert(f.length === 20)
    f.foreach { r =>
      assert(math.abs(r.histogram.sum - 1.0) < 1e-9)
      assert(r.entropyBits >= 0.0 && r.entropyBits <= 4.0 + 1e-9)
      assert(r.histogram.length === 16)
    }
  }

  test("resize preserves aspect ratio, bounds the max side, shrinks bytes") {
    val decoded = decode(mediaFixture).collect().map(d => d.mediaId -> d).toMap
    val resized = resize(mediaFixture, maxSide = 256).collect()
    assert(resized.length === 20)
    resized.foreach { r =>
      val d = decoded(r.mediaId)
      assert(math.max(r.width, r.height) <= 256)
      val origRatio = d.width.toDouble / d.height
      val newRatio = r.width.toDouble / r.height
      assert(math.abs(origRatio - newRatio) / origRatio < 0.05)
      assert(r.bytes.length <= (1000 + r.mediaId.toInt * 37))
    }
    // deterministic across partitionings
    val again = resize(spread(mediaFixture, 2), maxSide = 256).collect()
      .sortBy(_.mediaId)
    assert(resized.sortBy(_.mediaId).map(_.bytes.toSeq).toSeq
      === again.map(_.bytes.toSeq).toSeq)
  }

  test("frame sampling slices only videos, evenly spaced") {
    val frames = sampleFrames(mediaFixture, nFrames = 4, frameBytes = 100).collect()
    val videos = mediaFixture.collect().filter(_.kind == "video")
    assert(frames.length === videos.length * 4)
    frames.groupBy(_.mediaId).foreach { case (_, fs) =>
      assert(fs.map(_.frameIdx).sorted.toSeq === Seq(0, 1, 2, 3))
      assert(fs.forall(_.bytes.length <= 100))
      val offs = fs.sortBy(_.frameIdx).map(_.offset)
      assert(offs === offs.sorted)
    }
  }

  test("describe joins decode + features without losing rows") {
    val out = describe(spark, mediaFixture, partitions = 4)
    assert(out.count() === 20)
    assert(out.columns.toSet === Set(
      "mediaId", "kind", "width", "height", "channels", "nBytes",
      "entropyBits", "histogram"))
  }
}
