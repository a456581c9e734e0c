package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * operators (decode → features → resize / frame-sample).
  *
  * The Spark-side plumbing is REAL and tested: schema, hash
  * partitioning of heavy blobs, mapPartitions batch shape, and the
  * byte-level feature computations. The codec itself is a clearly
  * marked STUB (`StubCodec`): this container has no image/audio
  * libraries, so "decode" derives deterministic fake dimensions from
  * the byte stream. Swapping in a real codec is a one-object change;
  * nothing else moves.
  *
  * Scale notes: blobs never pass through a wide shuffle — operators
  * are narrow mapPartitions over the scan, and the only repartition is
  * an explicit `media_id`-hash spread (balances multi-GB media files
  * across executors before CPU-heavy decode). Feature vectors, not
  * pixels, flow into downstream joins/aggregations.
  */
object Multimodal {

  /** A media row: binary payload + typed metadata. */
  final case class MediaFile(
      mediaId: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      meta: Map[String, String])

  /** Decoded media descriptor (dims from the codec; STUBBED here). */
  final case class Decoded(
      mediaId: Long,
      kind: String,
      width: Int,
      height: Int,
      channels: Int,
      nBytes: Long)

  /** Per-media feature row: 16-bin byte histogram (REAL computation),
    * normalized to fractions — the shape a downstream embedding /
    * dedup join would consume. */
  final case class MediaFeatures(
      mediaId: Long,
      nBytes: Long,
      entropyBits: Double,
      histogram: Array[Double])

  /** One sampled video frame (byte slice; REAL slicing, fake codec). */
  final case class Frame(
      mediaId: Long,
      frameIdx: Int,
      offset: Long,
      bytes: Array[Byte])

  /** Codec boundary. Only this object is a stub. */
  trait Codec extends Serializable {
    def dimensions(content: Array[Byte]): (Int, Int, Int)
  }

  /** STUB: deterministic fake decode — dimensions derived from a
    * rolling hash of the first 64 payload bytes. Replace with a real
    * image/audio decoder when the libraries are available; the
    * partitioning / batching around it is production-shaped. */
  object StubCodec extends Codec {
    override def dimensions(content: Array[Byte]): (Int, Int, Int) = {
      var h = 1125899906842597L
      var i = 0
      val n = math.min(content.length, 64)
      while (i < n) { h = 31 * h + content(i); i += 1 }
      val w = 160 + (math.abs(h) % 1920).toInt
      val ht = 120 + (math.abs(h / 7919) % 1080).toInt
      ((w / 8) * 8, (ht / 8) * 8, 3)
    }
  }

  /** Spread heavy blobs evenly before CPU-bound work: hash-partition
    * on mediaId (narrow round-robin would break mapPartitions
    * determinism in tests; hash keeps placement stable). */
  def spread(ds: Dataset[MediaFile], partitions: Int): Dataset[MediaFile] =
    ds.repartition(partitions, col("mediaId"))

  /** Decode batch operator: one codec call per row, per partition. */
  def decode(ds: Dataset[MediaFile], codec: Codec = StubCodec): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, c) = codec.dimensions(m.content)
        Decoded(m.mediaId, m.kind, w, h, c, m.content.length.toLong)
      }
    }
  }

  /** Feature extraction: 16-bin byte histogram + Shannon entropy —
    * real, deterministic byte math (the stand-in for an embedding
    * model's preprocessing stage). */
  def features(ds: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val counts = new Array[Long](16)
        var i = 0
        while (i < m.content.length) {
          counts((m.content(i) & 0xff) >>> 4) += 1
          i += 1
        }
        val n = math.max(1L, m.content.length.toLong)
        val hist = counts.map(_.toDouble / n)
        val entropy = -hist.filter(_ > 0)
          .map(p => p * math.log(p) / math.log(2.0)).sum
        MediaFeatures(m.mediaId, m.content.length.toLong, entropy, hist)
      }
    }
  }

  /** A resized media payload: target dims + the (stub-)resampled bytes. */
  final case class Resized(
      mediaId: Long,
      kind: String,
      width: Int,
      height: Int,
      bytes: Array[Byte])

  /** Resize batch operator: recompute target dimensions preserving
    * aspect ratio and resample the payload. The byte resampling is a
    * deterministic stride subsample standing in for a real scaler
    * (STUB codec boundary); the dimension math, batch shape and
    * output-size bound are the real pipeline contract. */
  def resize(ds: Dataset[MediaFile], maxSide: Int = 256,
      codec: Codec = StubCodec): Dataset[Resized] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, _) = codec.dimensions(m.content)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val (tw, th) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        // deterministic stride subsample proportional to the area ratio
        val keep = math.max(1,
          (m.content.length.toDouble * (tw.toLong * th) / (w.toLong * h)).toInt)
        val stride = math.max(1, m.content.length / keep)
        val out = Array.newBuilder[Byte]
        var i = 0
        while (i < m.content.length) { out += m.content(i); i += stride }
        Resized(m.mediaId, m.kind, tw, th, out.result())
      }
    }
  }

  /** Frame sampling for `video` rows: `nFrames` evenly-spaced
    * fixed-size byte slices (a real codec would seek keyframes; the
    * offsets/batch shape are the real part). */
  def sampleFrames(ds: Dataset[MediaFile], nFrames: Int = 4,
      frameBytes: Int = 256): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      val len = m.content.length
      if (len == 0) Iterator.empty
      else (0 until nFrames).iterator.map { f =>
        val off = (len.toLong * f) / nFrames
        val end = math.min(len.toLong, off + frameBytes).toInt
        Frame(m.mediaId, f, off, java.util.Arrays.copyOfRange(m.content, off.toInt, end))
      }
    }
  }

  /** End-to-end stage: spread → decode ⋈ features (narrow, no blob
    * shuffle after the initial spread). */
  def describe(spark: SparkSession, ds: Dataset[MediaFile],
      partitions: Int = 32): DataFrame = {
    val spreadDs = spread(ds, partitions)
    decode(spreadDs).toDF()
      .join(features(spreadDs).toDF().drop("nBytes"), "mediaId")
      .orderBy("mediaId")
  }
}
