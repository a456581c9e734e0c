package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * operators (decode → features → resize / frame-sample).
  *
  * The Spark-side plumbing is REAL and tested: schema, hash
  * partitioning of heavy blobs, mapPartitions batch shape, and the
  * byte-level feature computations. IMAGE decode/resize is real:
  * [[ImageIoCodec]] parses PNG/JPEG/GIF/BMP headers and rescales
  * pixels via the JDK's `javax.imageio`. AUDIO is real too:
  * [[WavCodec]] parses RIFF/WAVE chunk structure and decimates PCM
  * frames in pure byte arithmetic. [[AutoCodec]] (the default)
  * sniffs the container and dispatches. Only VIDEO payloads (no
  * codec in the JDK, none in this container) fall back to the
  * clearly marked [[StubCodec]], which derives deterministic fake
  * dimensions from the byte stream; a real video codec is a
  * one-object change behind the same [[Codec]] trait.
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

  /** Codec boundary: dimension probe + pixel resample. */
  trait Codec extends Serializable {
    def dimensions(content: Array[Byte]): (Int, Int, Int)

    /** Resample `content` (known dims `w`×`h`) to `tw`×`th`. Default:
      * deterministic byte stride-subsample proportional to the area
      * ratio — the stand-in used when real pixel decode is impossible
      * (audio/video/corrupt payloads). */
    def resample(content: Array[Byte], w: Int, h: Int,
        tw: Int, th: Int): Array[Byte] = {
      val keep = math.max(1,
        (content.length.toDouble * (tw.toLong * th) / (w.toLong * h)).toInt)
      val stride = math.max(1, content.length / keep)
      val out = Array.newBuilder[Byte]
      var i = 0
      while (i < content.length) { out += content(i); i += stride }
      out.result()
    }
  }

  /** STUB: deterministic fake decode — dimensions derived from a
    * rolling hash of the first 64 payload bytes. Stands in for the
    * audio/video codecs this container lacks; the partitioning /
    * batching around it is production-shaped. */
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

  /** REAL image codec — PNG/JPEG/GIF/BMP via the JDK's `javax.imageio`
    * (no external libraries, headless-safe).
    *
    *  - `dimensions` parses only the image HEADER
    *    (`ImageReader.getWidth/getHeight` without a pixel decode) —
    *    probing a 50 MB JPEG costs a few hundred header bytes, which is
    *    what a 100 TB metadata pass over blob columns must do.
    *  - `resample` fully decodes, scales with bilinear interpolation
    *    (`Graphics2D.drawImage` onto a target-sized buffer), and
    *    re-encodes as PNG.
    *
    * Bytes no installed reader recognizes (audio, video, corrupt
    * files) fall back to [[StubCodec]] semantics, so one bad file in a
    * mixed-media batch degrades to a fake row instead of killing the
    * whole task — the per-row error contract a large decode pass needs. */
  object ImageIoCodec extends Codec {
    override def dimensions(content: Array[Byte]): (Int, Int, Int) =
      withReader(content) { reader =>
        val channels =
          try {
            val types = reader.getImageTypes(0)
            if (types.hasNext) types.next().getColorModel.getNumComponents
            else 3
          } catch { case scala.util.control.NonFatal(_) => 3 }
        (reader.getWidth(0), reader.getHeight(0), channels)
      }.getOrElse(StubCodec.dimensions(content))

    override def resample(content: Array[Byte], w: Int, h: Int,
        tw: Int, th: Int): Array[Byte] = {
      val decoded =
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content)))
        catch { case scala.util.control.NonFatal(_) => None }
      decoded match {
        case Some(src) =>
          val dst = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, tw, th, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          bos.toByteArray
        case None => super.resample(content, w, h, tw, th)
      }
    }

    /** Header-only reader scope: open an image input stream over the
      * bytes, hand the first matching reader to `f`, always dispose. */
    private def withReader[T](content: Array[Byte])(
        f: javax.imageio.ImageReader => T): Option[T] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis, true); Some(f(r)) }
          catch { case scala.util.control.NonFatal(_) => None }
          finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** REAL audio codec — RIFF/WAVE parsing and PCM frame decimation in
    * pure JVM byte arithmetic (no external libraries; the container
    * has no audio stack, but WAV needs none).
    *
    * Dimension mapping for the shared [[Codec]] contract:
    * `width` = frames per channel (data bytes / block align, capped at
    * Int.MaxValue), `height` = sample rate in Hz, `channels` =
    * channel count — so the generic aspect-preserving resize scales
    * frame count and sample rate together, preserving duration.
    *
    * `resample` emits a VALID PCM WAV: every k-th whole frame
    * (nearest-neighbor decimation to ~`tw` frames, block-aligned so
    * channel interleaving survives) under a rebuilt RIFF header with
    * the proportional `th` sample rate. Non-RIFF or malformed bytes
    * fall back to [[StubCodec]] semantics like the image path. */
  object WavCodec extends Codec {
    /** (dataOffset, dataSize, blockAlign, sampleRate, channels). */
    private def parse(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
      def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def u32(i: Int): Long =
        (u16(i).toLong) | (u16(i + 2).toLong << 16)
      def tag(i: Int): String =
        if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""
      if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (blockAlign, rate, channels)
      var data: Option[(Int, Int)] = None // (offset, size)
      while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(pos)
        val size = u32(pos + 4)
        val body = pos + 8
        if (size < 0 || body + size > b.length) return fmt.flatMap {
          case (ba, r, c) =>
            // tolerate a truncated trailing data chunk (streaming cut)
            if (id == "data" && body < b.length)
              Some((body, b.length - body, ba, r, c))
            else None
        }
        if (id == "fmt " && size >= 16)
          fmt = Some((u16(body + 12), u32(body + 4).toInt, u16(body + 2)))
        else if (id == "data") data = Some((body, size.toInt))
        pos = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      for ((off, sz) <- data; (ba, rate, ch) <- fmt if ba > 0 && rate > 0)
        yield (off, sz, ba, rate, ch)
    }

    override def dimensions(content: Array[Byte]): (Int, Int, Int) =
      parse(content) match {
        case Some((_, dataSize, blockAlign, rate, channels)) =>
          val frames = math.min(Int.MaxValue.toLong,
            dataSize.toLong / blockAlign).toInt
          (frames, rate, channels)
        case None => StubCodec.dimensions(content)
      }

    override def resample(content: Array[Byte], w: Int, h: Int,
        tw: Int, th: Int): Array[Byte] =
      parse(content) match {
        case Some((off, dataSize, blockAlign, _, channels)) =>
          val frames = dataSize / blockAlign
          val stride = math.max(1, frames / math.max(1, tw))
          val kept = (0 until frames by stride).length
          val out = java.nio.ByteBuffer
            .allocate(44 + kept * blockAlign)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val bits = 8 * blockAlign / math.max(1, channels)
          val rate = math.max(1, th)
          out.put("RIFF".getBytes("US-ASCII"))
            .putInt(36 + kept * blockAlign)
            .put("WAVEfmt ".getBytes("US-ASCII"))
            .putInt(16).putShort(1.toShort) // PCM
            .putShort(channels.toShort).putInt(rate)
            .putInt(rate * blockAlign).putShort(blockAlign.toShort)
            .putShort(bits.toShort)
            .put("data".getBytes("US-ASCII")).putInt(kept * blockAlign)
          var f = 0
          while (f < frames) {
            out.put(content, off + f * blockAlign, blockAlign)
            f += stride
          }
          out.array()
        case None => super.resample(content, w, h, tw, th)
      }
  }

  /** Default codec: sniff the container and dispatch — RIFF/WAVE bytes
    * to [[WavCodec]], anything else to [[ImageIoCodec]] (which itself
    * falls back to [[StubCodec]] for undecodable payloads). One codec
    * value serves mixed-media batches without per-kind branching in
    * the operators. */
  object AutoCodec extends Codec {
    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    private def pick(b: Array[Byte]): Codec =
      if (isWav(b)) WavCodec else ImageIoCodec
    override def dimensions(content: Array[Byte]): (Int, Int, Int) =
      pick(content).dimensions(content)
    override def resample(content: Array[Byte], w: Int, h: Int,
        tw: Int, th: Int): Array[Byte] =
      pick(content).resample(content, w, h, tw, th)
  }

  /** Spread heavy blobs evenly before CPU-bound work: hash-partition
    * on mediaId (narrow round-robin would break mapPartitions
    * determinism in tests; hash keeps placement stable). */
  def spread(ds: Dataset[MediaFile], partitions: Int): Dataset[MediaFile] =
    ds.repartition(partitions, col("mediaId"))

  /** Decode batch operator: one codec call per row, per partition. */
  def decode(ds: Dataset[MediaFile],
      codec: Codec = AutoCodec): Dataset[Decoded] = {
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
    * aspect ratio, then hand the pixel work to the codec — a real
    * bilinear rescale + PNG re-encode for decodable images
    * ([[ImageIoCodec]]), a deterministic stride subsample otherwise.
    * The dimension math, batch shape and output-size bound are the
    * pipeline contract either way. */
  def resize(ds: Dataset[MediaFile], maxSide: Int = 256,
      codec: Codec = AutoCodec): Dataset[Resized] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, _) = codec.dimensions(m.content)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val (tw, th) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        Resized(m.mediaId, m.kind, tw, th,
          codec.resample(m.content, w, h, tw, th))
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
