package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}

import Multimodal.Mp4Codec

/** Property coverage for the Long-backed exp-Golomb reader the SPS
  * parsers stand on (round 12: the old global z > 16 run cap rejected
  * legal headers; these properties pin the widened range end-to-end
  * against an independent test-side encoder).
  */
object GolombProperties extends Properties("BitReader golomb") {

  /** MSB-first encoder, mirror of the specs' BitWriter: value v codes
    * as (v+1) in binary with (len-1) leading zeros. Long-domain so it
    * can code the full legal ue range [0, 2^32-2]. */
  private def encode(values: Seq[Long]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer[Int]()
    values.foreach { v =>
      val k = v + 1
      val n = 64 - java.lang.Long.numberOfLeadingZeros(k)
      var i = 0
      while (i < n - 1) { bits += 0; i += 1 }
      i = n - 1
      while (i >= 0) { bits += ((k >> i) & 1L).toInt; i -= 1 }
    }
    (bits ++ Seq.fill((8 - bits.length % 8) % 8)(1)) // pad with stop-ish 1s
      .grouped(8)
      .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
  }

  private def ueOf(v: Long): Long =
    new Mp4Codec.BitReader(encode(Seq(v))).ueLong()

  // the full legal ue range: se fields of ±(2^31-1) code to 2^32-2
  private val ueGen: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 64L),
    Gen.choose(0L, (1L << 32) - 2),
    Gen.oneOf(0L, 1L, 2L, 65535L, 65536L, 131071L, // old cap boundary
      Int.MaxValue.toLong, (1L << 32) - 2))

  property("ueLong roundtrips the full legal range") = Prop.forAll(ueGen) {
    v => ueOf(v) == v
  }

  property("sequences of mixed ue values roundtrip in order") =
    Prop.forAll(Gen.listOfN(8, ueGen)) { vs =>
      val r = new Mp4Codec.BitReader(encode(vs))
      vs.forall(v => r.ueLong() == v)
    }

  property("se roundtrips ±2^30 through the Int window") = {
    // se mapping: v>0 -> ue 2v-1, v<=0 -> ue -2v (ISO 14496-10 §9.1.1)
    val seGen = Gen.choose(-(1L << 30), 1L << 30)
    Prop.forAll(seGen) { v =>
      val ue = if (v > 0) 2 * v - 1 else -2 * v
      new Mp4Codec.BitReader(encode(Seq(ue))).se() == v.toInt
    }
  }

  property("ue() rejects values past Int range instead of wrapping") =
    Prop.forAll(Gen.choose(Int.MaxValue.toLong + 1, (1L << 32) - 2)) { v =>
      Prop.throws(classOf[IllegalArgumentException]) {
        new Mp4Codec.BitReader(encode(Seq(v))).ue()
      }
    }

  property("malformed all-zero runs throw, never return") = {
    // 5 zero bytes = a 40-bit zero run: past the z=31 guard
    Prop.throws(classOf[IllegalArgumentException]) {
      new Mp4Codec.BitReader(Array.fill(6)(0.toByte)).ueLong()
    }
  }
}
