package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}

import Multimodal.Mp4Codec

/** Property coverage for the Long-backed exp-Golomb reader the SPS
  * parsers stand on (round 12: the old global z > 16 run cap rejected
  * legal headers; these properties pin the widened range end-to-end
  * against an independent test-side encoder).
  */
object GolombProperties extends Properties("BitReader golomb") {

  /** Encode via the shared test-side [[BitWriter]] (TestBits), padded
    * with 1s so a truncated read never decodes a phantom value out of
    * the padding. */
  private def encode(values: Seq[Long]): Array[Byte] =
    values.foldLeft(new BitWriter)((w, v) => w.ue(v)).bytes(padBit = 1)

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
