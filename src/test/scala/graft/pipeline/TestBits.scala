package graft.pipeline

/** The ONE test-side MSB-first bit / exp-Golomb encoder, shared by
  * MultimodalSpec's SPS builders and GolombProperties' roundtrips.
  * Long-domain so it codes the full legal ue range [0, 2^32-2]
  * (subsuming every Int case); value v codes as (v+1) in binary with
  * (len-1) leading zeros, se maps v>0 → 2v-1, v≤0 → −2v
  * (ISO 14496-10 §9.1). Previously three hand-rolled copies had to be
  * kept bit-identical by hand — one helper, one coding.
  */
final class BitWriter {
  private val bits = scala.collection.mutable.ArrayBuffer[Int]()
  def u(v: Int, n: Int): this.type = {
    var i = n - 1
    while (i >= 0) { bits += ((v >> i) & 1); i -= 1 }
    this
  }
  def ue(v: Long): this.type = {
    val k = v + 1
    val n = 64 - java.lang.Long.numberOfLeadingZeros(k)
    var i = 0
    while (i < n - 1) { bits += 0; i += 1 }
    i = n - 1
    while (i >= 0) { bits += ((k >> i) & 1L).toInt; i -= 1 }
    this
  }
  def se(v: Long): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
  /** Pad to a byte boundary with `padBit` and pack. SPS fixtures pad
    * with rbsp_alignment-style 0s (the default); the golomb
    * properties pad with 1s so a truncated read can never decode a
    * phantom value out of the padding. */
  def bytes(padBit: Int = 0): Array[Byte] = {
    val padded = bits ++ Seq.fill((8 - bits.length % 8) % 8)(padBit)
    padded.grouped(8)
      .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
  }
}
