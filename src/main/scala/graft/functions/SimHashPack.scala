package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Folds the 32 packed SimHash vote lanes into the final 64-bit
  * signature in ONE codegen'd kernel (`simhash_pack` in SQL).
  *
  * Input contract (produced by
  * `graft.queries.TextPipeline.simhashSig`): `lanes[i]` is the group
  * sum of `((h >> i) & 1) + (((h2 >> i) & 1) << 32)` — set-bit count
  * of signature bit `i` in the low word and of bit `i + 32` in the
  * high word — and `n` is the group's non-null row count. Lanes
  * cannot carry between words: a group is one document's distinct
  * shingles, bounded far below 2³² by Spark's 2³¹-byte string cap,
  * so each 32-bit lane count stays exact. Bit `b` of the signature is
  * set iff its vote sum `2·c_b − n` is positive, i.e. `2·c_b > n` —
  * exactly the retired 64-sum expression tree's
  * `WHEN sum((bit·2)−1) > 0` rule (bit-parity pinned in
  * PipelineSpec).
  *
  * Why a kernel and not 64 CASE WHEN terms: together with the lane
  * packing (32 sums instead of 64) this keeps the signature
  * aggregate's whole-stage-codegen consume() under HotSpot's
  * 8 000-bytecode JIT refusal — the stage was the last
  * codegen-fallback entry on the round-16 inventory (9 140 bytecodes;
  * see `nd_band_keys` for the pattern and the measured
  * interpreted-band pathology it prevents).
  *
  * Null lanes (an all-null-hash group — sum over zero non-null rows)
  * contribute no set bits, matching the retired tree's
  * `WHEN null > 0 → 0` branch. */
case class SimHashPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"simhash_pack requires (array<bigint>, bigint) arguments, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_pack"

  override def nullSafeEval(lanesAny: Any, nAny: Any): Any = {
    val lanes = lanesAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Long]
    if (lanes.numElements() != 32)
      throw new IllegalArgumentException(
        s"simhash_pack: expected 32 vote lanes, got ${lanes.numElements()}")
    var sig = 0L
    var i = 0
    while (i < 32) {
      if (!lanes.isNullAt(i)) {
        val s = lanes.getLong(i)
        if (2L * (s & 0xffffffffL) > n) sig |= 1L << i
        if (2L * (s >>> 32) > n) sig |= 1L << (i + 32)
      }
      i += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lanes, n) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |if ($lanes.numElements() != 32) {
         |  throw new IllegalArgumentException(
         |    "simhash_pack: expected 32 vote lanes, got " + $lanes.numElements());
         |}
         |${ev.value} = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  if (!$lanes.isNullAt($i)) {
         |    long $s = $lanes.getLong($i);
         |    if (2L * ($s & 0xffffffffL) > $n) ${ev.value} |= 1L << $i;
         |    if (2L * ($s >>> 32) > $n) ${ev.value} |= 1L << ($i + 32);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
