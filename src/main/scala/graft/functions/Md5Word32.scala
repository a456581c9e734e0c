package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One 32-bit word of the md5 digest of a string, as an unsigned
  * value in a long — word 0 is digest bytes 0–3 (≡ the first 8 hex
  * chars parsed base-16), word 1 is bytes 4–7 (hex chars 9–16).
  *
  * This is the text pipeline's hottest kernel: every dedup /
  * fingerprint / decontamination operator hashes every shingle of
  * every document through it. The composed form
  * `conv(substring(md5(x), 1, 8), 16, 10)` materializes a 32-char hex
  * string per value and then parses it back; this expression digests
  * the UTF-8 bytes and assembles the word directly — zero intermediate
  * allocation beyond the 16-byte digest, inside whole-stage codegen,
  * with one `MessageDigest` instance per generated class (not per
  * row).
  *
  * Determinism contract: big-endian unsigned assembly of the digest
  * bytes is EXACTLY the base-16 parse of the corresponding hex chars,
  * so values are bit-identical to the composed Spark form and to the
  * DuckDB oracles' `('0x' || substr(md5(x), 1, 8))::BIGINT`
  * ([[graft.pipeline.TextPrep.h32Sql]]) — pinned by FunctionsSpec
  * equivalence tests.
  */
case class Md5Word32(child: Expression, word: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && (word == 0 || word == 1))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h32 requires a string argument and word 0 or 1, got " +
        s"${child.dataType.simpleString} / word $word")

  override def dataType: DataType = LongType

  override def prettyName: String = if (word == 0) "h32" else "h32b"

  override def nullSafeEval(input: Any): Any = {
    val d = Md5Word32.digest.get().digest(
      input.asInstanceOf[UTF8String].getBytes)
    Md5Word32.assemble(d, word * 4)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v =>
        s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
           |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
         """.stripMargin)
    val o = word * 4
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("md5digest")
      // A generated line must never BEGIN with `|`: the codegen block
      // pipeline strips it as a margin character, deleting the OR
      // operators and leaving adjacent parenthesized expressions that
      // Janino rejects — whole-stage then silently falls back to
      // interpreted eval, losing the codegen win this expression
      // exists for. Operators stay at end-of-line.
      s"""
         |byte[] $d = $md.digest($c.getBytes());
         |${ev.value} = (($d[$o] & 0xFFL) << 24) |
         |  (($d[$o + 1] & 0xFFL) << 16) |
         |  (($d[$o + 2] & 0xFFL) << 8) |
         |  ($d[$o + 3] & 0xFFL);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Word32 {
  /** MessageDigest is stateful and not thread-safe; interpreted eval
    * (non-codegen paths) gets one per thread. `digest()` resets the
    * instance after each call. */
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[functions] def assemble(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xFFL) << 24) | ((d(o + 1) & 0xFFL) << 16) |
      ((d(o + 2) & 0xFFL) << 8) | (d(o + 3) & 0xFFL)
}

/** The 63-bit two-md5-word key `h32(x)·2³¹ + (h32b(x) >> 1)`
  * ([[graft.pipeline.TextPrep.hashKey63]]'s construction) from ONE
  * digest. The composed Column form evaluates [[Md5Word32]] twice —
  * two full MD5 digests of the same string per value, because the two
  * words are distinct expressions Catalyst's subexpression
  * elimination cannot merge — and the key sites are the text
  * pipeline's hottest loops (every bigram of every document in the LM
  * scorer, every 8-gram span in td15, every token in td17). Fusing
  * halves the digest work while assembling bit-identical values:
  * word0 < 2³², so `word0 << 31` equals the `· 2147483648` multiply,
  * and word1 ∈ [0, 2³²) makes arithmetic and logical right-shift
  * agree. Equivalence to the composed form (and through it to the
  * DuckDB oracles' textual mirror) is pinned in FunctionsSpec.
  */
case class Md5Key63(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h63 requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "h63"

  override def nullSafeEval(input: Any): Any = {
    val d = Md5Word32.digest.get().digest(
      input.asInstanceOf[UTF8String].getBytes)
    (Md5Word32.assemble(d, 0) << 31) + (Md5Word32.assemble(d, 4) >> 1)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v =>
        s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
           |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
         """.stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("md5digest")
      // see Md5Word32.doGenCode: generated lines must not begin with
      // `|` (margin-stripping would delete the OR operators)
      s"""
         |byte[] $d = $md.digest($c.getBytes());
         |${ev.value} = (((($d[0] & 0xFFL) << 24) |
         |  (($d[1] & 0xFFL) << 16) |
         |  (($d[2] & 0xFFL) << 8) |
         |  ($d[3] & 0xFFL)) << 31) +
         |  (((($d[4] & 0xFFL) << 24) |
         |  (($d[5] & 0xFFL) << 16) |
         |  (($d[6] & 0xFFL) << 8) |
         |  ($d[7] & 0xFFL)) >> 1);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
