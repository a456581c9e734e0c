package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product of two `array<float>` columns, as a native
  * Catalyst expression (`vec_dot` in SQL).
  *
  * Why not `aggregate(zip_with(...))`: the higher-order-function pair
  * materializes a 64-element intermediate array and evaluates two
  * lambdas per element for every row — ~µs/row. This kernel is a tight
  * primitive loop over the underlying columnar `ArrayData` with zero
  * allocation, inside whole-stage codegen, which is what makes the
  * brute-force all-pairs similarity queries tractable (and is the
  * right shape for a 1000-executor scan at 100 TB).
  *
  * Determinism contract: the result is the ORDERED left fold
  * `0.0 + x₀·y₀ + x₁·y₁ + …` with each float widened to double before
  * the IEEE multiply — bit-identical to DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b), …)))`
  * used by the oracles on equal-length dense inputs.
  *
  * Degenerate inputs — the validation LAYERING is deliberate:
  *  - Length mismatch THROWS (one int compare per row, free). The
  *    oracle's zip-pad-NULL would silently drop the row from a `> τ`
  *    filter; in a curation pipeline a dimension mismatch is data
  *    corruption, and failing the job beats silently losing pairs —
  *    and beats a truncated partial dot (the pre-fix behavior, a
  *    plausible WRONG similarity) most of all.
  *  - Null ELEMENTS are a documented precondition, validated at
  *    ingest (v05_embedding_stats flags zero/non-finite/dim-drift
  *    vectors), NOT per-pair: making this expression nullable threads
  *    null branches through every downstream cosine predicate and
  *    measured +10% on v03's sf10 candidate fold even with the check
  *    as a single 64-bit word probe of the UnsafeArrayData null
  *    bitset (an in-loop isNullAt+break was +56%, 22.3 → 34.9 s).
  *    The fold runs ~10⁴ times per vector at sf10 — per-pair
  *    validation is the wrong layer by that same factor. On unsafe
  *    rows a null slot reads as 0.0f; null ARRAYS still propagate
  *    null via BinaryExpression.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: length mismatch $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native SQL functions. */
object Functions {
  /** Idempotently register graft's native expressions (`vec_dot`,
    * `nd_band_keys`, `h32`, `h32b`) in the session's function registry so
    * `expr("vec_dot(a, b)")` / `expr("h32(s)")` resolve. Skips names
    * already present: `createOrReplaceTempFunction` on an existing name
    * logs a `SimpleFunctionRegistry` "replaced a previously registered
    * function" WARN, and callers invoke this once per query build, so
    * unconditional replacement sprays that warning through every bench
    * and driver artifact. The builders are pure constants — an existing
    * registration under these names is always ours and identical. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ifAbsent(name: String,
        builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    // arity-checked builders: a wrong argument count must surface as
    // an AnalysisException naming the function, not an
    // IndexOutOfBounds from exprs(1) — and never silently IGNORE
    // extra arguments (vec_dot(a, b, c) returning dot(a,b) would be a
    // plausible wrong number)
    def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
      if (exprs.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name,
            "expectedNum" -> n.toString,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
    ifAbsent("vec_dot", exprs => {
      arity("vec_dot", 2, exprs); FloatVecDot(exprs.head, exprs(1))
    })
    ifAbsent("nd_band_keys", exprs => {
      arity("nd_band_keys", 1, exprs); LshBandKeys(exprs.head)
    })
    ifAbsent("simhash_pack", exprs => {
      arity("simhash_pack", 2, exprs); SimHashPack(exprs.head, exprs(1))
    })
    ifAbsent("h32", exprs => { arity("h32", 1, exprs); Md5Word32(exprs.head, 0) })
    ifAbsent("h32b", exprs => { arity("h32b", 1, exprs); Md5Word32(exprs.head, 1) })
    ifAbsent("h63", exprs => { arity("h63", 1, exprs); Md5Key63(exprs.head) })
  }
}
