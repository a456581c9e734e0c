package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The frozen pseudo-random hyperplane family shared by the
  * embedding-LSH operators and their DuckDB oracles (near-dup banding,
  * random projection). Centralized here so the one Spark-side codegen
  * kernel ([[LshBandKeys]]) and the SQL-literal oracle builders in
  * `graft.queries.VectorPipeline` provably draw the same planes.
  *
  * `mix` is the Murmur3 finalizer — the nonlinearity an affine mod-11
  * formula lacks (any `(a·p + b·i) mod 11` repeats with period ≤ 11 in
  * p, collapsing 64 "independent" planes to 11). FROZEN: these
  * constants parameterize declared query results and their oracles.
  */
private[graft] object PlaneFamily {
  def mix(x0: Int): Int = {
    var x = x0
    x ^= x >>> 16; x *= 0x85ebca6b
    x ^= x >>> 13; x *= 0xc2b2ae35
    x ^= x >>> 16
    x
  }

  /** Plane `p` of the family: dim integer weights in [-5, 5]. */
  def plane(p: Int, dim: Int): IndexedSeq[Int] =
    (0 until dim).map(i => math.floorMod(mix(p * dim + i), 11) - 5)
}

/** All [[LshBandKeys.NdBands]] sign-band keys of an `array<float>`
  * embedding in ONE codegen'd kernel (`nd_band_keys` in SQL):
  * `key_j = Σ_k (dot(emb, plane(j·8 + k)) > 0 ? 1<<k : 0)`, the exact
  * arithmetic of the 64 per-plane `CASE WHEN vec_dot(...) > 0`
  * expressions it replaces — same ordered left fold with per-element
  * float→double widening (the [[FloatVecDot]] determinism contract),
  * same strict `> 0.0`, same bit packing, so results are
  * bit-identical to the expression-tree formulation AND to the DuckDB
  * oracle built from the same [[PlaneFamily]].
  *
  * Why an expression kernel and not 64 expressions: the 64-fold
  * projection inlines into one whole-stage-codegen consume() of
  * ~17 800 bytecodes — past HotSpot's 8 000-byte JIT refusal — so the
  * stage either runs interpreted (455.8 s cold at 2 M vectors,
  * round-16 finding) or falls back to per-expression codegen
  * (dispatch overhead per plane). This kernel is one small triple
  * loop (~hundreds of bytecodes): JIT-compiled, whole-stage-codegen
  * resident, with the plane matrix a single shared `float[][]`
  * reference instead of 64 inlined array literals bloating the plan.
  *
  * Degenerate inputs follow [[FloatVecDot]]'s layering: a dimension
  * mismatch against the plane family THROWS (data corruption must
  * fail the job, not skew a bucket); null ARRAYS propagate null via
  * UnaryExpression; null elements are an ingest-validated
  * precondition (v05), not a per-row branch. */
case class LshBandKeys(child: Expression) extends UnaryExpression {

  import LshBandKeys._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nd_band_keys requires an array<float> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "nd_band_keys"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != Dim)
      throw new IllegalArgumentException(
        s"nd_band_keys: embedding has $n dims, plane family has $Dim")
    val keys = new Array[Int](NdBands)
    var j = 0
    while (j < NdBands) {
      var key = 0
      var k = 0
      while (k < NdRows) {
        val w = Planes(j * NdRows + k)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x.getFloat(i).toDouble * w(i).toDouble
          i += 1
        }
        if (acc > 0.0) key |= 1 << k
        k += 1
      }
      keys(j) = key
      j += 1
    }
    new GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("ndPlanes", Planes, "float[][]")
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val key = ctx.freshName("key")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |int $n = $a.numElements();
         |if ($n != $Dim) {
         |  throw new IllegalArgumentException(
         |    "nd_band_keys: embedding has " + $n + " dims, plane family has $Dim");
         |}
         |int[] $keys = new int[$NdBands];
         |for (int $j = 0; $j < $NdBands; $j++) {
         |  int $key = 0;
         |  for (int $k = 0; $k < $NdRows; $k++) {
         |    float[] $w = $planes[$j * $NdRows + $k];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $a.getFloat($i)) * ((double) $w[$i]);
         |    }
         |    if ($acc > 0.0) $key |= 1 << $k;
         |  }
         |  $keys[$j] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandKeys {
  /** Near-dup banding geometry — FROZEN (parameterizes v03/v17 and
    * their oracles; mirrored by `VectorPipeline.NdPlanes/NdBands`). */
  val NdPlanes = 64
  val NdBands = 8
  val NdRows: Int = NdPlanes / NdBands
  val Dim = 64

  /** The plane matrix as floats — small integer weights are exact as
    * floats, so the float→double widening in the fold reproduces the
    * integer products bit-for-bit (the typedlit contract the
    * expression-tree formulation relied on). */
  val Planes: Array[Array[Float]] =
    Array.tabulate(NdPlanes)(p =>
      PlaneFamily.plane(p, Dim).map(_.toFloat).toArray)
}
