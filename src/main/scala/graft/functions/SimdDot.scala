package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** SIMD dot product over two `array<float>` columns (`graft_dot_simd`) —
  * the SURVEY §4.3 Panama-vector lever, kept as a SEPARATE function from
  * [[DotProduct]] on purpose.
  *
  * `graft_dot` is the determinism-bearing one: its sequential double fold
  * is mirrored bit-for-bit by the DuckDB oracle SQL (SURVEY §2 rule 5),
  * so every ✓-oracle query keeps using it. This expression reassociates
  * the sum across 256-bit float lanes (graft.simd.SimdKernels), which is
  * value-close (|Δ| ≲ 1e-6 relative on unit vectors, SimdSpec pins the
  * bound) but not bit-identical — fine for the ✗-tier ANN scans whose
  * candidates are exact-reranked, never for an oracle-hashed output.
  *
  * The kernel call sits inside whole-stage codegen as one static call on
  * `toFloatArray()` primitives (one copy out of UnsafeArrayData — the
  * price of handing Panama a contiguous float[]); graft.simd.SimdBridge
  * degrades to the identical-semantics scalar fold when the JVM lacks
  * `--add-modules jdk.incubator.vector`, so cluster-submit environments
  * that don't carry our javaOptions still run, just unvectorized. The
  * species is pinned 256-bit for cross-host determinism (see
  * SimdKernels scaladoc); A/B numbers vs graft_dot live in BASELINE.md.
  *
  * Deliberately FLOAT-ONLY: an explicit int8 kernel was built and
  * measured (SimdKernels.dotI8, ABSimd) and LOST to graft_dot's plain
  * byte loop at every dim (0.30x at d64, 0.47x at d1024) — integer
  * accumulation is associative, so C2 already auto-vectorizes the scalar
  * fold and the explicit convertShape chain only adds overhead. The SQ8
  * scan keeps graft_dot.
  */
case class SimdDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot_simd"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.simd.SimdBridge.dot(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.simd.SimdBridge.dot($a.toFloatArray(), $b.toFloatArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
