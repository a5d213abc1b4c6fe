package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native banded sign-plane LSH signature: `graft_lsh_buckets(embedding,
  * planes, bands)` → the ordered array of `bands` BIGINT bucket ids that
  * the embed-LSH family keys on (VectorOps.lshBucketsOf — the in-query
  * near-dup engine, the persisted index write/append/probe paths, and the
  * streaming probe's per-row signing all share it).
  *
  * Why an Expression and not the transform/zip_with/aggregate HOF recipe
  * it replaces (the graft_dot rationale, SURVEY §4.3, times nPlanes): the
  * HOF evaluates nPlanes × dim lambda pairs per row through interpreted
  * closures with boxed-double accumulators — the dominant cost of
  * q_dedup_embed at scale (319 s of the 50x smoke was signature
  * arithmetic). This compiles to a primitive double loop inside
  * whole-stage codegen. Arithmetic is IDENTICAL to the HOF — per plane, a
  * sequential double fold of embedding[j] * plane[j] in index order, sign
  * bit = (sum >= 0), bits folded bucket*2+bit band by band — so signatures
  * (and therefore every candidate set and index layout) are bit-identical;
  * CustomFunctionsSpec pins the equivalence, including the degenerate
  * inputs below.
  *
  * Degenerate-input contract: an embedding whose length differs from the
  * planes' dimension yields ALL-ZERO buckets, matching the HOF's algebra
  * (its zip_with null-pads the shorter side, nulling every plane sum, and
  * `when(sum >= 0, ...)` then emits bit 0) — the dim guards at the API
  * boundary fail loudly before this matters, but the expression must not
  * silently diverge. The ONE deliberate divergence: a NULL embedding
  * yields NULL (the HOF signed it into all-zero buckets, because its
  * outer transform runs over the non-null PLANES literal — bug-shaped:
  * null embeddings would band-match each other); probes posexplode the
  * signature, so a null row simply stops probing. CustomFunctionsSpec
  * pins both behaviors.
  *
  * `planes` must be a foldable array<array<double>> literal (the plane
  * family is pinned in index meta) and `bands` a foldable int dividing the
  * plane count; both are extracted once at plan time, and the flattened
  * plane matrix rides into codegen as a reference object, not generated
  * source.
  */
case class LshBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  private def elemType: DataType =
    first.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val planesOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => second.foldable
      case _ => false
    }
    val bandsOk = third.dataType == IntegerType && third.foldable
    if (embOk && planesOk && bandsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<double>>, " +
        s"foldable int), got (${first.dataType.sql}, ${second.dataType.sql}, " +
        s"${third.dataType.sql})")
  }

  /** Flattened plane matrix (row-major), plane count, dimension — one
    * plan-time extraction of the foldable literal. */
  @transient private lazy val (flatPlanes, nPlanes, dim) = {
    val rows = second.eval(null).asInstanceOf[ArrayData]
    val np = rows.numElements()
    require(np > 0, s"$prettyName: empty plane family")
    val d = rows.getArray(0).numElements()
    val flat = new Array[Double](np * d)
    var p = 0
    while (p < np) {
      val row = rows.getArray(p)
      require(row.numElements() == d,
        s"$prettyName: ragged plane family (plane $p has ${row.numElements()} != $d)")
      var j = 0
      while (j < d) { flat(p * d + j) = row.getDouble(j); j += 1 }
      p += 1
    }
    (flat, np, d)
  }

  @transient private lazy val bands: Int = {
    val b = third.eval(null).asInstanceOf[Int]
    require(b > 0 && nPlanes % b == 0,
      s"$prettyName: bands ($b) must be positive and divide the plane count ($nPlanes)")
    b
  }

  override def nullSafeEval(emb: Any, planes: Any, bandsIn: Any): Any = {
    val x = emb.asInstanceOf[ArrayData]
    LshBuckets.buckets(x, elemType == FloatType, flatPlanes, dim, nPlanes, bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flatPlanes, "double[]")
    val isFloat = elemType == FloatType
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"""
         |${ev.value} = graft.functions.LshBuckets.buckets(
         |  $a, $isFloat, $planesRef, $dim, $nPlanes, $bands);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshBuckets {
  /** The kernel, shared by eval and codegen: primitive double loops, same
    * sequential accumulation order as the HOF fold it replaced. */
  def buckets(emb: ArrayData, isFloat: Boolean, planes: Array[Double],
      dim: Int, nPlanes: Int, bands: Int): ArrayData = {
    val out = new Array[Long](bands)
    if (emb.numElements() == dim) {
      val r = nPlanes / bands
      var p = 0
      var b = 0
      while (b < bands) {
        var bucket = 0L
        var q = 0
        while (q < r) {
          var acc = 0.0
          val base = p * dim
          var j = 0
          if (isFloat) while (j < dim) { acc += emb.getFloat(j).toDouble * planes(base + j); j += 1 }
          else while (j < dim) { acc += emb.getDouble(j) * planes(base + j); j += 1 }
          bucket = bucket * 2 + (if (acc >= 0) 1L else 0L)
          p += 1
          q += 1
        }
        out(b) = bucket
        b += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
