package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 32-bit SimHash over a token array: per token, `xxhash64(token)`
  * (seed 42, identical to the SQL builtin) casts ±1 votes on each of the
  * low 32 hash bits — with token multiplicity — and the signature sets
  * bit b iff its vote sum is strictly positive. Bit 31's contribution is
  * the int `1 << 31` widened to long (i.e. −2^31), reproducing the SQL
  * `sum(shiftleft(1, bit))` arithmetic EXACTLY, so signatures are
  * bit-identical to the declarative recipe they replace (proven in
  * CustomFunctionsSpec).
  *
  * Why an Expression: the declarative shape explodes every token into 32
  * (bit, vote) rows and runs two aggregations — a 32× row blow-up and a
  * full shuffle of votes just to sum them. This computes the signature in
  * a tight per-row loop inside whole-stage codegen: no explode, no extra
  * shuffle, one long out per document. SQL name: `graft_simhash(tokens)`.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one STATIC call into the shared loop (SimHashImpl's forwarder) —
    // stays inside whole-stage codegen, nothing rides along in the
    // plan's serialized references, no boxing, no per-bit expression tree
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.SimHashImpl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashImpl {
  /** Null elements are skipped (cannot occur for `split` output). */
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
        var b = 0
        while (b < 32) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      // (1 << 31) is int MIN_VALUE; widening reproduces the SQL int shift
      if (votes(b) > 0) sig += (1 << b).toLong
      b += 1
    }
    sig
  }
}
