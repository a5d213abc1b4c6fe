package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical first
  * step of web-corpus text cleaning: composed and decomposed encodings
  * of the same glyph ("é" as U+00E9 vs "e"+U+0301) must hash, shingle,
  * and dedup identically, so every text pipeline normalizes before
  * fingerprinting. Spark has no normalization builtin; this wraps the
  * JDK's `java.text.Normalizer` (public Java SE API) as a native
  * codegen Expression so it fuses into the scan's whole-stage pipeline
  * like any builtin — no UDF serialization, no row boxing.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real corpus text (ASCII is always NFC), so
  * the common case costs one scan of the string and returns the input
  * UTF8String UNCOPIED; only genuinely denormalized strings pay the
  * String round-trip. SQL name: `graft_nfc(str)`. Matches DuckDB's
  * `nfc_normalize` (both implement Unicode canonical composition), so
  * queries built on it stay exactly oracle-able.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.NfcNormalizeImpl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeImpl {
  def compute(s: UTF8String): UTF8String = {
    // ASCII is closed under NFC — zero-allocation exit for the bulk of
    // any real corpus (one byte scan, no String materialization)
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
