package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, col, lit, xxhash64}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter membership gate — the scale path for
  * set-membership prefilters whose exact form would broadcast the raw
  * member values.
  *
  * The motivating workload is benchmark DECONTAMINATION at 100 TB: the
  * exact gate (`q_contamination`) broadcasts every benchmark n-gram
  * string and hash-joins the corpus gram stream against them. With a
  * realistic eval union (dozens of suites, tens of millions of grams)
  * that broadcast hash table is gigabytes per executor; the standard
  * industrial fix is a Bloom filter of the gram set — ~1.2 MB per
  * million grams at 1% FPP — applied as a MAP-ONLY filter on the corpus
  * stream, with the exact confirm join run only on the tiny bloom-
  * positive survivor set. False positives are eliminated by the confirm
  * join; Bloom filters have no false negatives, so the two-phase result
  * is bit-identical to the exact gate (pinned in BloomGateSpec and by
  * `q_contamination_bloom` sharing `q_contamination`'s DuckDB oracle).
  *
  * One hash convention on both faces: values are pre-hashed with Spark's
  * codegen `xxhash64` and the sketch stores/tests those longs
  * (`putLong`/`mightContainLong`). Building and probing through the same
  * Spark expression guarantees no cross-face hash divergence (a string
  * probed against a long-built bloom would silently return false — the
  * one mistake that would break the no-false-negative law). The 64-bit
  * pre-hash adds only ~n²/2⁶⁴ collision mass to the FPP and cannot
  * create false negatives.
  *
  * Determinism: `putLong` sets bits via the sketch's fixed-seed hashes
  * and merge is bitwise OR, so the built bloom is byte-identical
  * regardless of partitioning or row order — safe for checkpointed
  * plans and cross-run comparison.
  */
object BloomGate {

  /** Hard cap on bloom size (bits). 2³¹ bits = 256 MiB — beyond
    * broadcast comfort the design is wrong: a member set that big is no
    * longer "the bounded side" and belongs in a shuffle join, not a
    * driver-built sketch. Loud by design, like the banded-join flood
    * guards. */
  val MaxBits: Long = 1L << 31

  /** Builds a Bloom filter over `xxhash64(column)` of `df` and returns
    * it serialized. Runs as a `treeAggregate` — per-partition partial
    * blooms OR-merged executor-side, never a row collect; driver memory
    * is one bloom (≤ [[MaxBits]]).
    *
    * `df` must be the BOUNDED side of the gate (the benchmark/member
    * set) — the same contract as `broadcast()`. `expectedItems` sizes
    * the filter; when ≤ 0 it is counted from `df` (one cheap extra job
    * on the bounded side). Duplicate values are harmless (`putLong` is
    * idempotent) but counting distinct values yourself and passing it
    * in avoids over-sizing a heavily duplicated member column.
    */
  def buildBloom(
      df: DataFrame,
      column: String,
      fpp: Double = 0.01,
      expectedItems: Long = -1L): Array[Byte] = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val hashed = df.select(xxhash64(col(column)).as("h")).as(Encoders.scalaLong)
    val n = math.max(if (expectedItems > 0) expectedItems else hashed.count(), 1L)
    val bits = BloomFilter.optimalNumOfBits(n, fpp)
    require(bits <= MaxBits,
      s"bloom for $n items at fpp=$fpp needs $bits bits (> ${MaxBits} cap). " +
        "A member set this large is not a broadcastable gate - use the exact " +
        "inverted-index equi-join (q_contamination shape) instead, or raise fpp.")
    val bloom = hashed.rdd.treeAggregate(BloomFilter.create(n, fpp))(
      seqOp = (b, h) => { b.putLong(h); b },
      combOp = (a, b) => { a.mergeInPlace(b); a })
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** `true` iff `c`'s value might be in the bloom — a map-only, codegen
    * predicate (`graft_bloom_contains(xxhash64(c), bloom)`). No false
    * negatives; false positives at the built FPP, so follow with an
    * exact confirm join when exactness is required. Requires
    * [[GraftFunctions.register]] (or the extensions install) on the
    * session. */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    call_function("graft_bloom_contains", xxhash64(c), lit(bloomBytes))
}

/** `graft_bloom_contains(hash BIGINT, bloom BINARY) -> BOOLEAN`.
  *
  * `bloom` must be a FOLDABLE binary (a literal produced by
  * [[BloomGate.buildBloom]]): the sketch is deserialized once per
  * executor into a transient field and the per-row work is
  * `mightContainLong` — two fixed-seed hashes and two bit probes, no
  * allocation. A non-foldable bloom side would force a per-row
  * deserialize; it is rejected at analysis time instead.
  *
  * Codegen references the expression instance itself (the serialized
  * plan carries only the bloom BYTES; the executor-side lazy rebuild
  * happens on first row), keeping generated code a single virtual call
  * inside whole-stage codegen — same posture as the other graft
  * kernels.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: first argument must be BIGINT (an xxhash64 value), " +
          s"got ${left.dataType.sql}")
    } else if (right.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: second argument must be BINARY (a serialized bloom " +
          s"from BloomGate.buildBloom), got ${right.dataType.sql}")
    } else if (!right.foldable) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the bloom argument must be foldable (a literal) - " +
          "deserializing a sketch per row is never the right plan")
    } else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(bytes)
  }

  /** Called from both the interpreted path and generated code. */
  def test(h: Long): Boolean = bloom.mightContainLong(h)

  override def nullSafeEval(h: Any, bloomBytes: Any): Any =
    test(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomGate", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (h, _) => s"${ev.value} = $ref.test($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
