package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketches — the piece of the sketch-accounting
  * trio Spark's SQL surface lacks. Distinct counts persist and merge
  * via the native DataSketches HLL functions (sources/SketchLedger),
  * heavy hitters via `graft_topk`; but `percentile_approx`'s sketch is
  * internal-only — it cannot be PERSISTED per batch and merged later,
  * so "p99 document length so far, per source" needs a corpus re-scan.
  *
  * These functions close that gap with the Apache DataSketches KLL
  * library (already on Spark's classpath — Spark's own HLL functions
  * are built on the same jar) [PK: Karnin/Lang/Liberty, FOCS'16]:
  *
  *  - `graft_kll_agg(x[, k])` — aggregate numeric values into a KLL
  *    sketch, emitted as BINARY (persist it); k=200 default ≈ 1.65%
  *    normalized rank error, a few KB per sketch.
  *  - `graft_kll_merge(sketch)` — aggregate BINARY sketches into their
  *    union (read path over a persisted per-batch sketch table).
  *  - `graft_kll_quantile(sketch, rank)` / `graft_kll_rank(sketch, x)`
  *    — scalar estimate extraction from a (merged) sketch.
  *
  * Determinism contract, stated honestly: KLL compaction is RANDOMIZED
  * (unlike HLL's deterministic register OR), so sketch bytes and
  * estimates vary run-to-run WITHIN the rank-error bound. That makes
  * these functions monitoring/ledger tier, not declared-query tier —
  * every law in SketchLedgerSpec asserts error bounds, never hashes.
  *
  * The scalar extractors deserialize the sketch per call
  * (CodegenFallback), which is the right trade only because they run
  * over post-merge rows — one per key, not one per corpus row; the
  * per-row hot path is `graft_kll_agg`'s primitive `update(double)`.
  */
object KllSketchFns {

  private[graft] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  private val numeric: Set[DataType] =
    Set(DoubleType, FloatType, LongType, IntegerType, ShortType, ByteType)

  private[functions] def isNumeric(dt: DataType): Boolean = numeric.contains(dt)

  private[functions] def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float  => f.toDouble
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case s: Short  => s.toDouble
    case b: Byte   => b.toDouble
    case other => throw new IllegalArgumentException(s"non-numeric input $other")
  }

  /** Registry builder: `graft_kll_agg(x)` or `graft_kll_agg(x, k)`
    * with k a foldable integer literal (it sizes the sketch before any
    * row is seen, like graft_topk's capacity). */
  def buildAgg(exprs: Seq[Expression]): Expression = {
    require(exprs.nonEmpty && exprs.length <= 2,
      "graft_kll_agg(x[, k]) takes one or two arguments")
    val k = if (exprs.length == 1) 200 else {
      if (!exprs(1).foldable) throw new IllegalArgumentException(
        "graft_kll_agg(x, k): k must be an integer literal, got " + exprs(1).sql)
      exprs(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_kll_agg(x, k): k must be an integer literal, got $other")
      }
    }
    KllAgg(exprs.head, k)
  }
}

/** `graft_kll_agg(x[, k]) -> BINARY` — KLL quantile sketch of a numeric
  * column; partials build map-side and merge associatively, the shuffle
  * carries a few KB per group. */
case class KllAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!KllSketchFns.isNumeric(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric column, got ${child.dataType.sql}")
    else if (k < 8 || k > 65535)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be in [8, 65535], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(KllSketchFns.toDouble(v))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketchFns.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllAgg =
    copy(child = newChild)
}

/** `graft_kll_merge(sketch BINARY) -> BINARY` — union of KLL sketches;
  * the read-path aggregate over a persisted per-batch sketch table.
  *
  * Buffer discipline (measured, not guessed): `newHeapInstance(k)`
  * preallocates ~8.25·k bytes — an empty MAX-k shell costs ~540 KB, so
  * per-group buffers must start from the k=8 MINIMUM shell (~70 B) and
  * ADOPT the first real sketch's k instead of merging into the shell
  * (datasketches merge keeps the TARGET's k, so merging a real sketch
  * into a low-k shell would silently cap its accuracy — also measured).
  * Differing-k inputs still merge soundly (union accuracy = smaller k),
  * but SketchLedger pins k in meta so that downgrade is refused at
  * append time rather than silently absorbed here. */
case class KllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  private val shellK = 8 // KLL minimum k; adoption below keeps it out of real merges

  override def prettyName: String = "graft_kll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY sketch column, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(shellK)

  private def isShell(sk: KllDoublesSketch): Boolean =
    sk.isEmpty && sk.getK == shellK

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val sk = KllSketchFns.heapify(v.asInstanceOf[Array[Byte]])
      if (isShell(buf) && sk.getK != shellK) {
        // adopt: merge the empty shell INTO the first real sketch, so
        // the buffer takes the stored sketch's k (a k=8 data sketch
        // merging into the k=8 shell is the same accuracy either way)
        sk.merge(buf)
        return sk
      }
      buf.merge(sk)
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    if (isShell(buf) && other.getK != shellK) {
      other.merge(buf); other
    } else { buf.merge(other); buf }
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketchFns.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `graft_kll_quantile(sketch BINARY, rank DOUBLE) -> DOUBLE` — the
  * estimated value at normalized rank (inclusive criteria); NULL for an
  * empty sketch. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY sketch, DOUBLE rank), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(sk: Any, rank: Any): Any = {
    val r = rank.asInstanceOf[Double]
    require(r >= 0.0 && r <= 1.0, s"$prettyName: rank must be in [0, 1], got $r")
    val sketch = KllSketchFns.heapify(sk.asInstanceOf[Array[Byte]])
    if (sketch.isEmpty) null else sketch.getQuantile(r)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_kll_rank(sketch BINARY, x DOUBLE) -> DOUBLE` — the estimated
  * normalized rank of a value (inclusive); NULL for an empty sketch. */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_kll_rank"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY sketch, DOUBLE value), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(sk: Any, v: Any): Any = {
    val sketch = KllSketchFns.heapify(sk.asInstanceOf[Array[Byte]])
    if (sketch.isEmpty) null else sketch.getRank(v.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
