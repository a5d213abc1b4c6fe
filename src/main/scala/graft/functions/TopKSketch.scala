package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SpaceSaving summary state: at most `capacity` monitored items, each
  * with an overestimating count and the error ceded when its slot was
  * recycled [PK: Metwally/Agrawal/El Abbadi ICDT'05; merge per
  * Agarwal et al., "Mergeable Summaries", PODS'12].
  *
  * Guarantees maintained through update AND merge:
  *  - est(x) >= true(x) for every monitored x (counts only overestimate);
  *  - est(x) - err(x) <= true(x) (err bounds the overestimate);
  *  - any item with true(x) > total/capacity is monitored — the
  *    heavy-hitter guarantee that makes a fixed-size sketch a sound
  *    100 TB vocabulary/top-k primitive (CustomFunctionsSpec pins all
  *    three on skewed fixtures, single- and multi-partition).
  */
final class TopKBuffer(val capacity: Int) {
  val counts = mutable.HashMap.empty[String, Long]
  val errs = mutable.HashMap.empty[String, Long]
  var total = 0L

  /** SpaceSaving point update: hit increments; a miss with a full table
    * recycles the min-count slot (deterministic tiebreak: largest key),
    * inheriting its count as the new item's error ceiling. */
  def add(item: String): Unit = {
    total += 1L
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1L)
      case None if counts.size < capacity =>
        counts.update(item, 1L); errs.update(item, 0L)
      case None =>
        var minKey: String = null
        var minCnt = Long.MaxValue
        counts.foreach { case (k, c) =>
          if (c < minCnt || (c == minCnt && (minKey == null || k > minKey))) {
            minKey = k; minCnt = c
          }
        }
        counts.remove(minKey); errs.remove(minKey)
        counts.update(item, minCnt + 1L)
        errs.update(item, minCnt)
    }
  }

  /** Mergeable-summaries combine. The load-bearing detail is what an
    * ABSENT key contributes: by the SpaceSaving invariant, an item not
    * in a full summary has true count <= that summary's min count, so
    * the absent side contributes its min count to BOTH the estimate
    * (keeping est >= true when an item was evicted on one side but
    * monitored on the other) and the error (keeping est - err <= true —
    * the contribution is pure uncertainty). A summary that never
    * overflowed has floor 0: absence there really means count 0. Then
    * the table truncates back to the top `capacity` by (count desc,
    * key asc). */
  def mergeIn(other: TopKBuffer): Unit = {
    total += other.total
    val floorSelf = if (counts.size >= capacity) counts.values.min else 0L
    val floorOther = if (other.counts.size >= other.capacity) other.counts.values.min else 0L
    val keys = counts.keySet ++ other.counts.keySet
    val merged = keys.toSeq.map { k =>
      val cSelf = counts.getOrElse(k, floorSelf)
      val eSelf = if (counts.contains(k)) errs.getOrElse(k, 0L) else floorSelf
      val cOther = other.counts.getOrElse(k, floorOther)
      val eOther = if (other.counts.contains(k)) other.errs.getOrElse(k, 0L) else floorOther
      (k, cSelf + cOther, eSelf + eOther)
    }
    counts.clear(); errs.clear()
    merged.sortBy { case (k, c, _) => (-c, k) }.take(capacity).foreach {
      case (k, c, e) => counts.update(k, c); errs.update(k, e)
    }
  }

  /** Entries as (item, cnt, err), sorted (cnt desc, item asc). */
  def sorted: Seq[(String, Long, Long)] =
    counts.toSeq.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => (k, c, errs.getOrElse(k, 0L)) }
}

/** `graft_topk(item, capacity)` — heavy-hitters aggregate via the
  * remaining SURVEY §2.K extension mechanism: a Catalyst
  * TypedImperativeAggregate (arbitrary-object buffer with explicit
  * serialize/deserialize, the surface Spark's own HLL/percentile
  * sketches use — a typed `Aggregator` like MinHashAgg row-encodes its
  * buffer instead, which a hash table doesn't fit well).
  *
  * Partial sketches build map-side, serialize into the shuffle, and
  * merge associatively — the shuffle carries at most `capacity` entries
  * per group regardless of input size, which is the difference between
  * a top-k vocabulary costing one bounded pass (this) and a full
  * explode→count→window (q_vocab_topk, exact but shuffling every
  * distinct term). Emits array<struct<item, cnt, err>> sorted
  * (cnt desc, item asc); est-true bounds live in the struct so a
  * consumer can see the uncertainty.
  */
case class TopKSketch(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && capacity > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column and a positive integer capacity literal, " +
        s"got ${child.dataType.sql}, capacity=$capacity")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(capacity)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (item, cnt, err) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(item), cnt, err)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.total)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(buf.errs.getOrElse(k, 0L))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(capacity)
    buf.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val k = new String(kb, "UTF-8")
      buf.counts.update(k, in.readLong())
      buf.errs.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): TopKSketch =
    copy(child = newChild)
}

object TopKSketch {
  /** Registry builder shared by GraftFunctions and GraftExtensions:
    * capacity must be a foldable integer literal (it sizes the buffer
    * before any row is seen). */
  def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_topk(item, capacity) takes two arguments")
    if (!exprs(1).foldable) throw new IllegalArgumentException(
      "graft_topk(item, capacity): capacity must be an integer literal, " +
        s"got non-foldable expression ${exprs(1).sql}")
    val cap = exprs(1).eval(null) match {
      case i: Int if i >= 1 => i
      case i: Int => throw new IllegalArgumentException(
        s"graft_topk(item, capacity): capacity $i out of range [1, ${Int.MaxValue}]")
      case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"graft_topk(item, capacity): capacity $l out of range [1, ${Int.MaxValue}]")
      case other => throw new IllegalArgumentException(
        s"graft_topk(item, capacity): capacity must be an integer literal, got $other")
    }
    TopKSketch(exprs.head, cap)
  }
}
