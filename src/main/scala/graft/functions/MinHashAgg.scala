package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Typed MinHash signature aggregator (SURVEY §4.3): folds a stream of
  * shingles into a k-wide signature of salted-hash minima. Partial
  * signatures merge element-wise (`min` is associative/commutative), so
  * Spark combines map-side — the shuffle carries k longs per group
  * regardless of document size, which is what makes MinHash dedup viable
  * at 100 TB.
  *
  * Hashing calls the same XxHash64Function that backs SQL `xxhash64`
  * (XXH64, seed 42, UTF-8 bytes), salted by prefixing the hash index —
  * exactly the `xxhash64(concat(cast(i AS STRING), t))` recipe inside
  * q_dedup_minhash, so signatures from this aggregator and from the HOF
  * pipeline are interchangeable (asserted by CustomFunctionsSpec).
  *
  * r11 role: the batch pipelines now sign PER ROW with the
  * graft_minhash_buckets expression (map-only — no explode, no
  * groupBy exchange; same arithmetic, see MinHashBuckets). This
  * aggregator remains the associative-merge REFERENCE the equivalence
  * law pins against (the dotI8 discipline: the alternative stays
  * in-tree so the A/B is reproducible), and the right tool when
  * signatures must fold across pre-exploded shingle ROWS rather than a
  * per-doc array.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  // Salt prefixes "0".."k-1" as UTF-8 bytes, computed once per
  // (deserialized) instance. UTF-8 concatenation equals byte
  // concatenation, so prefix-bytes ++ shingle-bytes hashes BIT-IDENTICAL
  // to UTF8String.fromString(salt.toString + shingle) — the recipe the
  // Scaladoc above pins and CustomFunctionsSpec asserts.
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(_.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // Per-thread scratch buffer: the naive recipe paid k string concats +
  // k UTF-8 encodings + k byte[] allocations PER SHINGLE — the dominant
  // cost of signature building (q_dedup_minhash was the second-slowest
  // telemetry query). Reusing one buffer drops that to one encode and
  // zero steady-state allocation; ThreadLocal because one Aggregator
  // instance can serve several local-mode tasks concurrently.
  @transient private lazy val scratch: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](128))

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val sb = shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // digit count grows with the index, so the last prefix is the widest
    val maxLen = prefixes(k - 1).length + sb.length
    var arr = scratch.get()
    if (arr.length < maxLen) { arr = new Array[Byte](maxLen); scratch.set(arr) }
    var i = 0
    while (i < k) {
      val p = prefixes(i)
      System.arraycopy(p, 0, arr, 0, p.length)
      System.arraycopy(sb, 0, arr, p.length, sb.length)
      val h = XxHash64Function.hash(
        UTF8String.fromBytes(arr, 0, p.length + sb.length), StringType, 42L)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
