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
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  private def hash(salt: Int, shingle: String): Long =
    XxHash64Function.hash(UTF8String.fromString(salt.toString + shingle), StringType, 42L)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = hash(i, shingle)
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
