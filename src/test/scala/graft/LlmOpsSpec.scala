package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the oracle-less LLM-pipeline operators: the DuckDB
  * gate cannot cover engine-specific hashing (xxhash64, HLL), so recall /
  * accuracy properties are asserted here instead.
  */
class LlmOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds every planted near-duplicate pair") {
    // The derived corpus plants doc_id ↔ doc_id+1_000_000 near-dups with
    // shingle Jaccard ≥ 0.5; banding (4 bands × 4 rows) must surface
    // essentially all of them, and every emitted pair is jaccard-verified.
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = Tables.documents(spark, sf).count()
    val planted = pairs.count { case (a, b) => b == a + 1000000 }
    assert(planted >= (nDocs * 0.8).toLong,
      s"LSH recall too low: $planted of $nDocs planted pairs found")
  }

  test("simhash near-dups include planted pairs, modest false-positive rate") {
    val rows = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = rows.count { case (a, b) => b == a + 1000000 }
    assert(planted > 0, "simhash found none of the planted near-dups")
    assert(rows.length < 10 * planted + 100,
      s"simhash too loose: ${rows.length} pairs for $planted planted")
  }

  test("IVF top-10 has positive recall against exact brute-force top-10") {
    val exact = SparkEntry.queries("q_knn_cosine")(spark, sf)
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("q_knn_ivf")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.nonEmpty)
    // nprobe=1 over a 10-cell codebook: expect some but not necessarily
    // full overlap with the exact result.
    assert((exact & ivf).nonEmpty, s"IVF recall 0: exact=$exact ivf=$ivf")
  }

  test("approx_count_distinct within 15% of exact") {
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.15).toLong),
        s"$k: approx $a vs exact $e")
    }
  }

  test("dedup is idempotent: re-deduping the keepers changes nothing") {
    val once = SparkEntry.queries("q_dedup_exact")(spark, sf)
    assert(once.count() === once.select("h").distinct().count())
  }

  test("jaccard is bounded and symmetric by construction") {
    val j = SparkEntry.queries("q_jaccard_pairs")(spark, sf)
      .select("jac").collect().map(_.getDouble(0))
    assert(j.forall(x => x >= 0.0 && x <= 1.0))
  }
}
