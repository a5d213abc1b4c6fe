package graft

import graft.sources.SketchLedger
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the HLL sketch ledger (sources/SketchLedger.scala): the
  * incremental distinct-count accounting must agree with a one-shot
  * exact count within the sketch's error contract, be order-free, and
  * degrade gracefully when a batch is re-appended (retry safety — the
  * property the composed ingest loops rely on for every other table).
  */
class SketchLedgerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def tokens = Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("tok"))

  private def tmp() = java.nio.file.Files.createTempDirectory("sketch_ledger").toString

  test("incremental appends agree with the exact one-shot count within HLL error") {
    val dir = tmp()
    val t = tokens
    // three disjoint ingest batches by doc_id residue
    (0 until 3).foreach { r =>
      SketchLedger.append(spark, t.where(col("doc_id") % 3 === r),
        Seq("source"), "tok", dir, batchId = s"b$r")
    }
    val exact = t.groupBy("source").agg(countDistinct("tok").as("d"), count("tok").as("n"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val est = SketchLedger.distinctByKey(spark, dir)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, (d, n)) =>
      val (ed, en) = exact(k)
      assert(n === en, s"rows column must be EXACT: $k got $n want $en")
      assert(math.abs(d - ed).toDouble / ed <= 0.05,
        s"$k distinct estimate $d vs exact $ed beyond 5% (HLL contract ~1.6% at lgk=12)")
    }
    val totalExact = t.agg(countDistinct("tok")).head().getLong(0)
    val total = SketchLedger.distinctTotal(spark, dir)
    assert(math.abs(total - totalExact).toDouble / totalExact <= 0.05,
      s"global estimate $total vs exact $totalExact")
  }

  test("append order does not change the estimates (sketch union is commutative)") {
    val t = tokens
    val dirs = Seq(Seq(0, 1, 2), Seq(2, 0, 1)).map { order =>
      val dir = tmp()
      order.foreach { r =>
        SketchLedger.append(spark, t.where(col("doc_id") % 3 === r),
          Seq("source"), "tok", dir, batchId = s"b$r")
      }
      dir
    }
    val a = SketchLedger.distinctByKey(spark, dirs(0)).collect().toSeq
    val b = SketchLedger.distinctByKey(spark, dirs(1)).collect().toSeq
    assert(a === b, "estimates differ across append orders")
  }

  test("a re-appended (retried) batch cannot inflate the distinct estimate") {
    val dir = tmp()
    val t = tokens
    SketchLedger.append(spark, t, Seq("source"), "tok", dir, batchId = "b0")
    val once = SketchLedger.distinctByKey(spark, dir).collect().map(_.getLong(1)).toSeq
    SketchLedger.append(spark, t, Seq("source"), "tok", dir, batchId = "b0_retry")
    val twice = SketchLedger.distinctByKey(spark, dir).collect().map(_.getLong(1)).toSeq
    assert(once === twice,
      "unioning a duplicate batch's sketch changed the estimate - HLL register OR " +
        "must be idempotent on identical inputs")
  }

  test("parameter drift across appends is refused loudly") {
    val dir = tmp()
    SketchLedger.append(spark, tokens, Seq("source"), "tok", dir, batchId = "b0")
    val e = intercept[IllegalArgumentException] {
      SketchLedger.append(spark, tokens, Seq("source"), "tok", dir,
        batchId = "b1", lgConfigK = 14)
    }
    assert(e.getMessage.contains("lgk"), s"unhelpful message: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      SketchLedger.append(spark, tokens, Seq("lang"), "tok", dir, batchId = "b2")
    }
    assert(e2.getMessage.contains("keys"), s"unhelpful message: ${e2.getMessage}")
  }
}
