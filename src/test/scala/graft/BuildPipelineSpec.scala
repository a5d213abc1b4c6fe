package graft

import java.nio.file.Files

import graft.sources.BuildPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the reference-style resumable build: keyed target space →
  * ledger diff → distributed compute → partitioned store, across
  * multiple batches with a simulated interruption.
  */
class BuildPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("curation pipeline: redact, gate, dedup, split compose end to end") {
    import graft.sources.CurationPipeline
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val curated = CurationPipeline.curate(spark, sf, minScore = 0.3)
    val rows = curated.collect()
    assert(rows.nonEmpty && rows.length <= docs.count())
    // redaction really happened: no digit survives in any kept text
    assert(rows.forall(!_.getAs[String]("text").exists(_.isDigit)))
    // quality gate: every kept doc meets the threshold
    assert(rows.forall(_.getAs[Double]("score") >= 0.3))
    // dedup: normalized content hashes are unique among keepers
    val hashes = curated
      .select(sha2(lower(trim(col("text"))), 256).as("h")).collect().map(_.getString(0))
    assert(hashes.length === hashes.distinct.length)
    // split assignment is total and deterministic across runs
    assert(rows.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
    val again = CurationPipeline.curate(spark, sf, minScore = 0.3)
      .orderBy("doc_id").collect().toSeq
    assert(curated.orderBy("doc_id").collect().toSeq === again)
    // split-partitioned landing supports pruning
    val out = Files.createTempDirectory("curated").toString + "/c"
    CurationPipeline.writeSplits(curated, out)
    val train = spark.read.parquet(out).where(col("split") === "train")
    assert(train.count() > 0)
    assert(train.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("resumable batched build covers the key space exactly once") {
    import spark.implicits._
    val base = Files.createTempDirectory("build").toString
    val (data, ledger) = (s"$base/data", s"$base/ledger")
    // target space: (level, weight) grid, the reference's (N, k) shape
    val target = (for { n <- 1 to 6; k <- 1 to 5 } yield (n, k)).toDF("level", "weight")
    // "compute": a deterministic record per key (stands in for the math)
    def compute(missing: org.apache.spark.sql.DataFrame) =
      missing.withColumn("dim", col("level") * col("weight"))
        .withColumn("coeffs", expr("transform(sequence(1, 4), i -> CAST(level * i + weight AS DOUBLE))"))

    // three interrupted batches of 12, then a final catch-all pass
    val counts = Iterator.continually(
      BuildPipeline.run(spark, target, Seq("level", "weight"), data, ledger,
        batchId = "b", batchSize = 12)(compute)).takeWhile(_ > 0).toList
    assert(counts.sum === 30, s"computed ${counts.sum} of 30 keys: $counts")
    assert(counts.forall(_ <= 12))

    // store is complete, keyed once each, and key-partition-pruned reads work
    val store = BuildPipeline.store(spark, data)
    assert(store.count() === 30)
    assert(store.select("level", "weight").distinct().count() === 30)
    val pruned = store.where(col("level") === 3 && col("weight") === 2)
    assert(pruned.count() === 1)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    // the array-valued column (coefficient list) survives the round-trip
    assert(pruned.select(expr("coeffs[3]")).head().getDouble(0) === 3.0 * 4 + 2)

    // a fresh pass after completion is a no-op (resume safety)
    assert(BuildPipeline.run(spark, target, Seq("level", "weight"), data, ledger,
      batchId = "b2")(compute) === 0)
  }
}
