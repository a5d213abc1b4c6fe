package graft

import java.nio.file.Files

import graft.sources.{Ledger, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LedgerMultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ledger drives a build loop to completion") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/ledger"
    // target key space: (n, k) grid — the reference's (level, weight) shape
    val target = (for { n <- 1 to 5; k <- 1 to 4 } yield (n, k)).toDF("n", "k")
    // step 1: compute only n <= 2
    val done1 = Ledger.step(spark, target.where($"n" <= 2), Seq("n", "k"), dir, "b1")(identity)
    assert(done1 === 8)
    // global missing check
    val miss = Ledger.missing(target, Ledger.load(spark, dir, target, Seq("n", "k")), Seq("n", "k"))
    assert(miss.count() === 12)
    // step 2: everything else
    val done2 = Ledger.step(spark, target, Seq("n", "k"), dir, "b2")(identity)
    assert(done2 === 12)
    // step 3: nothing left — idempotent
    assert(Ledger.step(spark, target, Seq("n", "k"), dir, "b3")(identity) === 0)
  }

  test("ledger step() records exactly the keys it counts under a nondeterministic transform") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger_nd").toString + "/ledger"
    val target = (1 to 1000).toDF("k")
    // nondeterministic transform: keeps a random ~half of the todo keys.
    // Without the localCheckpoint in step(), the count and the recorded
    // ledger rows would re-execute this plan and disagree.
    val nd = (df: org.apache.spark.sql.DataFrame) => df.where(rand() < 0.5)
    val n1 = Ledger.step(spark, target, Seq("k"), dir, "nd1")(nd)
    val ledger1 = Ledger.load(spark, dir, target, Seq("k"))
    assert(ledger1.count() === n1, "recorded keys must equal the returned count")
    // and the next step sees exactly the complement
    val n2 = Ledger.step(spark, target, Seq("k"), dir, "nd2")(identity)
    assert(n1 + n2 === 1000)
  }

  test("ledger missing() stays correct when target and computed share lineage") {
    import spark.implicits._
    val t = (1 to 10).toDF("k")
    val c = t.where(col("k") <= 4) // derived from t: same plan lineage
    assert(Ledger.missing(t, c, Seq("k")).count() === 6)
  }

  test("ledger missing() is null-safe on key components") {
    import spark.implicits._
    val target = Seq((Some(1), "a"), (None, "b")).toDF("n", "tag")
    val computed = Seq((Option.empty[Int], "b")).toDF("n", "tag")
    val miss = Ledger.missing(target, computed, Seq("n", "tag")).collect()
    assert(miss.length === 1 && miss.head.getString(1) === "a")
  }

  test("multimodal assets carry binary payload + typed metadata") {
    val assets = Multimodal.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    assert(assets.schema("payload").dataType.typeName === "binary")
    val r = assets.orderBy("asset_id").head()
    assert(r.getAs[Array[Byte]]("payload").length === r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes"))
  }

  test("feature extraction is deterministic and partitioning-invariant") {
    val assets = Multimodal.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    val f1 = Multimodal.extractFeatures(assets).orderBy("asset_id")
      .select("asset_id", "features").collect()
    val f2 = Multimodal.extractFeatures(assets.repartition(7))
      .orderBy("asset_id").select("asset_id", "features").collect()
    assert(f1.length === assets.count())
    assert(f1.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq ===
      f2.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)
    // features are fixed-width and bounded
    assert(f1.forall(_.getSeq[Float](1).length === 16))
  }

  test("extracted features join back to embeddings (multimodal pipeline)") {
    val assets = Multimodal.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(assets)
    val joined = feats.join(Tables.embeddings(spark, "/root/testdata/sf0.001"),
      col("asset_id") === col("vec_id"))
    assert(joined.count() > 0)
  }

  test("frame sampling streams every Nth fixed-size chunk with stable indices") {
    val assets = Multimodal.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    val frames = Multimodal.sampleFrames(assets, frameBytes = 64, everyN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getAs[Array[Byte]](3)))
    assert(frames.nonEmpty)
    // only even frame indices survive everyN=2, and no frame exceeds the size
    assert(frames.forall { case (_, idx, f) => idx % 2 === 0 && f.length <= 64 })
    // per asset: kept count matches ceil(bytes/64) sampled every 2nd
    val bytesPer = assets.select("asset_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    val perAsset = frames.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perAsset.forall { case (id, n) =>
      val nf = math.max(1, (bytesPer(id) + 63) / 64)
      n === (nf + 1) / 2
    })
    // frame 0 is the payload prefix
    val first = frames.filter(f => f._1 === 0L && f._2 === 0).head._3
    val payload0 = assets.where(col("asset_id") === 0).select("payload")
      .head().getAs[Array[Byte]](0)
    assert(first.toSeq === payload0.take(64).toSeq)
  }

  test("resize stub bounds payload and keeps metadata in sync") {
    val assets = Multimodal.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    val resized = Multimodal.resizeToBytes(assets, targetBytes = 100)
      .select(col("asset_id"), length(col("payload")).as("len"), col("meta.n_bytes").as("nb"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(resized.nonEmpty)
    assert(resized.forall { case (_, len, nb) => len <= 100 && nb <= 100 && nb >= len })
  }

  test("partition sizing survives inputs whose plan stats are unreliable") {
    val assets = Multimodal.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    // RDD-backed plan: Catalyst reports defaultSizeInBytes (Long.MaxValue)
    // for LogicalRDD — the stats fast path must NOT trust it (it would
    // clamp to 10000 near-empty tasks) and fall back to the meta.n_bytes
    // aggregate, giving the same task count as the file-backed plan
    val rddBacked = spark.createDataFrame(assets.rdd, assets.schema)
    val filePartCount = Multimodal.extractFeatures(assets).rdd.getNumPartitions
    val rddPartCount = Multimodal.extractFeatures(rddBacked).rdd.getNumPartitions
    assert(rddPartCount === filePartCount,
      s"unreliable stats inflated task count: $rddPartCount vs $filePartCount")
    assert(rddPartCount < 100)
  }
}
