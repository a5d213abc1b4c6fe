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

  // ------------------------------------------------------------------
  // Landing→index-append crash law (r16 verdict next-round #1): every
  // ingest loop lands via a per-batch dynamic-partition overwrite, so a
  // crash BETWEEN landing and index append re-runs WITHOUT duplicating
  // the landed rows — no Ledger wiring required of the caller. One
  // fixture per modality; each kills the loop in the window (the
  // AssetIngest.failAfterLanding fault), retries, and asserts
  // (a) no id landed twice, (b) the index converged to the landed set,
  // (c) a third run admits zero.
  // ------------------------------------------------------------------

  /** One modality's crash-retry drive. `ingest` runs the loop over
    * (ids → batch df); `landedTable`/`indexTable` are the paths (under
    * data/index dirs) holding the landed and indexed id columns. */
  private def crashRetryLaw(tag: String,
      mkBatch: Seq[Long] => org.apache.spark.sql.DataFrame,
      ingest: (org.apache.spark.sql.DataFrame, String, String) => graft.sources.AssetIngest.IngestReport,
      landedTable: String, landedId: String,
      indexTable: String, indexId: String): Unit = {
    import graft.sources.AssetIngest
    val base = Files.createTempDirectory(s"crashland_$tag").toString
    val (idx, data) = (s"$base/idx", s"$base/data")
    def landedCounts: Map[Long, Long] = {
      val p = new java.io.File(s"$data/$landedTable")
      if (!p.exists()) Map.empty
      else spark.read.parquet(s"$data/$landedTable").groupBy(landedId).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    def indexedIds: Set[Long] = {
      val p = new java.io.File(s"$idx/$indexTable")
      if (!p.exists()) Set.empty
      else spark.read.parquet(s"$idx/$indexTable").select(indexId).distinct()
        .collect().map(_.getLong(0)).toSet
    }
    // seed the corpus so the crashing batch exercises the APPEND path
    val r0 = ingest(mkBatch(Seq(1L, 2L)), idx, data)
    assert(r0.admitted === 2, s"$tag: seed batch not admitted")
    // kill between landing and index append
    AssetIngest.failAfterLanding = true
    intercept[IllegalStateException] { ingest(mkBatch(Seq(3L, 4L)), idx, data) }
    assert(landedCounts.keySet === Set(1L, 2L, 3L, 4L),
      s"$tag: crash landed the batch exactly once before dying")
    assert(indexedIds === Set(1L, 2L),
      s"$tag: index must NOT contain the crashed batch")
    // retry the same logical batch: probe sees nothing indexed, re-admits,
    // and the idempotent landing REPLACES its own partition
    val r1 = ingest(mkBatch(Seq(3L, 4L)), idx, data)
    assert(r1.admitted === 2, s"$tag: retry must re-admit the crashed batch")
    val counts = landedCounts
    assert(counts.keySet === Set(1L, 2L, 3L, 4L), s"$tag: landed set diverged")
    assert(counts.values.forall(_ == 1L),
      s"$tag: retry duplicated landed rows: $counts")
    assert(indexedIds === Set(1L, 2L, 3L, 4L),
      s"$tag: index did not converge on retry")
    // a third run is a fully-successful retry: self-healing zero admit
    val r2 = ingest(mkBatch(Seq(3L, 4L)), idx, data)
    assert(r2.admitted === 0, s"$tag: fully-ingested retry admitted rows")
    assert(landedCounts.values.forall(_ == 1L), s"$tag: third run re-landed")
  }

  test("compactLanding folds batch partitions outside the retry horizon; both crash windows heal without loss or lasting duplicates") {
    import graft.sources.AssetIngest
    import spark.implicits._
    val base = Files.createTempDirectory("compactland").toString
    val (idx, data) = (s"$base/idx", s"$base/data")
    def batch(ids: Seq[Long]) = ids.map(i => (i, "s",
      (1 to 60).map(t => s"k${i}_$t").mkString(" "))).toDF("doc_id", "source", "text")
    def landedDocs: Seq[Long] = spark.read.parquet(s"$data/docs")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def partitions: Set[String] = new java.io.File(s"$data/docs").listFiles()
      .filter(_.getName.startsWith("ingest_batch="))
      .map(_.getName.stripPrefix("ingest_batch=")).toSet
    // three batches under explicit ids; b2 stays inside the retry horizon
    AssetIngest.ingestTextBatch(spark, batch(Seq(1L, 2L)), idx, data, batchId = Some("b0"))
    AssetIngest.ingestTextBatch(spark, batch(Seq(3L, 4L)), idx, data, batchId = Some("b1"))
    AssetIngest.ingestTextBatch(spark, batch(Seq(5L, 6L)), idx, data, batchId = Some("b2"))
    assert(partitions === Set("b0", "b1", "b2"))
    val before = landedDocs

    // plain fold: b0+b1 consolidate, b2 (retained) is untouched
    val folded = AssetIngest.compactLanding(spark, s"$data/docs", retain = Set("b2"))
    assert(folded === Seq("b0", "b1"))
    assert(landedDocs === before, "fold changed the landed rows")
    val p1 = partitions
    assert(p1.contains("b2") && p1.size === 2 &&
      p1.exists(_.startsWith("compacted_")), s"unexpected layout: $p1")

    // land more, then CRASH WINDOW 1 (data written, marker missing):
    // heal must drop the partial fold and re-fold without loss
    AssetIngest.ingestTextBatch(spark, batch(Seq(7L, 8L)), idx, data, batchId = Some("b3"))
    AssetIngest.failDuringCompact = 1
    intercept[IllegalStateException] {
      AssetIngest.compactLanding(spark, s"$data/docs", retain = Set("b3"))
    }
    val folded2 = AssetIngest.compactLanding(spark, s"$data/docs", retain = Set("b3"))
    assert(folded2.nonEmpty, "heal+refold did nothing after crash window 1")
    assert(landedDocs === (before ++ Seq(7L, 8L)).sorted,
      s"crash window 1 lost or duplicated rows: $landedDocs")
    val p2 = partitions
    assert(p2.contains("b3") && p2.count(_.startsWith("compacted_")) === 1,
      s"layout did not converge after window 1: $p2")

    // CRASH WINDOW 2 (marker written, sources not yet deleted): readers
    // may briefly see duplicates; the next call finishes the deletes
    AssetIngest.ingestTextBatch(spark, batch(Seq(9L, 10L)), idx, data, batchId = Some("b4"))
    AssetIngest.failDuringCompact = 2
    intercept[IllegalStateException] {
      AssetIngest.compactLanding(spark, s"$data/docs", retain = Set.empty)
    }
    // the documented bounded window: fold data + undeleted sources are
    // BOTH visible (duplicates), never a loss
    val windowCount = spark.read.parquet(s"$data/docs").count()
    assert(windowCount > before.size + 4,
      s"window 2 should show transient duplicates, saw $windowCount rows")
    assert(landedDocs.distinct === (before ++ Seq(7L, 8L, 9L, 10L)).sorted,
      "window 2 lost rows")
    AssetIngest.compactLanding(spark, s"$data/docs", retain = Set.empty)
    assert(landedDocs === (before ++ Seq(7L, 8L, 9L, 10L)).sorted,
      s"crash window 2 did not heal: $landedDocs")
    val p3 = partitions
    assert(p3.size === 1 && p3.head.startsWith("compacted_"),
      s"steady state should be one consolidated partition: $p3")
    // idempotent: nothing left to fold
    assert(AssetIngest.compactLanding(spark, s"$data/docs", retain = Set.empty).isEmpty)
  }

  test("deleteFromLanding removes victims from only their partitions; every crash window heals without losing survivors") {
    import graft.sources.AssetIngest
    import spark.implicits._
    val base = Files.createTempDirectory("takedown").toString
    val (idx, data) = (s"$base/idx", s"$base/data")
    val docs = s"$data/docs"
    def batch(ids: Seq[Long]) = ids.map(i => (i, "s",
      (1 to 60).map(t => s"k${i}_$t").mkString(" "))).toDF("doc_id", "source", "text")
    def landedDocs: Seq[Long] = spark.read.parquet(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    AssetIngest.ingestTextBatch(spark, batch(Seq(1L, 2L, 3L)), idx, data, batchId = Some("b0"))
    AssetIngest.ingestTextBatch(spark, batch(Seq(4L, 5L)), idx, data, batchId = Some("b1"))
    // untouched-partition discipline: b1's files must be byte-identical
    // after a takedown that only hits b0
    def b1Files: Set[(String, Long, Long)] =
      new java.io.File(s"$docs/ingest_batch=b1").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    val b1Before = b1Files
    assert(AssetIngest.deleteFromLanding(spark, docs, Seq(2L).toDF("id"), "doc_id") === 1L)
    assert(landedDocs === Seq(1L, 3L, 4L, 5L))
    assert(b1Files === b1Before, "takedown rewrote an unaffected partition")
    // absent victim: no-op, returns 0
    assert(AssetIngest.deleteFromLanding(spark, docs, Seq(99L).toDF("id"), "doc_id") === 0L)

    // window 1 (survivors written, nothing moved): heal drops the tmp,
    // originals intact; a re-issued takedown completes
    AssetIngest.failDuringTakedown = 1
    intercept[IllegalStateException] {
      AssetIngest.deleteFromLanding(spark, docs, Seq(3L).toDF("id"), "doc_id")
    }
    assert(landedDocs === Seq(1L, 3L, 4L, 5L), "window 1 changed the table")
    assert(AssetIngest.deleteFromLanding(spark, docs, Seq(3L).toDF("id"), "doc_id") === 1L)
    assert(landedDocs === Seq(1L, 4L, 5L))

    // window 2 (first partition moved out, survivors not yet moved in):
    // the heal at the next call's head completes the swap — survivors
    // reappear, the victim stays gone — and the re-issue is a no-op
    AssetIngest.failDuringTakedown = 2
    intercept[IllegalStateException] {
      AssetIngest.deleteFromLanding(spark, docs, Seq(4L).toDF("id"), "doc_id")
    }
    assert(AssetIngest.deleteFromLanding(spark, docs, Seq(4L).toDF("id"), "doc_id") === 0L)
    assert(landedDocs === Seq(1L, 5L), "window 2 lost survivors or kept the victim")

    // window 3 (all swaps done, roots not yet dropped): heal just cleans
    AssetIngest.failDuringTakedown = 3
    intercept[IllegalStateException] {
      AssetIngest.deleteFromLanding(spark, docs, Seq(5L).toDF("id"), "doc_id")
    }
    assert(AssetIngest.deleteFromLanding(spark, docs, Seq(5L).toDF("id"), "doc_id") === 0L)
    assert(landedDocs === Seq(1L))
    assert(!new java.io.File(s"${docs}__takedown_tmp").exists() &&
      !new java.io.File(s"${docs}__takedown_trash").exists(),
      "takedown left sibling roots behind")
  }

  test("composed takedown: landing + index tombstones + ledger annotation; every crash window re-issuable") {
    import graft.sources.{AssetIngest, SketchLedger, Tombstones}
    import spark.implicits._
    val base = Files.createTempDirectory("ctakedown").toString
    val (idx, data, sink) = (s"$base/idx", s"$base/data", s"$base/sink")
    val docs = s"$data/docs"
    def batch(ids: Seq[Long]) = ids.map(i => (i, s"src${i % 2}",
      (1 to 60).map(t => s"k${i}_$t").mkString(" "))).toDF("doc_id", "source", "text")
    def landedDocs: Seq[Long] = spark.read.parquet(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def tombs: Set[Long] = Tombstones.read(spark, idx)
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
    def adjs: Map[String, (Long, Double)] =
      AssetIngest.takedownAdjustments(spark, sink, Seq("source")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    AssetIngest.ingestTextBatch(spark, batch(Seq(1L, 2L, 3L, 4L, 5L)), idx, data,
      sketches = Some(AssetIngest.SketchSink(sink, "b0")))
    assert(landedDocs === Seq(1L, 2L, 3L, 4L, 5L))
    assert(adjs.isEmpty, "no takedowns yet - adjustments must be an empty frame")
    val gross = SketchLedger.sumByKey(spark, s"$sink/sum").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(1)))).toMap

    // the happy path: one call hits all three tiers
    val r1 = AssetIngest.takedown(spark, docs, idx, Seq(2L, 3L).toDF("id"), "doc_id",
      sketchDir = Some(sink), keys = Seq("source"), sizeMetric = col("n_tok"))
    assert(r1.removed === 2L)
    assert(landedDocs === Seq(1L, 4L, 5L))
    assert(tombs === Set(2L, 3L))
    assert(adjs === Map("src0" -> ((1L, 60.0)), "src1" -> ((1L, 60.0))))
    // a full retry of the same takedown is a no-op everywhere
    val r2 = AssetIngest.takedown(spark, docs, idx, Seq(2L, 3L).toDF("id"), "doc_id",
      sketchDir = Some(sink), keys = Seq("source"), sizeMetric = col("n_tok"))
    assert(r2.removed === 0L && r2.takedownId === r1.takedownId)
    assert(adjs === Map("src0" -> ((1L, 60.0)), "src1" -> ((1L, 60.0))),
      "a retried takedown must not inflate the adjustments")

    // window 1: annotation written, tombstones + delete not - re-issue
    // completes; the duplicate annotation is absorbed by the per-id max
    AssetIngest.failDuringComposedTakedown = 1
    intercept[IllegalStateException] {
      AssetIngest.takedown(spark, docs, idx, Seq(4L).toDF("id"), "doc_id",
        sketchDir = Some(sink), keys = Seq("source"), sizeMetric = col("n_tok"))
    }
    assert(landedDocs === Seq(1L, 4L, 5L) && !tombs.contains(4L))
    val r3 = AssetIngest.takedown(spark, docs, idx, Seq(4L).toDF("id"), "doc_id",
      sketchDir = Some(sink), keys = Seq("source"), sizeMetric = col("n_tok"))
    assert(r3.removed === 1L)
    assert(adjs("src0") === ((2L, 120.0)), "window-1 retry inflated the annotation")

    // window 2: tombstones written, delete not - the index already
    // forgot the victim; the re-issue finishes the payload half and its
    // re-annotation (smaller or equal counts, same id) is absorbed
    AssetIngest.failDuringComposedTakedown = 2
    intercept[IllegalStateException] {
      AssetIngest.takedown(spark, docs, idx, Seq(5L).toDF("id"), "doc_id",
        sketchDir = Some(sink), keys = Seq("source"), sizeMetric = col("n_tok"))
    }
    assert(tombs.contains(5L) && landedDocs.contains(5L))
    val r4 = AssetIngest.takedown(spark, docs, idx, Seq(5L).toDF("id"), "doc_id",
      sketchDir = Some(sink), keys = Seq("source"), sizeMetric = col("n_tok"))
    assert(r4.removed === 1L)
    assert(landedDocs === Seq(1L))

    // the net law the annotation exists for: gross ledger minus the
    // adjustments equals the surviving corpus, per key, exactly
    val a = adjs
    val remaining = spark.read.parquet(docs)
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum(col("n_tok").cast("double")).as("toks"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for (src <- gross.keys) {
      val (gRows, gSize) = gross(src)
      val (aRows, aSize) = a.getOrElse(src, (0L, 0.0))
      val (nRows, nSize) = remaining.getOrElse(src, (0L, 0.0))
      assert(gRows - aRows === nRows, s"$src net rows diverged")
      assert(gSize - aSize === nSize, s"$src net size diverged")
    }
  }

  test("crash between landing and index append: image loop retries without duplicate landings") {
    import graft.sources.{AssetIngest, ImageCodec}
    import spark.implicits._
    crashRetryLaw("image",
      ids => ids.map(i => (i, ImageCodec.encodeGrayPng(16, 16,
        ImageCodec.texturedLuma(i * 31 + 7, 16, 16)))).toDF("asset_id", "payload"),
      (b, idx, data) => AssetIngest.ingestImageBatch(spark, b, idx, data),
      "assets", "asset_id", "hashes", "asset_id")
  }

  test("crash between landing and index append: audio loop retries without duplicate landings") {
    import graft.sources.{AssetIngest, AudioCodec}
    import spark.implicits._
    crashRetryLaw("audio",
      ids => ids.map(i => (i, AudioCodec.encodeWavPcm16(
        Array.tabulate(500)(t => AudioCodec.sampleAt(i, t))))).toDF("asset_id", "payload"),
      (b, idx, data) => AssetIngest.ingestAudioBatch(spark, b, idx, data),
      "assets", "asset_id", "hashes", "asset_id")
  }

  test("crash between landing and index append: video loop retries without duplicate landings") {
    import graft.sources.{AssetIngest, ImageCodec, VideoCodec}
    import spark.implicits._
    crashRetryLaw("video",
      ids => ids.map(i => (i, VideoCodec.encodeContainer((0 until 3).map(f =>
        ImageCodec.encodeGrayPng(16, 16,
          ImageCodec.texturedLuma(i * 991 + f * 17 + 5, 16, 16))))))
        .toDF("asset_id", "payload"),
      (b, idx, data) => AssetIngest.ingestVideoBatch(spark, b, idx, data),
      "assets", "asset_id", "grouped", "asset_id")
  }

  test("crash between landing and index append: embedding loop retries without duplicate landings") {
    import graft.sources.AssetIngest
    import spark.implicits._
    def unitOf(key: Long): Array[Float] = {
      val r = new scala.util.Random(key * 7919 + 13)
      val v = Array.fill(12)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n).toFloat)
    }
    crashRetryLaw("embed",
      ids => ids.map(i => (i, (i % 3).toString, unitOf(i)))
        .toDF("vec_id", "label", "embedding"),
      (b, idx, data) => AssetIngest.ingestEmbedBatch(spark, b, idx, data),
      "vectors", "vec_id", "embeddings", "vec_id")
  }

  test("crash between landing and index append: text loop retries without duplicate landings") {
    import graft.sources.AssetIngest
    import spark.implicits._
    crashRetryLaw("text",
      ids => ids.map(i => (i, "s",
        (1 to 60).map(t => s"k${i}_$t").mkString(" "))).toDF("doc_id", "source", "text"),
      (b, idx, data) => AssetIngest.ingestTextBatch(spark, b, idx, data),
      "docs", "doc_id", "cbuckets", "doc_id")
  }
}
