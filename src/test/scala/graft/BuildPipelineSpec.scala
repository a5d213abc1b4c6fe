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

  test("five-modality crawl cycle: ingest loops + Ledger resume + curation + shards, idempotent") {
    // The engine's headline story in one scenario: a crawl arrives as
    // per-modality batches; a Ledger-gated driver loop runs each batch
    // through its ingest loop (gate → in-batch dedup → corpus probe →
    // land → index append); the driver DIES mid-crawl; a resumed pass
    // completes exactly the missing batches; the landed text corpus then
    // flows through curation into the shard layout. Asserts: resume
    // correctness (ledger covers every batch exactly once, nothing
    // re-ran), content correctness (every modality landed exactly its
    // unique content keys, duplicates collapsed within AND across
    // batches), idempotence (a third pass does nothing; re-ingesting a
    // done batch admits zero), and layout reproducibility (re-running
    // the shard layout yields identical rows).
    import graft.sources.{AssetIngest, AudioCodec, CurationPipeline, ImageCodec, Ledger, VideoCodec}
    import spark.implicits._
    val base = Files.createTempDirectory("crawl5").toString
    val ledgerPath = s"$base/ledger"

    // content synthesis per modality, keyed so equal keys mean duplicate
    // content; 60 disjoint tokens pass the text quality gate. Texts are
    // DIGIT-FREE (digits spelled as letters): curation's redaction maps
    // every digit run to <NUM>, and digit-keyed tokens would collapse
    // all documents into one identical post-redaction text
    def alpha(n: Long): String = n.toString.map(c => ('a' + (c - '0')).toChar)
    def text(key: Long) = (1 to 60).map(t => s"k${alpha(key)}q${alpha(t.toLong)}").mkString(" ")
    def image(key: Long) = ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key, 20, 20))
    def audio(key: Long) = {
      val rnd = new scala.util.Random(key)
      AudioCodec.encodeWavPcm16(Array.fill(300)((rnd.nextInt(65536) - 32768).toShort))
    }
    def video(key: Long) = VideoCodec.encodeContainer((0 until 3).map(f =>
      ImageCodec.encodeGrayPng(16, 16, ImageCodec.texturedLuma(key * 131 + f, 16, 16))))
    def embed(key: Long) = {
      val rnd = new scala.util.Random(key * 7919 + 13)
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n).toFloat)
    }
    // batch plan shared by all modalities: batch 1 plants an in-batch
    // dup (key 2 twice), batch 2 a cross-batch dup (key 1 again), batch
    // 3 is novel — unique content keys {1, 2, 3, 4}, so each modality
    // must land exactly 4 assets
    val batchKeys = Map(1 -> Seq(1L, 2L, 2L), 2 -> Seq(1L, 3L), 3 -> Seq(4L))
    val uniqueKeys = 4
    def ids(modality: String, bno: Int): Seq[Long] = {
      val off = Seq("audio", "embed", "image", "text", "video").indexOf(modality) * 1000L
      batchKeys(bno).zipWithIndex.map { case (_, i) => off + bno * 10L + i }
    }
    def runBatch(modality: String, bno: Int): Unit = {
      val keyed = ids(modality, bno).zip(batchKeys(bno))
      // every loop also feeds the per-modality sketch ledgers, keyed by
      // the batch number — the crawl dashboard accounting
      val sink = Some(AssetIngest.SketchSink(s"$base/$modality/sketch", s"b$bno"))
      modality match {
        case "text" => AssetIngest.ingestTextBatch(spark,
          keyed.map { case (id, k) => (id, "a", text(k)) }.toDF("doc_id", "source", "text"),
          s"$base/text/idx", s"$base/text/data", sketches = sink)
        case "image" => AssetIngest.ingestImageBatch(spark,
          keyed.map { case (id, k) => (id, image(k)) }.toDF("asset_id", "payload"),
          s"$base/image/idx", s"$base/image/data", sketches = sink)
        case "audio" => AssetIngest.ingestAudioBatch(spark,
          keyed.map { case (id, k) => (id, audio(k)) }.toDF("asset_id", "payload"),
          s"$base/audio/idx", s"$base/audio/data", minSamples = 100, sketches = sink)
        case "video" => AssetIngest.ingestVideoBatch(spark,
          keyed.map { case (id, k) => (id, video(k)) }.toDF("asset_id", "payload"),
          s"$base/video/idx", s"$base/video/data", sketches = sink)
        case "embed" => AssetIngest.ingestEmbedBatch(spark,
          keyed.map { case (id, k) => (id, "x", embed(k)) }.toDF("vec_id", "label", "embedding"),
          s"$base/embed/idx", s"$base/embed/data", sketches = sink)
      }
      ()
    }
    val modalities = Seq("audio", "embed", "image", "text", "video")
    val target = modalities.flatMap(m => (1 to 3).map(m -> _)).toDF("modality", "bno")
    final case class PlantedDeath() extends RuntimeException("driver died mid-crawl")
    // one batch per Ledger step, deterministic order, optional planted death
    def driverPass(passId: String, dieAt: Option[(String, Int)]): Long = {
      var total = 0L
      var n = 1L
      while (n > 0) {
        n = Ledger.step(spark, target, Seq("modality", "bno"), ledgerPath, passId) { todo =>
          val next = todo.orderBy("modality", "bno").limit(1).collect()
          next.foreach { r =>
            val key = (r.getString(0), r.getInt(1))
            if (dieAt.contains(key)) throw PlantedDeath()
            runBatch(key._1, key._2)
          }
          next.map(r => (r.getString(0), r.getInt(1))).toSeq.toDF("modality", "bno")
        }
        total += n
      }
      total
    }
    // pass 1 dies at (video, 2) — alphabetical order means 13 of 15
    // batches complete first
    intercept[PlantedDeath] { driverPass("pass1", dieAt = Some(("video", 2))) }
    val afterCrash = spark.read.parquet(ledgerPath)
    assert(afterCrash.count() === 13, "crashed pass recorded the wrong batch count")
    assert(afterCrash.where($"modality" === "video" && $"bno" >= 2).count() === 0,
      "the dying step must not reach the ledger")
    // pass 2 resumes: exactly the 2 missing batches run, nothing re-runs
    assert(driverPass("pass2", dieAt = None) === 2)
    val ledger = spark.read.parquet(ledgerPath)
    assert(ledger.count() === 15)
    assert(ledger.select("modality", "bno").distinct().count() === 15,
      "a batch was recorded twice — resume re-ran completed work")
    // pass 3 is a no-op — the build is complete
    assert(driverPass("pass3", dieAt = None) === 0)
    // every modality landed EXACTLY its unique content keys
    def landedIds(path: String, idCol: String): Set[Long] =
      spark.read.parquet(path).select(idCol).as[Long].collect().toSet
    val landed = Map(
      "text" -> landedIds(s"$base/text/data/docs", "doc_id"),
      "image" -> landedIds(s"$base/image/data/assets", "asset_id"),
      "audio" -> landedIds(s"$base/audio/data/assets", "asset_id"),
      "video" -> landedIds(s"$base/video/data/assets", "asset_id"),
      "embed" -> landedIds(s"$base/embed/data/vectors", "vec_id"))
    landed.foreach { case (m, s) =>
      assert(s.size === uniqueKeys, s"$m landed ${s.size} assets, expected $uniqueKeys: $s")
    }
    // sketch accounting landed: each modality's distinct-id ledger agrees
    // with the EXACT landed sets (HLL is exact at this cardinality), its
    // `rows` bookkeeping with the admitted count, and the quantile ledger
    // serves a sane size metric — all from sketch bytes, no corpus read
    import graft.sources.SketchLedger
    modalities.foreach { m =>
      val d = SketchLedger.distinctByKey(spark, s"$base/$m/sketch/distinct").head()
      assert(d.getLong(d.fieldIndex("distinct_est")) === uniqueKeys.toLong,
        s"$m: distinct ledger disagrees with landed set")
      assert(d.getLong(d.fieldIndex("rows")) === uniqueKeys.toLong,
        s"$m: ledger rows bookkeeping disagrees with admitted count")
      assert(SketchLedger.quantileTotal(spark, s"$base/$m/sketch/size", 0.5) > 0.0)
    }
    // content-level idempotence: re-ingesting a completed batch admits 0 —
    // and the retried crawl leaves the sketch ledgers unmoved (nothing
    // novel means nothing appended; estimates AND exact rows identical)
    val textLedger = () => (
      SketchLedger.distinctByKey(spark, s"$base/text/sketch/distinct")
        .collect().map(_.toSeq).toSeq,
      SketchLedger.quantileByKey(spark, s"$base/text/sketch/size", Seq(0.5, 0.99))
        .collect().map(_.toSeq).toSeq)
    val ledgerBefore = textLedger()
    val retry = AssetIngest.ingestTextBatch(spark,
      ids("text", 1).zip(batchKeys(1)).map { case (id, k) => (id, "a", text(k)) }
        .toDF("doc_id", "source", "text"),
      s"$base/text/idx", s"$base/text/data",
      sketches = Some(AssetIngest.SketchSink(s"$base/text/sketch", "b1")))
    assert(retry.admitted === 0 && retry.corpusDups + retry.inBatchDups === 3)
    assert(textLedger() === ledgerBefore,
      "a retried fully-ingested batch moved the sketch ledgers")
    // last mile: landed text corpus → curation → reproducible shard layout
    val sfDir = s"$base/cursf"
    spark.read.parquet(s"$base/text/data/docs")
      .select(col("doc_id"), col("text"), lit("en").as("lang"), col("source"),
        length(col("text")).as("n_chars"))
      .write.parquet(s"$sfDir/documents.parquet")
    val layout = CurationPipeline.pretrainingLayout(spark, sfDir,
      rates = Map("a" -> 2.0), shards = 4)
    val shardsPath = s"$base/shards"
    CurationPipeline.writeShards(layout, shardsPath)
    // partition-column inference reads `shard` back as int — cast to the
    // layout's bigint so the row comparison is type-honest
    val readBack = spark.read.parquet(shardsPath)
      .select(col("shard").cast("long"), col("pos"), col("doc_id"), col("epoch"))
      .orderBy("shard", "pos").collect().toSeq
    assert(readBack.nonEmpty)
    // rate 2.0 — every curated doc appears exactly twice across shards
    assert(readBack.length === landed("text").size * 2)
    val again = CurationPipeline.pretrainingLayout(spark, sfDir,
      rates = Map("a" -> 2.0), shards = 4)
      .select("shard", "pos", "doc_id", "epoch").orderBy("shard", "pos")
      .collect().toSeq
    assert(readBack === again, "shard layout not reproducible across runs")
  }

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

  test("multimodal pair curation: both sides gated, dup images collapsed, splits leak-free") {
    import graft.sources.{CurationPipeline, ImageCodec}
    val sf = "/root/testdata/sf0.001"
    // textured assets with planted perceptual dups (the dedup fixture)
    val assets = ImageCodec.dedupAssets(spark, sf)
    val pairs = CurationPipeline.curateImagePairs(spark, sf, assets)
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    val curatedIds = CurationPipeline.curate(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // alignment: every pair's text side survived text curation, and its
    // split matches the text side's (no leakage through the image)
    assert(rows.forall(r => curatedIds.contains(r.getAs[Long]("doc_id"))))
    val splitByDoc = CurationPipeline.curate(spark, sf)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r => splitByDoc(r.getAs[Long]("doc_id")) == r.getAs[String]("split")))
    // perceptual dedup: planted dup partners (larger id of each pair)
    // are collapsed — at most one of (5m, 5m+4) appears
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val dupPairs = SparkEntry.queries("q_image_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    dupPairs.foreach { case (a, b) =>
      assert(!(ids.contains(a) && ids.contains(b)),
        s"near-dup images $a and $b both survived pair curation")
    }
    // every landed image decodes and sits in the envelope
    rows.take(20).foreach { r =>
      val d = ImageCodec.decodeLuma(r.getAs[Array[Byte]]("image"))
      assert(d.isDefined && d.get.width >= 8 && d.get.height >= 8)
    }
  }

  test("pretraining layout: mixture rates, salted shard scatter, dense reproducible order") {
    import graft.sources.CurationPipeline
    val sf = "/root/testdata/sf0.001"
    val sources = Tables.documents(spark, sf).select("source").distinct()
      .collect().map(_.getString(0)).sorted
    // drop one source entirely, keep one exactly, up-sample one 2x
    val rates = sources.zipWithIndex.map { case (s, i) =>
      s -> Seq(0.0, 1.0, 2.0, 0.5)(i % 4)
    }.toMap
    val layout = CurationPipeline.pretrainingLayout(spark, sf, rates, shards = 4)
    val rows = layout.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_._4)
    val curatedCounts = CurationPipeline.curate(spark, sf, 0.3)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (src, rate) =>
      val emitted = bySource.get(src).map(_.length).getOrElse(0)
      val n = curatedCounts.getOrElse(src, 0L)
      if (rate == 0.0) assert(emitted === 0, s"$src: rate 0 must drop everything")
      if (rate == 1.0) assert(emitted === n, s"$src: rate 1 must keep all once")
      if (rate == 2.0) assert(emitted === 2 * n, s"$src: rate 2 must emit two epochs")
    }
    // dense per-shard positions, shards within range
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 4)
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // up-sampled epochs of the same doc scatter: not all copies co-shard
    val epochShards = rows.filter(_._5 >= 1).groupBy(r => (r._3, r._4))
      .values.filter(_.length > 1).map(_.map(_._1).distinct.length)
    assert(epochShards.exists(_ > 1), "epoch salt failed to scatter copies")
    // reproducible end to end
    val again = CurationPipeline.pretrainingLayout(spark, sf, rates, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getString(5)))
    assert(rows.sorted.toSeq === again.sorted.toSeq)
    // shard-partitioned landing: loader reads one directory per shard
    val out = Files.createTempDirectory("layout").toString + "/l"
    CurationPipeline.writeShards(layout, out)
    val s0 = spark.read.parquet(out).where(col("shard") === 0)
    assert(s0.count() > 0)
    assert(s0.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("token-budgeted pretraining layout: best-scored prefix only, unique tokens fit the budget") {
    import graft.sources.CurationPipeline
    val sf = "/root/testdata/sf0.001"
    val sources = Tables.documents(spark, sf).select("source").distinct()
      .collect().map(_.getString(0))
    val rates = sources.map(_ -> 1.0).toMap
    val budget = 2000L
    val cut = CurationPipeline.pretrainingLayout(spark, sf, rates, shards = 4,
      tokenBudget = Some(budget)).collect()
    assert(cut.nonEmpty)
    // unique docs' token sum fits the budget (epochs replicate WITHIN the cut)
    val uniq = cut.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tok")).toMap
    assert(uniq.values.map(_.toLong).sum <= budget,
      s"budgeted layout exceeds the token budget: ${uniq.values.sum} > $budget")
    // the kept set is the best-first prefix of the curated corpus: no
    // dropped doc outscores a kept one (ties at the boundary allowed)
    val scores = CurationPipeline.curate(spark, sf).select("doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uniq.size < scores.size, "budget cut kept everything — test budget too large")
    val minKept = uniq.keySet.map(scores).min
    assert((scores.keySet -- uniq.keySet).forall(d => scores(d) <= minKept + 1e-12),
      "a dropped doc outscores a kept one — not a best-first prefix")
    // no budget → the full curated corpus flows through, one row per doc at rate 1.0
    val plain = CurationPipeline.pretrainingLayout(spark, sf, rates, shards = 4).count()
    assert(plain === scores.size.toLong)
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
