package graft

import graft.sources.{AudioCodec, ImageCodec, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec seam: javax.imageio PNG and javax.sound WAV round-trips,
  * decode-failure containment, perceptual dedup planting, and the
  * real-decode feature codec plugged into Multimodal.extractFeatures. */
class MultimodalCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  // ---- local (no-Spark) codec laws ----

  test("PNG round-trip recovers exact gray samples") {
    val p = ImageCodec.pattern(docId = 42, nChars = 137)
    val luma = ImageCodec.render(p)
    val png = ImageCodec.encodeGrayPng(p.w, p.h, luma)
    val d = ImageCodec.decodeLuma(png).get
    assert(d.width === p.w && d.height === p.h && d.channels === 1)
    assert(d.luma.toSeq === luma.toSeq)
  }

  test("RGB PNG decodes through the Rec.601 integer luma path") {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, (x * 40 << 16) | (y * 100 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = ImageCodec.decodeLuma(bos.toByteArray).get
    assert(d.channels === 3)
    // (299r + 587g + 114b) / 1000, integer division
    assert(d.luma(0) === (299 * 0 + 587 * 0 + 114 * 200) / 1000)
    assert(d.luma(4 + 3) === (299 * 120 + 587 * 100 + 114 * 200) / 1000)
  }

  test("corrupt and null image payloads decode to None, never throw") {
    assert(ImageCodec.decodeLuma(null).isEmpty)
    assert(ImageCodec.decodeLuma(Array[Byte](1, 2, 3)).isEmpty)
    val png = ImageCodec.encodeGrayPng(4, 4, Array.fill(16)(7))
    assert(ImageCodec.decodeLuma(png.take(png.length / 2)).isEmpty)
  }

  test("WAV round-trip recovers exact PCM16 samples and format") {
    val samples = Array.tabulate(300)(i => AudioCodec.sampleAt(9L, i))
    val wav = AudioCodec.encodeWavPcm16(samples)
    val d = AudioCodec.decodeWav(wav).get
    assert(d.sampleRate === AudioCodec.SampleRate && d.channels === 1)
    assert(d.samples.toSeq === samples.toSeq)
  }

  test("header peeks agree with full decode and never inflate pixels/samples") {
    // image: gray and RGB headers
    val p = ImageCodec.pattern(7L, 99L)
    val png = ImageCodec.encodeGrayPng(p.w, p.h, ImageCodec.render(p))
    assert(ImageCodec.peekDims(png) === Some((p.w, p.h, 1)))
    val rgb = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    assert(ImageCodec.peekDims(bos.toByteArray) === Some((5, 3, 3)))
    assert(ImageCodec.peekDims(Array[Byte](1, 2)) === None)
    assert(ImageCodec.peekDims(null) === None)
    // audio: header frame count equals decoded per-channel frames
    val wav = AudioCodec.encodeWavPcm16(Array.tabulate(321)(i => AudioCodec.sampleAt(3L, i)))
    assert(AudioCodec.peekFormat(wav) === Some((16000, 1, 321L)))
    assert(AudioCodec.peekFormat(Array[Byte](82, 73)) === None)
    // video: per-frame dims off headers equal the decoded stats' dims
    import graft.sources.VideoCodec
    val assets = VideoCodec.videoAssets(spark, sf)
    val dims = VideoCodec.videoFrameDims(assets)
      .orderBy("asset_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val stats = VideoCodec.videoFrameStats(assets)
      .orderBy("asset_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dims.toSeq === stats.toSeq)
  }

  test("multichannel WAV reports per-channel frame count (duration envelope stays honest)") {
    // stereo PCM16: 100 frames x 2 channels = 400 bytes of sample data;
    // n_samples must be 100, not 200
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val pcm = Array.tabulate[Byte](400)(i => (i % 64).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val d = AudioCodec.decodeWav(out.toByteArray).get
    assert(d.channels === 2 && d.samples.length === 200 && d.frames === 100)
    import spark.implicits._
    val ann = AudioCodec.annotateDecoded(
      Seq((1L, out.toByteArray)).toDF("asset_id", "payload")).collect().head
    assert(ann.getInt(ann.fieldIndex("n_samples")) === 100)
  }

  test("corrupt and non-PCM16 audio payloads decode to None, never throw") {
    assert(AudioCodec.decodeWav(null).isEmpty)
    assert(AudioCodec.decodeWav(Array[Byte](82, 73, 70, 70)).isEmpty)
    // an 8-bit WAV is a valid container but not our sample format
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.fill[Byte](100)(64)), fmt8, 100L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(AudioCodec.decodeWav(out.toByteArray).isEmpty)
  }

  test("aHash is invariant under re-encode and sensitive to different textures") {
    import graft.sources.HashBanding
    val luma = ImageCodec.texturedLuma(123L, 24, 24)
    val h1 = ImageCodec.aHash256(ImageCodec.decodeLuma(ImageCodec.encodeGrayPng(24, 24, luma)).get)
    val h2 = ImageCodec.aHash256(ImageCodec.decodeLuma(ImageCodec.encodeGrayPng(24, 24, luma)).get)
    assert(h1.toSeq === h2.toSeq)
    val other = ImageCodec.texturedLuma(124L, 24, 24)
    val h3 = ImageCodec.aHash256(ImageCodec.decodeLuma(ImageCodec.encodeGrayPng(24, 24, other)).get)
    assert(HashBanding.hamming(h1, h3) > HashBanding.DefaultMaxHamming,
      "distinct textures must not collide")
  }

  // ---- Spark-side: declared queries' engine paths ----

  test("imageStats matches the closed-form pattern arithmetic (real decode)") {
    val stats = ImageCodec.imageStats(ImageCodec.imageAssets(spark, sf))
      .orderBy("asset_id").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").orderBy("doc_id").collect()
    assert(stats.length === docs.length)
    stats.zip(docs).foreach { case (s, doc) =>
      val p = ImageCodec.pattern(doc.getLong(0), doc.getLong(1))
      assert(s.getLong(0) === doc.getLong(0))
      assert(s.getBoolean(s.fieldIndex("ok")))
      assert(s.getLong(s.fieldIndex("width")) === p.w)
      assert(s.getLong(s.fieldIndex("height")) === p.h)
      assert(s.getLong(s.fieldIndex("channels")) === 1L)
      assert(s.getLong(s.fieldIndex("sum_luma")) === p.k * p.a + (p.nPixels - p.k) * p.b)
      val hist = s.getSeq[Long](s.fieldIndex("hist"))
      assert(hist.sum === p.nPixels)
      if ((p.a >> 4) == (p.b >> 4)) assert(hist(p.a >> 4) === p.nPixels)
      else assert(hist(p.a >> 4) + hist(p.b >> 4) === p.nPixels)
    }
  }

  test("imageStats contains corrupt payloads as ok=false rows") {
    import spark.implicits._
    val good = ImageCodec.encodeGrayPng(8, 8, Array.fill(64)(10))
    val rows = Seq(
      (1L, "image", good),
      (2L, "image", Array[Byte](9, 9, 9)),
      (3L, "image", null.asInstanceOf[Array[Byte]]),
    ).toDF("asset_id", "modality", "payload")
    val out = ImageCodec.imageStats(rows).orderBy("asset_id").collect()
    assert(out.map(_.getBoolean(out.head.fieldIndex("ok"))).toSeq === Seq(true, false, false))
    assert(out(1).isNullAt(out(1).fieldIndex("sum_luma")))
  }

  test("perceptual dedup output == all pairs with true hamming <= threshold (banding recall is exact)") {
    // The engine's contract: 16x16-bit banding + popcount filter returns
    // EXACTLY the pairs at Hamming distance <= threshold (pigeonhole
    // guarantees every pair at <= 15 shares a band). Compute the ground
    // truth locally from the same deterministic assets and compare as
    // sets.
    import graft.sources.HashBanding
    val t = HashBanding.DefaultMaxHamming
    val hashes = ImageCodec.imageHashes(ImageCodec.dedupAssets(spark, sf))
      .where(col("ok")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val expected = (for {
      i <- hashes.indices.iterator
      j <- (i + 1) until hashes.length
      ham = HashBanding.hamming(hashes(i)._2, hashes(j)._2)
      if ham <= t
    } yield (hashes(i)._1, hashes(j)._1, ham.toLong)).toSet
    val pairs = ImageCodec.perceptualDupPairs(
      ImageCodec.imageHashes(ImageCodec.dedupAssets(spark, sf)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === expected)
    // fixture sanity: every exact planted pair (key-shared, unperturbed)
    // must be present at hamming 0, and near-dup planting must land at
    // least some pairs under the threshold
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val exact = (0L until nDocs by 10).map(m => (m, m + 4)).filter(_._2 < nDocs)
    exact.foreach { case (a, b) =>
      assert(pairs.contains((a, b, 0L)), s"exact planted pair ($a, $b) missing")
    }
    val near = (5L until nDocs by 10).map(m => (m, m + 4)).filter(_._2 < nDocs)
    val nearFound = near.count(p => pairs.exists(q => q._1 == p._1 && q._2 == p._2))
    assert(nearFound >= near.size / 2,
      s"only $nearFound/${near.size} near-dup plantings under the threshold — perturbation too strong")
    // distinct textures must not collide: no more than a handful of
    // non-planted pairs
    val plantedSet = (exact ++ near).toSet
    val spurious = pairs.filterNot(p => plantedSet.contains((p._1, p._2)))
    assert(spurious.size <= 5, s"${spurious.size} spurious pairs: $spurious")
  }

  test("banding recall law: every pair within Hamming <= 15 is recovered at its exact distance") {
    import graft.sources.HashBanding
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 40 planted pairs: a random 256-bit hash and a copy with 0..15
    // distinct bit flips — pigeonhole (16 bands) must recover every one
    val planted = (0 until 40).map { i =>
      val a = Array.fill(HashBanding.Words)(rnd.nextLong())
      val flips = rnd.shuffle((0 until 256).toList)
        .take(rnd.nextInt(HashBanding.MaxGuaranteedHamming + 1))
      val b = a.clone()
      flips.foreach(p => b(p >> 6) ^= (1L << (p & 63)))
      (i.toLong, a, b, flips.size.toLong)
    }
    val df = planted.flatMap { case (i, a, b, _) => Seq((2 * i, a), (2 * i + 1, b)) }
      .toDF("asset_id", "ahash")
    val got = HashBanding.pairs(df, HashBanding.MaxGuaranteedHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    planted.foreach { case (i, _, _, d) =>
      assert(got.contains((2 * i, 2 * i + 1, d)),
        s"planted pair at hamming $d not recovered — banding recall broken")
    }
    // and nothing else: distinct random 256-bit hashes sit ~128 bits apart
    assert(got.size === planted.count(_._4 <= HashBanding.MaxGuaranteedHamming))
  }

  test("bucketStats surfaces flooded band buckets with their true populations") {
    import graft.sources.HashBanding
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 20 identical hashes flood ONE bucket of every band; 30 random
    // hashes are background noise (random 16-bit band values collide
    // with the flood value with negligible probability at this size)
    val flood = Array.fill(HashBanding.Words)(rnd.nextLong())
    val rows = (0 until 20).map(i => (i.toLong, flood)) ++
      (100 until 130).map(i =>
        (i.toLong, Array.fill(HashBanding.Words)(rnd.nextLong())))
    val stats = HashBanding.bucketStats(rows.toDF("asset_id", "ahash"), perBand = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byBand = stats.groupBy(_._1)
    assert(byBand.keySet === (0 until HashBanding.Bands).toSet)
    (0 until HashBanding.Bands).foreach { b =>
      val rowsB = byBand(b)
      assert(rowsB.length <= 3, s"band $b returned ${rowsB.length} rows")
      // top row is the planted flood bucket at its true population
      val expectVal = (flood(b / 4) >>> ((b % 4) * 16)) & 0xFFFFL
      assert(rowsB.head === ((b, expectVal, 20L)),
        s"band $b top bucket ${rowsB.head} != planted flood ($expectVal, 20)")
    }
  }

  test("image dedup clusters: planted pairs share a cluster, distinct textures are singletons") {
    val rows = SparkEntry.queries("q_image_dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byAsset = rows.map(r => r._1 -> r).toMap
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length === nDocs)
    // every planted (5m, 5m+4) pair that the pairwise query finds must
    // sit in one cluster whose id is the least member
    val pairs = SparkEntry.queries("q_image_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(byAsset(a)._2 === byAsset(b)._2, s"pair ($a, $b) split across clusters")
      assert(byAsset(a)._2 <= a, "cluster id must be the least member")
    }
    // assets in no pair are singletons
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    rows.filterNot(r => paired.contains(r._1)).foreach { r =>
      assert(r._2 === r._1 && r._3 === 1L, s"unpaired asset ${r._1} not a singleton: $r")
    }
    // and cluster member counts agree with the grouping
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.forall(_._3 === members.length.toLong),
        s"cluster $comp member-count mismatch")
    }
  }

  /** Union-find ground truth with min-root union, so each component's
    * root is its least member — the cluster-id convention the declared
    * cluster views promise. */
  private def unionFindRoots(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long] ++ nodes.map(n => n -> n)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("audio and video dedup clusters equal union-find over their declared pair graphs") {
    // cluster law: each declared cluster view must partition EXACTLY as
    // union-find over the corresponding declared pair query — same
    // components, least-member cluster ids, matching member counts
    def law(clusterQ: String, pairQ: String): Unit = {
      val rows = SparkEntry.queries(clusterQ)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val edges = SparkEntry.queries(pairQ)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.nonEmpty && edges.nonEmpty, s"$clusterQ/$pairQ law vacuous")
      val roots = unionFindRoots(rows.map(_._1).toIndexedSeq, edges.toIndexedSeq)
      val sizes = roots.values.toSeq.groupBy(identity).map { case (k, v) => k -> v.length }
      rows.foreach { case (id, cluster, members) =>
        assert(cluster === roots(id),
          s"$clusterQ: $id in cluster $cluster, union-find says ${roots(id)}")
        assert(members === sizes(roots(id)).toLong,
          s"$clusterQ: $id members $members, union-find says ${sizes(roots(id))}")
      }
    }
    law("q_audio_dedup_clusters", "q_audio_dedup")
    law("q_video_dedup_clusters", "q_video_dedup")
  }

  test("audioStats matches the closed-form sample plan (real decode)") {
    val stats = AudioCodec.audioStats(AudioCodec.audioAssets(spark, sf))
      .orderBy("asset_id").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").orderBy("doc_id").collect()
    stats.zip(docs).foreach { case (s, doc) =>
      val id = doc.getLong(0)
      val n = AudioCodec.sampleCount(id, doc.getLong(1))
      val abs = (0 until n).map(i => math.abs(AudioCodec.sampleAt(id, i).toLong))
      assert(s.getLong(s.fieldIndex("n_samples")) === n.toLong)
      assert(s.getLong(s.fieldIndex("sample_rate")) === 16000L)
      assert(s.getLong(s.fieldIndex("sum_abs")) === abs.sum)
      assert(s.getLong(s.fieldIndex("peak")) === abs.max)
    }
  }

  test("ImageFeatureCodec drives extractFeatures with real decode (partitioning-invariant)") {
    val assets = ImageCodec.imageAssets(spark, sf)
    val f1 = Multimodal.extractFeatures(assets, ImageCodec.ImageFeatureCodec, dim = 8)
      .orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(assets.repartition(7), ImageCodec.ImageFeatureCodec, dim = 8)
      .orderBy("asset_id").collect()
    assert(f1.length === f2.length && f1.length > 0)
    f1.zip(f2).foreach { case (a, b) =>
      val va = a.getSeq[Float](2)
      assert(va === b.getSeq[Float](2), "features must not depend on partitioning")
      assert(math.abs(va.sum - 1f) < 1e-5f, "histogram must normalize to 1")
    }
    // a corrupt payload maps to the zero vector, not a task failure
    import spark.implicits._
    val bad = Seq((99L, "image", Array[Byte](0, 1, 2))).toDF("asset_id", "modality", "payload")
      .withColumn("meta", struct(lit("image/png").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(3L).as("n_bytes")))
    val fb = Multimodal.extractFeatures(bad, ImageCodec.ImageFeatureCodec, dim = 8).collect()
    assert(fb.head.getSeq[Float](2).forall(_ == 0f))
  }

  test("video container round-trips frames and tolerates corruption") {
    import graft.sources.VideoCodec
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val enc = VideoCodec.encodeContainer(frames)
    assert(VideoCodec.decodeContainer(enc).map(_.toSeq) === frames.map(_.toSeq))
    // truncated tail: parsed prefix survives, no throw
    assert(VideoCodec.decodeContainer(enc.dropRight(1)).map(_.toSeq) === frames.take(2).map(_.toSeq))
    // bad magic / null / tiny: empty
    assert(VideoCodec.decodeContainer(Array[Byte](9, 9, 9, 9, 0, 0, 0, 1)).isEmpty)
    assert(VideoCodec.decodeContainer(null).isEmpty)
    assert(VideoCodec.decodeContainer(Array[Byte](1)).isEmpty)
  }

  test("videoFrameStats decodes every frame to its closed-form stats; everyN samples") {
    import graft.sources.VideoCodec
    val assets = VideoCodec.videoAssets(spark, sf)
    val stats = VideoCodec.videoFrameStats(assets).orderBy("asset_id", "frame_idx").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").orderBy("doc_id").collect()
    val expected = docs.flatMap { doc =>
      val id = doc.getLong(0)
      (0 until VideoCodec.frameCount(id)).map { f =>
        val p = VideoCodec.framePattern(id, doc.getLong(1), f)
        (id, f.toLong, p.w.toLong, p.h.toLong, p.k * p.a + (p.nPixels - p.k) * p.b)
      }
    }
    assert(stats.length === expected.length)
    stats.zip(expected).foreach { case (s, e) =>
      assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4)) === e)
    }
    // frame sampling keeps exactly the 0 mod N indices
    val sampled = VideoCodec.videoFrameStats(assets, everyN = 2).collect()
    assert(sampled.forall(_.getLong(1) % 2 == 0))
    assert(sampled.length === expected.count(_._2 % 2 == 0))
  }

  test("video dedup: re-encodes pair on all frames, truncations at best alignment, no spurious pairs") {
    import graft.sources.VideoCodec
    val pairs = SparkEntry.queries("q_video_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val planted = (0L until nDocs by 5).map(m => (m, m + 4)).filter(_._2 < nDocs).toSet
    // exact re-encoded copies (even pair index): all 4 frames align
    planted.filter(_._1 % 10 == 0).foreach { case (a, b) =>
      val hit = pairs.find(p => p._1 == a && p._2 == b)
      assert(hit.exists(p => p._3 == 4 && p._4 == 4 && p._5 == 4),
        s"re-encoded pair ($a, $b) expected 4/4 aligned frames, got $hit")
    }
    // truncated copies (odd pair index): 3 of the shorter side's 3 frames
    // align at delta 0 — full-fraction match of the truncation
    planted.filter(_._1 % 10 == 5).foreach { case (a, b) =>
      val hit = pairs.find(p => p._1 == a && p._2 == b)
      assert(hit.exists(p => p._3 == 3 && Set(p._4, p._5) == Set(3L, 4L)),
        s"truncated pair ($a, $b) expected 3 aligned of (3, 4) frames, got $hit")
    }
    // distinct textures must not pair
    val spurious = pairs.filterNot(p => planted.contains((p._1, p._2)))
    assert(spurious.isEmpty, s"spurious video pairs: ${spurious.mkString(",")}")
  }

  test("static videos pair at full fraction with ONE banded row per video (no frame^2 blowup)") {
    import graft.sources.VideoCodec
    import spark.implicits._
    // screencast shape: one frame repeated 64 times. A pair of these
    // must be found as a full-fraction dup — and the collapsed engine
    // must band ONE row per video, not 64. maxBucket = 3 is the proof:
    // an uncollapsed engine would put 128 identical-hash rows in one
    // bucket and trip the cap; the collapsed engine's buckets hold at
    // most the two videos sharing the texture.
    def static(key: Long, n: Int): Array[Byte] = {
      val f = ImageCodec.encodeGrayPng(16, 16, ImageCodec.texturedLuma(key, 16, 16))
      VideoCodec.encodeContainer(Seq.fill(n)(f))
    }
    val assets = Seq(
      (1L, "video", static(7L, 64)), (2L, "video", static(7L, 64)),
      (3L, "video", static(8L, 64))).toDF("asset_id", "modality", "payload")
    val pairs = VideoCodec.videoDupPairs(
        VideoCodec.videoFrameHashes(assets), maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(pairs.toSet === Set((1L, 2L, 64L, 64L, 64L)),
      s"static pair not detected at full weight: ${pairs.mkString(",")}")
    // and the persisted index stores the collapsed form: 1 grouped row
    // per video, each carrying ONE collapsed frame entry (not 64)
    val dir = java.nio.file.Files.createTempDirectory("vidstatic").toString + "/idx"
    VideoCodec.writeVideoHashIndex(spark, assets, dir)
    val g = spark.read.parquet(s"$dir/grouped")
    assert(g.count() === 3)
    assert(g.select(size(col("chashes"))).as[Int].collect().toSeq === Seq(1, 1, 1))
    val hits = VideoCodec.dedupVideosAgainstIndex(
        spark, Seq((10L, "video", static(7L, 32))).toDF("asset_id", "modality", "payload"),
        dir, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a 32-frame cut of the static video matches both stored copies at
    // weight min(32, 64) = 32 — full fraction of the shorter side
    assert(hits === Set((10L, 1L, 32L), (10L, 2L, 32L)), s"got $hits")
  }

  test("video dedup vote semantics: containment pairs a contained clip, symmetric mode does not") {
    import graft.sources.VideoCodec
    import spark.implicits._
    // a 40-frame video and the 3-frame clip cut from its head (distinct
    // textures per frame, so only the planted overlap matches)
    def frame(f: Int): Array[Byte] =
      ImageCodec.encodeGrayPng(16, 16, ImageCodec.texturedLuma(f * 5077L + 3, 16, 16))
    val long = VideoCodec.encodeContainer((0 until 40).map(frame))
    val clip = VideoCodec.encodeContainer((0 until 3).map(frame))
    val assets = Seq((1L, "video", clip), (2L, "video", long))
      .toDF("asset_id", "modality", "payload")
    val hashes = VideoCodec.videoFrameHashes(assets).localCheckpoint(false)
    def run(symmetric: Boolean, minMatched: Long = 0L) =
      VideoCodec.videoDupPairs(hashes, symmetric = symmetric,
          minMatchedFrames = minMatched)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // CONTAINMENT (default): 3 aligned >= least(3, 40) * 0.5 — pairs
    assert(run(symmetric = false) === Set((1L, 2L, 3L)))
    // SYMMETRIC: 3 aligned < greatest(3, 40) * 0.5 = 20 — no pair
    assert(run(symmetric = true) === Set.empty)
    // absolute floor: containment mode but the 3-frame overlap is below
    // minMatchedFrames — no pair
    assert(run(symmetric = false, minMatched = 4L) === Set.empty)
    // the index probe honors the same dial
    val dir = java.nio.file.Files.createTempDirectory("vidsym").toString + "/idx"
    VideoCodec.writeVideoHashIndex(spark,
      Seq((2L, "video", long)).toDF("asset_id", "modality", "payload"), dir)
    val probe = Seq((1L, "video", clip)).toDF("asset_id", "modality", "payload")
    assert(VideoCodec.dedupVideosAgainstIndex(spark, probe, dir).count() === 1)
    assert(VideoCodec.dedupVideosAgainstIndex(spark, probe, dir,
      symmetric = true).count() === 0)
  }

  test("frame-uid packing fails loudly on out-of-range frame index or asset id") {
    import graft.sources.VideoCodec
    import spark.implicits._
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    def assertRaises(hashed: org.apache.spark.sql.DataFrame): Unit = {
      val ex = intercept[Exception] { VideoCodec.videoDupPairs(hashed).count() }
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("frame uid out of range")),
        s"expected the uid-range error, got: $ex")
    }
    val hash = Array.fill(4)(0x5a5a5a5a5a5a5a5aL)
    // a frame index at 2^20 (a >9.7h video under everyN's original
    // indices) would alias into asset_id + 1's uid space
    assertRaises(Seq((1L, 1L << 20, hash), (2L, 0L, hash))
      .toDF("asset_id", "frame_idx", "ahash"))
    // a negative asset id would pack into a negative uid
    assertRaises(Seq((-1L, 0L, hash), (2L, 0L, hash))
      .toDF("asset_id", "frame_idx", "ahash"))
    // an asset id past 2^43 overflows the packing
    assertRaises(Seq((Long.MaxValue / (1L << 20) + 1L, 0L, hash), (2L, 0L, hash))
      .toDF("asset_id", "frame_idx", "ahash"))
    // the append path guards stored rows the same way
    val dir = java.nio.file.Files.createTempDirectory("viduid").toString + "/idx"
    // video meta carries the grouped layout stamp (r12); an unstamped
    // meta would fail the layout check before the uid-range guard runs
    graft.sources.HashBanding.writeMeta(spark, dir,
      graft.sources.IndexMeta.GroupedLayout)
    val exApp = intercept[Exception] {
      VideoCodec.appendVideoHashes(spark,
        Seq((1L, 1L << 20, hash)).toDF("asset_id", "frame_idx", "ahash"), dir)
    }
    assert(chain(exApp).exists(t => t.getMessage != null &&
      t.getMessage.contains("frame uid out of range")))
    // in-range ids on the same paths still work
    assert(VideoCodec.videoDupPairs(
      Seq((1L, (1L << 20) - 1, hash), (2L, 0L, hash))
        .toDF("asset_id", "frame_idx", "ahash")).count() === 1)
  }

  test("videoFrameStats fan-out matches the inline shape; frame hashes are alignment-stable") {
    import graft.sources.VideoCodec
    val assets = VideoCodec.dedupAssets(spark, sf)
    val spread = VideoCodec.videoFrameStats(assets).orderBy("asset_id", "frame_idx").collect()
    val inline = VideoCodec.videoFrameStats(assets, fanout = false)
      .orderBy("asset_id", "frame_idx").collect()
    assert(spread.length === inline.length && spread.length > 0)
    spread.zip(inline).foreach { case (a, b) => assert(a === b) }
  }

  test("imageGateStream admits only decodable in-envelope assets (MemoryStream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val good = ImageCodec.encodeGrayPng(16, 16, Array.fill(256)(100))   // in envelope
    val tiny = ImageCodec.encodeGrayPng(4, 4, Array.fill(16)(100))      // below minSide
    val corrupt = Array[Byte](1, 2, 3)
    mem.addData((1L, good), (2L, tiny), (3L, corrupt), (4L, null))
    val gated = graft.streaming.StreamingOps.imageGateStream(
      mem.toDF().toDF("asset_id", "payload"), minSide = 8, maxSide = 64)
    val q = gated.writeStream.format("memory").queryName("img_gate")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("img_gate").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getInt(out.head.fieldIndex("width")) === 16)
  }

  test("q_image_knn ranking matches local ground truth on decoded features") {
    val feats = Multimodal.extractFeatures(
      ImageCodec.imageAssets(spark, sf), ImageCodec.ImageFeatureCodec, dim = 16)
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](2).toArray))
    val qf = feats.find(_._1 == 0L).get._2
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val expected = feats.filter(_._1 != 0L)
      .map { case (id, f) => (id, BigDecimal(dot(f, qf)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(10).map(_._1).toSeq
    val got = SparkEntry.queries("q_image_knn")(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(got === expected)
  }

  test("resizeImages nearest-neighbor samples exactly, syncs meta, passes corrupt through") {
    import spark.implicits._
    val src = ImageCodec.texturedLuma(7L, 16, 12)
    val png = ImageCodec.encodeGrayPng(16, 12, src)
    val rows = Seq((1L, "image", png), (2L, "image", Array[Byte](3, 3)))
      .toDF("asset_id", "modality", "payload")
      .withColumn("meta", struct(lit("image/png").as("mime"),
        lit(16).as("width"), lit(12).as("height"),
        octet_length(col("payload")).cast("long").as("n_bytes")))
    val out = ImageCodec.resizeImages(rows, 8, 6).orderBy("asset_id").collect()
    val resized = ImageCodec.decodeLuma(out(0).getAs[Array[Byte]]("payload")).get
    assert(resized.width === 8 && resized.height === 6)
    val expected = Array.tabulate(8 * 6) { i =>
      val x = i % 8; val y = i / 8
      src((y * 12 / 6) * 16 + x * 16 / 8)
    }
    assert(resized.luma.toSeq === expected.toSeq)
    val meta = out(0).getStruct(out(0).fieldIndex("meta"))
    assert(meta.getInt(1) === 8 && meta.getInt(2) === 6)
    assert(meta.getLong(3) === out(0).getAs[Array[Byte]]("payload").length.toLong)
    // corrupt passes through byte-identical
    assert(out(1).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](3, 3))
    // identity resize reproduces the source plane exactly
    val same = ImageCodec.resizeImages(rows.where($"asset_id" === 1L), 16, 12).collect()
    assert(ImageCodec.decodeLuma(same(0).getAs[Array[Byte]]("payload")).get.luma.toSeq === src.toSeq)
  }

  test("audio dedup output == all pairs with true hamming <= threshold; planted re-levels found") {
    import graft.sources.HashBanding
    val t = HashBanding.DefaultMaxHamming
    val hashes = AudioCodec.audioHashes(AudioCodec.dedupAssets(spark, sf))
      .where(col("ok")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val expected = (for {
      i <- hashes.indices.iterator
      j <- (i + 1) until hashes.length
      ham = HashBanding.hamming(hashes(i)._2, hashes(j)._2)
      if ham <= t
    } yield (hashes(i)._1, hashes(j)._1, ham.toLong)).toSet
    val pairs = SparkEntry.queries("q_audio_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === expected)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // exact copies must pair at hamming 0
    (0L until nDocs by 10).map(m => (m, m + 4)).filter(_._2 < nDocs).foreach { case (a, b) =>
      assert(pairs.contains((a, b, 0L)), s"exact planted clip pair ($a, $b) missing")
    }
    // 3/4-volume re-levels: envelope threshold is scale-invariant up to
    // integer floors, so most must land under the hamming cap
    val near = (5L until nDocs by 10).map(m => (m, m + 4)).filter(_._2 < nDocs)
    val nearFound = near.count(p => pairs.exists(q => q._1 == p._1 && q._2 == p._2))
    assert(nearFound >= near.size / 2,
      s"only $nearFound/${near.size} re-levelled clips found")
  }

  test("image hash index lifecycle: build, probe, append, delete, compact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("imghash").toString + "/idx"
    def assetRow(id: Long, key: Long): (Long, String, Array[Byte]) =
      (id, "image", ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key, 20, 20)))
    def df(rows: (Long, String, Array[Byte])*) = rows.toDF("asset_id", "modality", "payload")

    // corpus: keys 1..10 under ids 1..10
    val corpus = df((1L to 10L).map(k => assetRow(k, k)): _*)
    ImageCodec.writeImageHashIndex(spark, corpus, dir)

    // probe: id 100 duplicates key 3, id 101 is fresh, id 102 corrupt
    val batch = df(assetRow(100L, 3L), assetRow(101L, 999L))
      .union(df((102L, "image", Array[Byte](1, 2))))
    val hits = ImageCodec.dedupImagesAgainstIndex(spark, batch, dir).collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === Set((100L, 3L, 0L)))

    // append the novel asset; a copy of it now flags
    ImageCodec.appendToImageHashIndex(spark, df(assetRow(101L, 999L)), dir)
    val hits2 = ImageCodec.dedupImagesAgainstIndex(spark, df(assetRow(200L, 999L)), dir).collect()
    assert(hits2.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((200L, 101L)))

    // delete key 3's asset: its duplicate no longer flags (takedown honored)
    ImageCodec.deleteFromImageHashIndex(spark, Seq(3L).toDF("asset_id"), dir)
    val hits3 = ImageCodec.dedupImagesAgainstIndex(spark, df(assetRow(300L, 3L)), dir).collect()
    assert(hits3.isEmpty, s"deleted corpus image still vetoes: ${hits3.mkString}")

    // the lifecycle law: probe after delete == probe of a from-scratch
    // index built without the deleted asset
    val fresh = java.nio.file.Files.createTempDirectory("imghash_fresh").toString + "/idx"
    ImageCodec.writeImageHashIndex(spark,
      corpus.where($"asset_id" =!= 3L).union(df(assetRow(101L, 999L))), fresh)
    val probe = df(assetRow(400L, 3L), assetRow(401L, 999L), assetRow(402L, 7L))
    val viaTomb = ImageCodec.dedupImagesAgainstIndex(spark, probe, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaFresh = ImageCodec.dedupImagesAgainstIndex(spark, probe, fresh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaTomb === viaFresh)

    // compact folds tombstones in and clears them; probes unchanged
    ImageCodec.compactImageHashIndex(spark, dir)
    assert(!graft.sources.Tombstones.exists(spark, dir))
    val viaCompacted = ImageCodec.dedupImagesAgainstIndex(spark, probe, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaCompacted === viaFresh)
    assert(spark.read.parquet(s"$dir/hashes").where($"asset_id" === 3L).count() === 0)
  }

  test("audio hash index lifecycle: build, probe, append, delete, compact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audhash").toString + "/idx"
    // seeded-PRNG clips: sampleAt plans are phase shifts of one stride
    // sequence, so their envelopes genuinely correlate within a few bits
    // — a dedup-index fixture needs independent clips per key
    def clipSamples(key: Long): Array[Short] = {
      val rnd = new scala.util.Random(key)
      Array.fill(200)((rnd.nextInt(65536) - 32768).toShort)
    }
    def clipRow(id: Long, key: Long): (Long, String, Array[Byte]) =
      (id, "audio", AudioCodec.encodeWavPcm16(clipSamples(key)))
    def df(rows: (Long, String, Array[Byte])*) = rows.toDF("asset_id", "modality", "payload")

    // corpus: sample plans 1..10 under ids 1..10
    val corpus = df((1L to 10L).map(k => clipRow(k, k)): _*)
    AudioCodec.writeAudioHashIndex(spark, corpus, dir)

    // probe: id 100 duplicates plan 3 exactly, id 101 is the same clip at
    // 3/4 volume (the envelope-invariance near-dup), id 102 is fresh,
    // id 103 corrupt
    val relevel = (101L, "audio", AudioCodec.encodeWavPcm16(
      clipSamples(5L).map(v => (v * 3 / 4).toShort)))
    val batch = df(clipRow(100L, 3L), relevel, clipRow(102L, 999L))
      .union(df((103L, "audio", Array[Byte](1, 2))))
    val hits = AudioCodec.dedupAudioAgainstIndex(spark, batch, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((100L, 3L), (101L, 5L)),
      s"expected the exact copy and the re-level to flag, got $hits")

    // append the novel clip; a copy of it now flags
    AudioCodec.appendToAudioHashIndex(spark, df(clipRow(102L, 999L)), dir)
    val hits2 = AudioCodec.dedupAudioAgainstIndex(spark, df(clipRow(200L, 999L)), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits2 === Set((200L, 102L)))

    // delete plan 3's clip: its duplicate re-admits (takedown honored)
    AudioCodec.deleteFromAudioHashIndex(spark, Seq(3L).toDF("asset_id"), dir)
    assert(AudioCodec.dedupAudioAgainstIndex(spark, df(clipRow(300L, 3L)), dir)
      .collect().isEmpty, "deleted corpus clip still vetoes")

    // lifecycle law: probe after delete == probe of a from-scratch index
    // built without the deleted clip; compaction preserves it and clears
    // the tombstones
    val fresh = java.nio.file.Files.createTempDirectory("audhash_fresh").toString + "/idx"
    AudioCodec.writeAudioHashIndex(spark,
      corpus.where($"asset_id" =!= 3L).union(df(clipRow(102L, 999L))), fresh)
    val probe = df(clipRow(400L, 3L), clipRow(401L, 999L), clipRow(402L, 7L))
    def probeSet(d: String) = AudioCodec.dedupAudioAgainstIndex(spark, probe, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaFresh = probeSet(fresh)
    assert(probeSet(dir) === viaFresh)
    AudioCodec.compactAudioHashIndex(spark, dir)
    assert(!graft.sources.Tombstones.exists(spark, dir))
    assert(probeSet(dir) === viaFresh)
    assert(spark.read.parquet(s"$dir/hashes").where($"asset_id" === 3L).count() === 0)

    // meta guard: an index stamped with foreign banding refuses to probe
    Seq((4, 16)).toDF("bands", "bits").write.mode("overwrite").parquet(s"$dir/meta")
    val ex = intercept[IllegalArgumentException] {
      AudioCodec.dedupAudioAgainstIndex(spark, probe, dir)
    }
    assert(ex.getMessage.contains("unsupported index banding"))
  }

  test("audioGateStream admits only PCM16 in-envelope clips; AudioFeatureCodec normalizes envelope") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good = AudioCodec.encodeWavPcm16(Array.tabulate(500)(i => AudioCodec.sampleAt(1L, i)))
    val short = AudioCodec.encodeWavPcm16(Array.tabulate(10)(i => AudioCodec.sampleAt(2L, i)))
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData((1L, good), (2L, short), (3L, Array[Byte](9, 9)), (4L, null))
    val gated = graft.streaming.StreamingOps.audioGateStream(
      mem.toDF().toDF("asset_id", "payload"), minSamples = 100, maxSamples = 1000)
    val q = gated.writeStream.format("memory").queryName("aud_gate")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("aud_gate").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getInt(out.head.fieldIndex("n_samples")) === 500)
    // feature codec: constant-amplitude clip → flat envelope at |v|/32768
    val const = AudioCodec.encodeWavPcm16(Array.fill(256)(8192.toShort))
    val f = AudioCodec.AudioFeatureCodec.features(const, 8)
    assert(f.toSeq === Seq.fill(8)(8192f / 32768f))
    assert(AudioCodec.AudioFeatureCodec.features(Array[Byte](1), 8).forall(_ == 0f))
  }

  test("imageDedupProbeStream flags corpus dups exactly once; tombstoned takedowns re-admit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("imgstream").toString + "/idx"
    def img(key: Long): Array[Byte] =
      ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key, 20, 20))
    val corpus = (1L to 5L).map(k => (k, "image", img(k)))
      .toDF("asset_id", "modality", "payload")
    ImageCodec.writeImageHashIndex(spark, corpus, dir)

    def runProbe(rows: (Long, Array[Byte])*): Seq[(Long, Long, Long)] = {
      val mem = MemoryStream[(Long, Array[Byte])]
      mem.addData(rows: _*)
      val name = s"img_probe_${System.nanoTime()}"
      val q = graft.streaming.StreamingOps.imageDedupProbeStream(
        mem.toDF().toDF("asset_id", "payload"), dir)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }

    // a planted dup flags EXACTLY ONCE (hamming 0 agrees on all 16 bands
    // — the band-priority pick must collapse them to one row); novel and
    // corrupt assets emit nothing (pipeline admits them)
    val out = runProbe((100L, img(3L)), (101L, img(999L)), (102L, Array[Byte](7, 7)))
    assert(out === Seq((100L, 3L, 0L)))

    // takedown honored by the next planned query: the deleted corpus
    // image stops vetoing its copies, the rest still flag
    ImageCodec.deleteFromImageHashIndex(spark, Seq(3L).toDF("asset_id"), dir)
    val out2 = runProbe((200L, img(3L)), (201L, img(1L)))
    assert(out2 === Seq((201L, 1L, 0L)))
  }

  test("videoGateStream admits parsable in-envelope containers; VideoFeatureCodec averages frame histograms") {
    import graft.sources.VideoCodec
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def frame(tone: Int) = ImageCodec.encodeGrayPng(16, 16, Array.fill(256)(tone))
    val good = VideoCodec.encodeContainer(Seq(frame(100), frame(200)))
    val tooLong = VideoCodec.encodeContainer((0 until 5).map(_ => frame(50)))
    val tiny = VideoCodec.encodeContainer(Seq(ImageCodec.encodeGrayPng(4, 4, Array.fill(16)(9))))
    val corrupt = Array[Byte](1, 2, 3, 4)
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData((1L, good), (2L, tooLong), (3L, tiny), (4L, corrupt), (5L, null))
    val gated = graft.streaming.StreamingOps.videoGateStream(
      mem.toDF().toDF("asset_id", "payload"), minFrames = 1, maxFrames = 3, minSide = 8)
    val q = gated.writeStream.format("memory").queryName("vid_gate")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("vid_gate").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getInt(out.head.fieldIndex("n_frames")) === 2)
    assert(out.head.getInt(out.head.fieldIndex("width")) === 16)

    // feature codec: two flat frames at tones 100 and 200 → the mean
    // histogram puts 0.5 in each tone's bucket
    val f = VideoCodec.VideoFeatureCodec().features(good, 8)
    assert(math.abs(f(100 * 8 / 256) - 0.5f) < 1e-6f)
    assert(math.abs(f(200 * 8 / 256) - 0.5f) < 1e-6f)
    assert(f.sum > 0.999f && f.sum < 1.001f)
    // everyN sampling keeps frame 0 only → all mass at tone 100's bucket
    val f2 = VideoCodec.VideoFeatureCodec(everyN = 2).features(good, 8)
    assert(math.abs(f2(100 * 8 / 256) - 1.0f) < 1e-6f)
    // quarantine on corrupt
    assert(VideoCodec.VideoFeatureCodec().features(corrupt, 8).forall(_ == 0f))
  }

  test("audioDedupProbeStream flags corpus dups; tombstoned takedowns re-admit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("audstream").toString + "/idx"
    def clip(key: Long): Array[Byte] = {
      val rnd = new scala.util.Random(key)
      AudioCodec.encodeWavPcm16(Array.fill(200)((rnd.nextInt(65536) - 32768).toShort))
    }
    val corpus = (1L to 5L).map(k => (k, "audio", clip(k)))
      .toDF("asset_id", "modality", "payload")
    AudioCodec.writeAudioHashIndex(spark, corpus, dir)

    def runProbe(rows: (Long, Array[Byte])*): Seq[(Long, Long, Long)] = {
      val mem = MemoryStream[(Long, Array[Byte])]
      mem.addData(rows: _*)
      val name = s"aud_probe_${System.nanoTime()}"
      val q = graft.streaming.StreamingOps.audioDedupProbeStream(
        mem.toDF().toDF("asset_id", "payload"), dir)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }

    val out = runProbe((100L, clip(2L)), (101L, clip(777L)), (102L, Array[Byte](9)))
    assert(out === Seq((100L, 2L, 0L)))
    AudioCodec.deleteFromAudioHashIndex(spark, Seq(2L).toDF("asset_id"), dir)
    val out2 = runProbe((200L, clip(2L)), (201L, clip(4L)))
    assert(out2 === Seq((201L, 4L, 0L)))
  }

  test("videoDedupProbeStream: alignment vote on the stream, one row per pair, takedowns re-admit") {
    import graft.sources.VideoCodec
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def vid(key: Long, nf: Int): Array[Byte] =
      VideoCodec.encodeContainer((0 until nf).map(f =>
        ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key * 7717 + f, 20, 20))))
    val dir = java.nio.file.Files.createTempDirectory("vidprobe_stream").toString + "/idx"
    VideoCodec.writeVideoHashIndex(spark,
      Seq((1L, "video", vid(5L, 4)), (2L, "video", vid(6L, 4)))
        .toDF("asset_id", "modality", "payload"), dir)

    def runProbe(symmetric: Boolean, rows: (Long, Array[Byte])*): Seq[(Long, Long, Long, Long, Long)] = {
      val mem = MemoryStream[(Long, Array[Byte])]
      mem.addData(rows: _*)
      val name = s"vid_probe_${System.nanoTime()}"
      val q = graft.streaming.StreamingOps.videoDedupProbeStream(
        mem.toDF().toDF("asset_id", "payload"), dir, symmetric = symmetric)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    }

    // 100: bit-identical re-encode of corpus video 1 (4/4 frames align);
    // 101: 3-frame truncation of corpus video 2 (containment: 3 of
    // least(3, 4) align at delta 0); 102: novel textures; 103: corrupt
    val hits = runProbe(symmetric = false,
      (100L, vid(5L, 4)), (101L, vid(6L, 3)), (102L, vid(9L, 4)), (103L, Array[Byte](1, 2)))
    assert(hits.toSet === Set((100L, 1L, 4L, 4L, 4L), (101L, 2L, 3L, 3L, 4L)), s"got $hits")
    // band-key pick: 64 agreeing frame-band keys for the re-encode must
    // still emit exactly ONE row per pair
    assert(hits.size === hits.toSet.size, s"duplicate pair rows: $hits")
    // symmetric dial on the stream: a 1-frame clip of corpus video 2
    // fails greatest(1, 4) * 0.5 = 2, so only the full re-encode pairs
    val symHits = runProbe(symmetric = true,
      (110L, vid(5L, 4)), (111L, vid(6L, 1)))
    assert(symHits.toSet === Set((110L, 1L, 4L, 4L, 4L)), s"got $symHits")
    // containment mode WOULD pair the 1-frame clip (1 >= least(1,4)*0.5)
    val containHits = runProbe(symmetric = false, (120L, vid(6L, 1)))
    assert(containHits.toSet === Set((120L, 2L, 1L, 1L, 4L)), s"got $containHits")
    // takedown: tombstoned corpus video re-admits its re-encode at the
    // next plan; the other corpus video still flags
    VideoCodec.deleteFromVideoHashIndex(spark, Seq(1L).toDF("asset_id"), dir)
    val hits2 = runProbe(symmetric = false, (200L, vid(5L, 4)), (201L, vid(6L, 4)))
    assert(hits2.toSet === Set((201L, 2L, 4L, 4L, 4L)), s"got $hits2")
  }

  test("video hash index lifecycle: build, probe (re-encode + truncation), append, delete, compact") {
    import graft.sources.VideoCodec
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vidhash").toString + "/idx"
    def vid(key: Long, nf: Int): Array[Byte] =
      VideoCodec.encodeContainer((0 until nf).map(f =>
        ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key * 977 + f, 20, 20))))
    def df(rows: (Long, String, Array[Byte])*) = rows.toDF("asset_id", "modality", "payload")

    val corpus = df((1L to 6L).map(k => (k, "video", vid(k, 4))): _*)
    VideoCodec.writeVideoHashIndex(spark, corpus, dir)

    // probe: 100 re-encodes video 3 (4/4 frames), 101 is a truncation of
    // video 5 (3 of its 3 frames align), 102 is novel
    val batch = df((100L, "video", vid(3L, 4)), (101L, "video", vid(5L, 3)),
      (102L, "video", vid(999L, 4)))
    val hits = VideoCodec.dedupVideosAgainstIndex(spark, batch, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(hits === Set((100L, 3L, 4L, 4L, 4L), (101L, 5L, 3L, 3L, 4L)),
      s"got $hits")

    // append the novel video; its copy now flags
    VideoCodec.appendToVideoHashIndex(spark, df((102L, "video", vid(999L, 4))), dir)
    val hits2 = VideoCodec.dedupVideosAgainstIndex(
      spark, df((200L, "video", vid(999L, 4))), dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits2 === Set((200L, 102L)))

    // takedown: video 3's copies re-admit; compaction preserves answers
    VideoCodec.deleteFromVideoHashIndex(spark, Seq(3L).toDF("asset_id"), dir)
    assert(VideoCodec.dedupVideosAgainstIndex(spark, df((300L, "video", vid(3L, 4))), dir)
      .collect().isEmpty)
    val probe = df((400L, "video", vid(3L, 4)), (401L, "video", vid(999L, 4)))
    def probeSet(d: String) = VideoCodec.dedupVideosAgainstIndex(spark, probe, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = probeSet(dir)
    VideoCodec.compactVideoHashIndex(spark, dir)
    assert(!graft.sources.Tombstones.exists(spark, dir))
    assert(probeSet(dir) === before)
    assert(spark.read.parquet(s"$dir/grouped").where($"asset_id" === 3L).count() === 0)
  }

  test("composed audio ingest loop: gate, in-batch dedup, corpus probe, land, retry") {
    import graft.sources.AssetIngest
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ingest_aud").toString
    val indexDir = s"$base/idx"; val dataDir = s"$base/data"
    def clip(id: Long, key: Long): (Long, Array[Byte]) = {
      val rnd = new scala.util.Random(key)
      (id, AudioCodec.encodeWavPcm16(Array.fill(300)((rnd.nextInt(65536) - 32768).toShort)))
    }
    def df(rows: (Long, Array[Byte])*) = rows.toDF("asset_id", "payload")

    // batch 1: 2 novel, 1 in-batch dup (key 2 twice), 1 corrupt, 1 too short
    val short = (60L, AudioCodec.encodeWavPcm16(Array.fill(10)(5.toShort)))
    val r1 = AssetIngest.ingestAudioBatch(spark,
      df(clip(1L, 1L), clip(2L, 2L), clip(3L, 2L), (4L, Array[Byte](1)), short),
      indexDir, dataDir, minSamples = 100)
    // the corrupt payload is undecodable; the too-short clip DECODES but
    // fails the duration gate — split accounting, not one lumped count
    assert(r1 === AssetIngest.IngestReport(admitted = 2, inBatchDups = 1,
      corpusDups = 0, undecodable = 1, gated = 1))
    val landed = spark.read.parquet(s"$dataDir/assets")
    assert(landed.select("asset_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(landed.where($"n_samples" === 300 && $"channels" === 1).count() === 2)

    // batch 2: corpus dup + novel; retry self-heals
    val r2 = AssetIngest.ingestAudioBatch(spark, df(clip(10L, 1L), clip(11L, 7L)),
      indexDir, dataDir, minSamples = 100)
    assert(r2 === AssetIngest.IngestReport(1, 0, 1, 0))
    val r3 = AssetIngest.ingestAudioBatch(spark, df(clip(11L, 7L)),
      indexDir, dataDir, minSamples = 100)
    assert(r3 === AssetIngest.IngestReport(0, 0, 1, 0))

    // takedown flows through
    AudioCodec.deleteFromAudioHashIndex(spark, Seq(2L).toDF("asset_id"), indexDir)
    val r4 = AssetIngest.ingestAudioBatch(spark, df(clip(20L, 2L)),
      indexDir, dataDir, minSamples = 100)
    assert(r4 === AssetIngest.IngestReport(1, 0, 0, 0))
  }

  test("composed video ingest loop: gate, in-batch alignment dedup, corpus probe, land, retry") {
    import graft.sources.{AssetIngest, VideoCodec}
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ingest_vid").toString
    val indexDir = s"$base/idx"; val dataDir = s"$base/data"
    def vid(key: Long, nf: Int): Array[Byte] =
      VideoCodec.encodeContainer((0 until nf).map(f =>
        ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key * 5077 + f, 20, 20))))
    def df(rows: (Long, Array[Byte])*) = rows.toDF("asset_id", "payload")

    // batch 1: 2 novel, 1 in-batch dup (a TRUNCATION of key 2's video),
    // 1 corrupt, 1 over the frame cap
    val long = (60L, vid(9L, 8))
    val r1 = AssetIngest.ingestVideoBatch(spark,
      df((1L, vid(1L, 4)), (2L, vid(2L, 4)), (3L, vid(2L, 3)), (4L, Array[Byte](3)), long),
      indexDir, dataDir, maxFrames = 6)
    // corrupt container = undecodable; the 8-frame video parses fine but
    // exceeds maxFrames = gated
    assert(r1 === AssetIngest.IngestReport(admitted = 2, inBatchDups = 1,
      corpusDups = 0, undecodable = 1, gated = 1))
    val landed = spark.read.parquet(s"$dataDir/assets")
    assert(landed.select("asset_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(landed.where($"n_frames" === 4 && $"width" === 20).count() === 2)
    // index state matches: 2 grouped rows, 4 collapsed frames + count 4 each
    val grouped = spark.read.parquet(s"$indexDir/grouped")
    assert(grouped.count() === 2)
    assert(grouped.select(size($"chashes")).as[Int].collect().toSeq === Seq(4, 4))
    assert(grouped.select($"n_frames").as[Long].collect().toSeq === Seq(4L, 4L))

    // batch 2: a re-encode of corpus video 1 (corpus dup) + novel; retry
    // of the novel self-heals
    val r2 = AssetIngest.ingestVideoBatch(spark,
      df((10L, vid(1L, 4)), (11L, vid(7L, 4))), indexDir, dataDir, maxFrames = 6)
    assert(r2 === AssetIngest.IngestReport(1, 0, 1, 0))
    val r3 = AssetIngest.ingestVideoBatch(spark,
      df((12L, vid(7L, 4))), indexDir, dataDir, maxFrames = 6)
    assert(r3 === AssetIngest.IngestReport(0, 0, 1, 0))

    // takedown flows through
    VideoCodec.deleteFromVideoHashIndex(spark, Seq(2L).toDF("asset_id"), indexDir)
    val r4 = AssetIngest.ingestVideoBatch(spark,
      df((20L, vid(2L, 4))), indexDir, dataDir, maxFrames = 6)
    assert(r4 === AssetIngest.IngestReport(1, 0, 0, 0))
  }

  test("streaming crawl -> foreachBatch ingest loop: dups drop across micro-batches, store grows once") {
    // the documented composition for continuous ingest: each micro-batch
    // runs the batch loop, so index appends are visible to the NEXT
    // micro-batch with no gate restarts
    import graft.sources.AssetIngest
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("stream_ingest").toString
    def img(key: Long): Array[Byte] =
      ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key, 20, 20))
    val mem = MemoryStream[(Long, Array[Byte])]
    val reports = scala.collection.mutable.ArrayBuffer.empty[AssetIngest.IngestReport]
    val q = mem.toDF().toDF("asset_id", "payload").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        reports += AssetIngest.ingestImageBatch(
          spark, batch, s"$base/idx", s"$base/data")
        ()
      }
      .start()
    try {
      mem.addData((1L, img(1L)), (2L, img(2L)))
      q.processAllAvailable()
      // second micro-batch: one cross-micro-batch dup, one novel
      mem.addData((3L, img(1L)), (4L, img(3L)))
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.map(_.admitted).toSeq === Seq(2, 1))
    assert(reports.map(_.corpusDups).toSeq === Seq(0, 1),
      s"cross-micro-batch dup not caught by the young index: $reports")
    assert(spark.read.parquet(s"$base/data/assets").select("asset_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
  }

  test("degenerate first batches: all-undecodable ingest accounts cleanly and leaves a usable store") {
    import graft.sources.{AssetIngest, VideoCodec}
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ingest_deg").toString
    // batch 1: nothing decodes — report all-undecodable, no crash
    val junk = Seq((1L, Array[Byte](9, 9)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "payload")
    val r1 = AssetIngest.ingestVideoBatch(spark, junk, s"$base/idx", s"$base/data")
    assert(r1 === AssetIngest.IngestReport(0, 0, 0, 2))
    // batch 2 into the same (possibly empty-file) store works normally
    def vid(key: Long): Array[Byte] =
      VideoCodec.encodeContainer((0 until 3).map(f =>
        ImageCodec.encodeGrayPng(16, 16, ImageCodec.texturedLuma(key * 211 + f, 16, 16))))
    val r2 = AssetIngest.ingestVideoBatch(spark,
      Seq((10L, vid(5L))).toDF("asset_id", "payload"), s"$base/idx", s"$base/data")
    assert(r2 === AssetIngest.IngestReport(1, 0, 0, 0))
    // and a dup of the landed video now flags against the young index
    val r3 = AssetIngest.ingestVideoBatch(spark,
      Seq((11L, vid(5L))).toDF("asset_id", "payload"), s"$base/idx", s"$base/data")
    assert(r3 === AssetIngest.IngestReport(0, 0, 1, 0))
    // same degenerate shape through the image loop's shared core
    val ri = AssetIngest.ingestImageBatch(spark, junk, s"$base/iidx", s"$base/idata")
    assert(ri === AssetIngest.IngestReport(0, 0, 0, 2))
  }

  test("composed ingest loop: gate, in-batch dedup, corpus probe, land, index append, retry") {
    import graft.sources.AssetIngest
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ingest").toString
    val indexDir = s"$base/idx"; val dataDir = s"$base/data"
    def img(id: Long, key: Long): (Long, Array[Byte]) =
      (id, ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(key, 20, 20)))
    def df(rows: (Long, Array[Byte])*) = rows.toDF("asset_id", "payload")

    // batch 1: 3 novel, 1 in-batch dup (key 2 twice), 1 corrupt, 1 too small
    val tiny = (60L, ImageCodec.encodeGrayPng(4, 4, Array.fill(16)(9)))
    val b1 = df(img(1L, 1L), img(2L, 2L), img(3L, 3L), img(4L, 2L),
      (5L, Array[Byte](1, 2, 3)), tiny)
    val r1 = AssetIngest.ingestImageBatch(spark, b1, indexDir, dataDir)
    // corrupt bytes = undecodable; the 4x4 image decodes but fails the
    // minSide envelope = gated
    assert(r1 === AssetIngest.IngestReport(admitted = 3, inBatchDups = 1,
      corpusDups = 0, undecodable = 1, gated = 1))
    val landed1 = spark.read.parquet(s"$dataDir/assets")
    assert(landed1.select("asset_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(landed1.where($"width" === 20 && $"height" === 20).count() === 3)

    // batch 2: 1 novel, 2 corpus dups (key 1 again, key 3 again)
    val r2 = AssetIngest.ingestImageBatch(spark, df(img(10L, 7L), img(11L, 1L), img(12L, 3L)),
      indexDir, dataDir)
    assert(r2 === AssetIngest.IngestReport(1, 0, 2, 0))

    // retried fully-successful batch: self-healing — everything a corpus dup
    val r3 = AssetIngest.ingestImageBatch(spark, df(img(10L, 7L)), indexDir, dataDir)
    assert(r3 === AssetIngest.IngestReport(0, 0, 1, 0))
    assert(spark.read.parquet(s"$dataDir/assets").count() === 4)

    // takedown flows through: delete key 3's asset, its copy re-admits
    ImageCodec.deleteFromImageHashIndex(spark, Seq(3L).toDF("asset_id"), indexDir)
    val r4 = AssetIngest.ingestImageBatch(spark, df(img(20L, 3L)), indexDir, dataDir)
    assert(r4 === AssetIngest.IngestReport(1, 0, 0, 0))
  }

  test("decoded image features slot into the existing IVF index lifecycle") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    // textured assets → informative feature vectors (two-tone histograms
    // would tie everywhere, G17's lesson applied to retrieval)
    val feats = Multimodal.extractFeatures(
      ImageCodec.dedupAssets(spark, sf), ImageCodec.ImageFeatureCodec, dim = 16,
      partitionsOverride = Some(4))
      .select(col("asset_id").as("vec_id"), col("modality").as("label"),
        col("features").as("embedding"))
      .localCheckpoint(false)
    val (cb, postings) = VectorOps.ivfIndex(feats, cells = 4, iters = 2)
    val got = VectorOps.ivfSearch(cb, postings, queryId = 1L, nprobe = 2, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.size === 10)
    // brute-force ground truth over the same features
    val rows = feats.collect().map(r => (r.getLong(0), r.getSeq[Float](2).toArray))
    val qv = rows.find(_._1 == 1L).get._2
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val exact = rows.filter(_._1 != 1L)
      .sortBy { case (id, v) => (-dot(v, qv), id) }.take(10).map(_._1).toSet
    val recall = got.intersect(exact).size / 10.0
    assert(recall >= 0.5, s"IVF recall over image features $recall < 0.5")
  }

  test("multimodal declared queries return rows at sf0.001") {
    Seq("q_image_stats", "q_image_hist", "q_image_dedup", "q_audio_stats",
      "q_audio_dedup", "q_asset_inventory", "q_video_frames", "q_image_knn")
      .foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q returned no rows")
      }
  }
}
