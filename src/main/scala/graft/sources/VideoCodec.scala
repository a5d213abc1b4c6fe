package graft.sources

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Video modality with REAL per-frame decode: a video payload is a
  * length-prefixed sequence of PNG frames (the structure of any
  * intra-only container, e.g. MJPEG, minus the codec licensing), and
  * frame extraction genuinely parses the container and ImageIO-decodes
  * every frame.
  *
  * Container layout (big-endian):
  *   magic "GVI1" | int32 frameCount | (int32 frameLen | PNG bytes)*
  *
  * Same exact-oracle design as ImageCodec: frame f of document d is the
  * deterministic two-tone pattern for `(doc_id + f * 1000003,
  * n_chars + f)`, so every decoded per-frame statistic has a closed
  * integer form a SQL oracle reproduces with one `generate_series` over
  * frame indices.
  *
  * 100 TB posture: one stateless mapPartitions pass; each asset emits its
  * frames as an iterator (frames STREAM into downstream operators — the
  * whole video is never materialized as a row array); truncated or
  * corrupt containers contribute the frames that parse and stop cleanly.
  */
object VideoCodec {

  private val Magic = 0x47564931 // "GVI1"

  def frameCount(docId: Long): Int = (2 + (docId % 4)).toInt // 2..5

  /** The frame-f pattern key: co-prime stride keeps frame patterns of one
    * asset (and of consecutive assets) distinct. */
  def framePattern(docId: Long, nChars: Long, f: Int): ImageCodec.Pattern =
    ImageCodec.pattern(docId + f.toLong * 1000003L, nChars + f)

  def encodeContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(Magic)
    buf.putInt(frames.length)
    frames.foreach { fr => buf.putInt(fr.length); buf.put(fr) }
    buf.array()
  }

  /** Parse the container into frame payloads. Lenient by design: a
    * corrupt/truncated tail yields the frames that parsed; a bad magic
    * yields no frames. (Per-row containment, like ImageCodec.decodeLuma.) */
  def decodeContainer(payload: Array[Byte]): Seq[Array[Byte]] = {
    if (payload == null || payload.length < 8) return Seq.empty
    val buf = ByteBuffer.wrap(payload)
    if (buf.getInt() != Magic) return Seq.empty
    val n = buf.getInt()
    if (n < 0) return Seq.empty
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    var good = true
    while (i < n && good) {
      if (buf.remaining() < 4) good = false
      else {
        val len = buf.getInt()
        if (len < 0 || buf.remaining() < len) good = false
        else {
          val fr = new Array[Byte](len)
          buf.get(fr)
          out += fr
          i += 1
        }
      }
    }
    out.result()
  }

  /** Synthesize the per-document video asset table (Multimodal.schema;
    * meta width/height are frame 0's — the "display size"). */
  def videoAssets(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "n_chars")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(Multimodal.schema))
    docs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nc = r.getLong(1)
        val frames = (0 until frameCount(id)).map { f =>
          val p = framePattern(id, nc, f)
          ImageCodec.encodeGrayPng(p.w, p.h, ImageCodec.render(p))
        }
        val container = encodeContainer(frames)
        val p0 = framePattern(id, nc, 0)
        Row(id, "video", container,
          Row("video/x-graft-gvi", Int.box(p0.w), Int.box(p0.h), container.length.toLong))
      }
    }(enc)
  }

  private val frameSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false),
  ))

  /** CHEAP container parse — no image decode — emitting one row per
    * `everyN`th frame: (asset_id, frame_idx, frame payload). This is the
    * fan-out point that keeps long videos from becoming stragglers: the
    * parse costs only the container's bytes, and the expensive per-frame
    * ImageIO decode happens downstream on frame ROWS, which a shuffle
    * can spread across tasks regardless of how many frames share one
    * container. flatMap-shaped, so frames still stream out of the parse
    * lazily; truncated/corrupt containers contribute the frames that
    * parse (same containment as decodeContainer). */
  def videoFrames(assets: DataFrame, everyN: Int = 1): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        decodeContainer(r.getAs[Array[Byte]]("payload")).iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (frame, idx) => Row(id, idx.toLong, frame) }
      }
    }(enc)
  }

  private val frameDimsSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
  ))

  /** HEADER-ONLY per-frame dimensions: container parse + image-header
    * peek per frame, NO pixel inflation — the inventory/accounting pass
    * (ImageCodec.peekDims per frame). Cheap enough that no decode
    * fan-out is needed; frames whose headers fail to parse are skipped. */
  def videoFrameDims(assets: DataFrame, everyN: Int = 1): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameDimsSchema))
    videoFrames(assets, everyN).mapPartitions { it =>
      it.flatMap { r =>
        ImageCodec.peekDims(r.getAs[Array[Byte]](2)).map { case (w, h, _) =>
          Row(r.getLong(0), r.getLong(1), w.toLong, h.toLong)
        }
      }
    }(enc)
  }

  private val frameStatsSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("sum_luma", LongType, nullable = false),
  ))

  /** Per-frame statistics off a REAL ImageIO decode of every `everyN`th
    * frame, one output row per decoded frame.
    *
    * Scale shape (r9): parse-then-explode — [[videoFrames]] emits cheap
    * (asset, frame_idx, bytes) rows, a hash repartition on (asset_id,
    * frame_idx) spreads them across tasks, and the expensive decode runs
    * per frame ROW. r8 decoded every frame of a container inside the
    * task that held the asset row, so one hour-long video serialized an
    * entire partition (the r8 verdict's straggler magnet); now a single
    * long container fans out across the cluster (ScaleSpec pins >1
    * decode task for one container). The shuffle moves compressed frame
    * bytes once — decode cost dominates at any real frame size, and AQE
    * coalesces the small partitions a short corpus produces. `fanout =
    * false` keeps the r8 single-pass shape for corpora known to have
    * few frames per container. Frames that fail image decode are
    * skipped (same containment as the parse). */
  def videoFrameStats(assets: DataFrame, everyN: Int = 1,
      fanout: Boolean = true): DataFrame = {
    val frames = videoFrames(assets, everyN)
    val spread =
      if (fanout) frames.repartition(col("asset_id"), col("frame_idx"))
      else frames
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameStatsSchema))
    spread.mapPartitions { it =>
      it.flatMap { r =>
        ImageCodec.decodeLuma(r.getAs[Array[Byte]](2)).map { d =>
          var sum = 0L
          var i = 0
          while (i < d.luma.length) { sum += d.luma(i); i += 1 }
          Row(r.getLong(0), r.getLong(1), d.width.toLong, d.height.toLong, sum)
        }
      }
    }(enc)
  }

  // --- Video-level near-duplicate detection: per-frame aHash sequences
  // fed through the shared HashBanding engine at FRAME granularity, then
  // an order-aware alignment vote per video pair. Catches the dup
  // classes a crawl corpus actually contains — bit-identical re-uploads,
  // re-encodes (lossless frames hash equal; lossy re-encodes land within
  // the Hamming threshold per frame), and truncations (a prefix keeps
  // its frame matches at alignment delta 0). Never all-pairs at any
  // level: candidates are band-bucketed frames, and only videos sharing
  // a matched frame reach the per-pair aggregate. ---

  private val frameHashSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("ahash", ArrayType(LongType, containsNull = false), nullable = false),
  ))

  /** Per-frame perceptual hash: parse → fan out (same shape as
    * videoFrameStats) → decode + aHash256 per frame row. Undecodable
    * frames are skipped. */
  def videoFrameHashes(assets: DataFrame, everyN: Int = 1,
      fanout: Boolean = true): DataFrame = {
    val frames = videoFrames(assets, everyN)
    val spread =
      if (fanout) frames.repartition(col("asset_id"), col("frame_idx"))
      else frames
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameHashSchema))
    spread.mapPartitions { it =>
      it.flatMap { r =>
        ImageCodec.decodeLuma(r.getAs[Array[Byte]](2))
          .map(d => Row(r.getLong(0), r.getLong(1), ImageCodec.aHash256(d)))
      }
    }(enc)
  }

  /** Frame indexes are packed with the video id into one synthetic frame
    * uid so the banded engine (keyed on a single id column) can join at
    * frame granularity; 2^20 frames per video is ~9.7 h at 30 fps. */
  private val MaxFramesPerVideo = 1L << 20

  /** Largest asset id the uid packing can carry without overflowing into
    * the sign bit: uid = asset_id * 2^20 + frame_idx must stay a
    * non-negative Long. */
  private val MaxAssetId = Long.MaxValue / MaxFramesPerVideo

  /** Fail LOUDLY on any collapsed row whose (asset_id, first_idx) cannot
    * pack into a frame uid without aliasing — a frame index >= 2^20
    * (a >9.7 h video at 30 fps with everyN = 1; everyN keeps ORIGINAL
    * indices, so sampling does not shrink them) or an asset id outside
    * [0, 2^43) would silently land its frames in another video's id
    * space and misattribute dup pairs and index probes. Same fail-loud
    * philosophy as HashBanding's maxBucket cap: the degenerate input
    * raises with a remedy, never corrupts the answer. Applied at EVERY
    * uid construction site (pairs, probe both sides, index write/append)
    * so a pre-existing index with out-of-range rows is caught at probe
    * time too. */
  private def requireUidRange(collapsed: DataFrame): DataFrame =
    collapsed.where(
      when(col("asset_id").between(0, MaxAssetId - 1) &&
          col("first_idx").between(0, MaxFramesPerVideo - 1), lit(true))
        .otherwise(raise_error(concat(
          lit("VideoCodec: frame uid out of range (asset_id "), col("asset_id"),
          lit(", frame_idx "), col("first_idx"),
          lit(s") — asset_id must be in [0, $MaxAssetId) and frame index < " +
            s"$MaxFramesPerVideo (~9.7 h at 30 fps); re-key asset ids into " +
            "range, split over-long videos, or re-index frames before dedup")))))

  /** Collapse a frame-level hash frame to one row per DISTINCT
    * (video, hash): the first frame index anchors the temporal
    * alignment, the multiplicity weights the vote. This is the video
    * engine's quadratic-killer: a STATIC video (one frame repeated F
    * times — screencasts, title cards) contributes ONE banded row
    * instead of F, so a pair of static videos costs 1 candidate rather
    * than F^2, and identical-frame floods collapse before they can
    * swamp a band bucket. */
  private def collapseFrames(frameHashes: DataFrame): DataFrame =
    frameHashes.groupBy("asset_id", "ahash")
      .agg(min("frame_idx").as("first_idx"), count(lit(1)).as("cnt"))

  /** Video near-dup pairs (a_id < b_id): two videos pair when, at the
    * best single temporal alignment, at least `minFrac` of the shorter
    * video's hashed frames match a frame of the other within
    * `maxHamming`. Plan shape: collapse repeated frames per video
    * ([[collapseFrames]] — bounded candidates even on static videos),
    * band the distinct (video, hash) rows through HashBanding.pairs
    * (exact popcount + the skew cap), then the alignment vote: one
    * weighted vote per a-side anchor per delta (weight = min of the two
    * multiplicities, max'd over competing b-matches so one anchor never
    * votes twice), summed per delta, best delta wins; finally one
    * broadcast-sized join against per-video frame counts.
    * Output: (a_id, b_id, aligned_frames, n_a, n_b).
    *
    * The alignment vote is what makes this ORDER-AWARE: a shuffled
    * playlist of the same frames shares frame matches but scatters them
    * across deltas, so no single alignment accumulates the fraction. A
    * truncated copy concentrates all its matches at delta 0 and passes;
    * a static-video pair concentrates min(F_a, F_b) weight at its
    * anchor delta and passes — with ONE candidate row, not F^2.
    *
    * Vote semantics (`symmetric`, `minMatchedFrames`): the DEFAULT
    * (`symmetric = false`) thresholds on the SHORTER side's fraction —
    * CONTAINMENT semantics, so a clip cut from a long video pairs with
    * it at full strength (the right default for a crawl pipeline, where
    * a contained re-upload is still a duplicate; q_video_dedup uses
    * this mode, and its planted truncations depend on it).
    * `symmetric = true` thresholds on the LONGER side's fraction
    * instead — "near-duplicate videos" in the sense most users expect:
    * both videos must be mostly the same content, so a 3-frame clip
    * inside a 200-frame video no longer pairs. `minMatchedFrames` adds
    * an absolute floor on aligned frames in either mode (containment's
    * guard against trivially-short overlaps). */
  def videoDupPairs(frameHashes: DataFrame, maxHamming: Int = HashBanding.DefaultMaxHamming,
      minFrac: Double = 0.5, maxBucket: Int = HashBanding.DefaultMaxBucket,
      symmetric: Boolean = false, minMatchedFrames: Long = 0L): DataFrame =
    // ONE codec pass: the barrier sits on the hash frame itself, so the
    // self-join's two banded sides AND the frame-count aggregate all read
    // the materialized hashes (the perceptualDupPairs barrier rationale —
    // without it the counts aggregate re-decodes the whole corpus;
    // measured at sf0.1: 11.6 s -> 7.1 s)
    videoDupPairsOn(frameHashes.localCheckpoint(false), maxHamming, minFrac,
      maxBucket, symmetric, minMatchedFrames)

  /** [[videoDupPairs]] over an ALREADY-MATERIALIZED hash frame — the
    * shared-barrier entry for callers that barrier the hashes themselves
    * and feed several consumers from one decode pass (videoDupClusters'
    * node set + edges, the ingest loop's gate + dedup + probe + append).
    * Calling videoDupPairs there would stack a second checkpoint on the
    * first: NO re-decode either way (the copy reads the first barrier's
    * blocks — profiled for the r10 G16 suspicion, negative), but one
    * extra materialization job and a duplicate block-manager copy of the
    * hash frame per call. Noise-level at sf0.1 (~2k collapsed rows);
    * pure waste at scale, where the hash frame is millions of rows. */
  private[sources] def videoDupPairsOn(hashed: DataFrame,
      maxHamming: Int = HashBanding.DefaultMaxHamming,
      minFrac: Double = 0.5, maxBucket: Int = HashBanding.DefaultMaxBucket,
      symmetric: Boolean = false, minMatchedFrames: Long = 0L): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0, s"minFrac must be in (0, 1], got $minFrac")
    require(minMatchedFrames >= 0L, s"minMatchedFrames must be >= 0, got $minMatchedFrames")
    val counts = hashed.groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"))
    val collapsed = requireUidRange(collapseFrames(hashed))
    val uids = collapsed
      .select((col("asset_id") * MaxFramesPerVideo + col("first_idx")).as("asset_id"),
        col("ahash"))
    val cntByUid = collapsed.select(
      (col("asset_id") * MaxFramesPerVideo + col("first_idx")).as("uid"), col("cnt"))
    val framePairs = HashBanding.pairs(uids, maxHamming, maxBucket)
      .join(cntByUid.select(col("uid").as("a_id"), col("cnt").as("cnt_a")), Seq("a_id"))
      .join(cntByUid.select(col("uid").as("b_id"), col("cnt").as("cnt_b")), Seq("b_id"))
      .select(expr(s"a_id div $MaxFramesPerVideo").as("a_vid"),
        (col("a_id") % MaxFramesPerVideo).as("a_idx"),
        expr(s"b_id div $MaxFramesPerVideo").as("b_vid"),
        (col("b_id") % MaxFramesPerVideo).as("b_idx"),
        col("cnt_a"), col("cnt_b"))
      .where(col("a_vid") < col("b_vid"))
    val aligned = framePairs
      .groupBy(col("a_vid"), col("b_vid"),
        (col("a_idx") - col("b_idx")).as("delta"), col("a_idx"))
      .agg(max(least(col("cnt_a"), col("cnt_b"))).as("w"))
      .groupBy(col("a_vid"), col("b_vid"), col("delta"))
      .agg(sum(col("w")).as("matches"))
      .groupBy(col("a_vid"), col("b_vid"))
      .agg(max(col("matches")).as("aligned_frames"))
    val denom =
      if (symmetric) greatest(col("n_a"), col("n_b")) else least(col("n_a"), col("n_b"))
    aligned
      .join(counts.select(col("asset_id").as("a_vid"), col("n_frames").as("n_a")), Seq("a_vid"))
      .join(counts.select(col("asset_id").as("b_vid"), col("n_frames").as("n_b")), Seq("b_vid"))
      .where(col("aligned_frames") >= denom * minFrac &&
        col("aligned_frames") >= minMatchedFrames)
      .select(col("a_vid").as("a_id"), col("b_vid").as("b_id"),
        col("aligned_frames"), col("n_a"), col("n_b"))
  }

  private val frameHashesRowSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fhashes", ArrayType(StructType(Seq(
      StructField("first_idx", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("ahash", ArrayType(LongType, containsNull = false), nullable = false),
    )), containsNull = false), nullable = true),
  ))

  /** ONE ROW PER VIDEO carrying its COLLAPSED frame hashes as an array —
    * the shape a STATELESS streaming probe needs: all per-video
    * aggregation (collapse by hash, frame count) happens inside the row,
    * so the stream side never needs a streaming groupBy. `ok` = at least
    * one decodable frame; `n_frames` counts decoded frames; `fhashes`
    * is the same collapsed (first_idx, cnt, ahash) form the persisted
    * index stores (see [[collapseFrames]] — static videos carry ONE
    * entry). Memory note: one row holds one video's distinct-frame
    * hashes (36 bytes each) — a 10⁵-distinct-frame video costs ~4 MB
    * transient row state, far below the decode pass's own footprint. */
  def annotateWithFrameHashes(assets: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameHashesRowSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val frames = decodeContainer(r.getAs[Array[Byte]]("payload"))
        val byHash = scala.collection.mutable.LinkedHashMap.empty[Seq[Long], (Long, Long)]
        var n = 0L
        frames.iterator.zipWithIndex.foreach { case (f, idx) =>
          ImageCodec.decodeLuma(f).foreach { d =>
            val h = ImageCodec.aHash256(d).toSeq
            byHash.get(h) match {
              case Some((fi, c)) => byHash(h) = (fi, c + 1)
              case None          => byHash(h) = (idx.toLong, 1L)
            }
            n += 1
          }
        }
        if (n == 0) Row(id, false, 0L, null)
        else Row(id, true, n,
          byHash.toSeq.map { case (h, (fi, c)) => Row(fi, c, h) })
      }
    }(enc)
  }

  /** Video near-dup CLUSTERS: [[videoDupPairs]] edges fed through the
    * pointer-doubling connected-components fixpoint (DedupOps' engine),
    * one row per hashed video: (asset_id, cluster = least member id,
    * members) — the keep-one-per-cluster view a curator acts on, the
    * video twin of HashBanding.clusters (which serves image/audio; video
    * cannot use it directly because its edges come from the alignment
    * vote, not plain hash pairs). Same vote dials as [[videoDupPairs]].
    * Executes bounded fixpoint jobs at construction (see
    * connectedComponents' scaladoc). */
  def videoDupClusters(frameHashes: DataFrame,
      maxHamming: Int = HashBanding.DefaultMaxHamming,
      minFrac: Double = 0.5, maxBucket: Int = HashBanding.DefaultMaxBucket,
      symmetric: Boolean = false, minMatchedFrames: Long = 0L): DataFrame = {
    // one codec pass AND one barrier: the checkpoint feeds the node set
    // and the pair engine (videoDupPairsOn — no second stacked barrier)
    val hashed = frameHashes.localCheckpoint(false)
    val edges = videoDupPairsOn(hashed, maxHamming, minFrac, maxBucket,
        symmetric, minMatchedFrames)
      .select(col("a_id").as("da"), col("b_id").as("db"))
    // nodes need no explicit distinct: the fixpoint's first groupBy(node)
    // dedupes the per-frame repetition (and a distinct here trips a
    // Catalyst union-constraint rewrite on the checkpointed lineage)
    graft.operators.DedupOps.connectedComponents(
        hashed.select(col("asset_id").as("node")), edges)
      .withColumn("members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("comp")))
      .select(col("node").as("asset_id"), col("comp").as("cluster"), col("members"))
  }

  private val annotatedSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("ok", BooleanType, nullable = false),
  ))

  /** Payload-preserving decode annotation (streaming-gate engine, the
    * video twin of Image/AudioCodec.annotateDecoded): parse the
    * container, decode FRAME 0 ONLY for the display dimensions — a
    * gate's job is admission, not a full scan, so cost per asset is one
    * container parse + one frame decode regardless of length. `ok`
    * requires a parsable container with >= 1 decodable frame. */
  def annotateDecoded(assets: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(annotatedSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]]("payload")
        val frames = decodeContainer(payload)
        frames.headOption.flatMap(ImageCodec.decodeLuma) match {
          case Some(d) =>
            Row(id, payload, Int.box(frames.size), Int.box(d.width), Int.box(d.height), true)
          case None => Row(id, payload, null, null, null, false)
        }
      }
    }(enc)
  }

  /** REAL codec for the Multimodal.extractFeatures seam on video
    * payloads: the mean of per-frame normalized luma histograms over
    * every `everyN`th frame — a cheap clip-level visual descriptor that
    * composes with the kNN family like the image/audio feature codecs.
    * Undecodable containers (or ones with no decodable sampled frame)
    * return the all-zero quarantine vector. */
  final case class VideoFeatureCodec(everyN: Int = 1) extends Multimodal.Codec {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      require(dim >= 1, s"feature dim must be >= 1, got $dim")
      val acc = new Array[Float](dim)
      var used = 0
      decodeContainer(payload).iterator.zipWithIndex
        .filter(_._2 % everyN == 0)
        .foreach { case (frame, _) =>
          ImageCodec.decodeLuma(frame).foreach { d =>
            val n = d.luma.length.toFloat
            var i = 0
            while (i < d.luma.length) { acc(d.luma(i) * dim / 256) += 1f / n; i += 1 }
            used += 1
          }
        }
      if (used == 0) new Array[Float](dim)
      else {
        var j = 0
        while (j < dim) { acc(j) /= used; j += 1 }
        acc
      }
    }
  }

  // --- Persisted frame-hash index lifecycle — completes the per-modality
  // parity (image r8, audio r9): a crawl pipeline probes each video
  // snapshot against the corpus in O(batch frames), never re-hashing the
  // corpus. Stored layout: ONE table, `dir/grouped`, holding one row per
  // video: `chashes` (the COLLAPSED frame-hash array — one entry per
  // distinct frame hash, see collapseFrames: static videos store 1
  // entry, not F) and `n_frames`. This is the GROUPED probe form
  // directly: the streaming probe's static side is a projection-only
  // scan of it (no per-micro-batch corpus re-aggregation), the batch
  // probe derives the per-frame rows with a per-row explode, and the
  // alignment vote's denominators read n_frames off the same row — no
  // separate counts table, no O(corpus-frames) aggregate anywhere at
  // probe time. Rows are id-hash-bucketed (IdBuckets) so compaction
  // rewrites only the partitions holding tombstoned videos. ---

  /** One row per video: collapsed frame-hash array + decoded frame
    * count (n_frames = sum of multiplicities = frames decoded) — the
    * grouped form the index persists. */
  private def groupedVideoRows(hashed: DataFrame): DataFrame =
    requireUidRange(collapseFrames(hashed))
      .groupBy("asset_id")
      .agg(collect_list(struct(col("first_idx"), col("cnt"), col("ahash"))).as("chashes"),
        sum(col("cnt")).as("n_frames"))

  /** The per-frame collapsed view of the stored grouped table — a pure
    * per-row explode (no shuffle), feeding the batch probe's banded
    * frame-uid join. */
  private def collapsedRowsOfGrouped(grouped: DataFrame): DataFrame =
    grouped.select(col("asset_id"), explode(col("chashes")).as("f"))
      .select(col("asset_id"), col("f.first_idx").as("first_idx"),
        col("f.cnt").as("cnt"), col("f.ahash").as("ahash"))

  /** The video index's meta check: band geometry + the r11 grouped
    * layout stamp — a pre-r11 hashes+counts index fails with a rebuild
    * message instead of being silently treated as absent (the hazard:
    * an existence check keyed on `grouped` alone would skip corpus
    * dedup over a perfectly real old index and admit duplicates). */
  private[graft] def requireVideoMeta(s: SparkSession, dir: String): Unit =
    HashBanding.requireMeta(s, dir, IndexMeta.GroupedLayout,
      "VideoCodec.writeVideoHashIndex")

  /** Build the index: decode + hash every frame, persist the grouped
    * per-video rows. */
  def writeVideoHashIndex(s: SparkSession, assets: DataFrame,
      dir: String): Unit = WriterLock.withLock(dir) {
    val hashed = videoFrameHashes(assets).localCheckpoint(false)
    GenStamp.beginRebuild(s, dir) // rebuild fence: see DedupOps.writeMinhashIndex
    IdBuckets.write(groupedVideoRows(hashed), "asset_id", s"$dir/grouped", "overwrite")
    writeVideoProbeLayout(s, dir)
    HashBanding.writeMeta(s, dir, IndexMeta.GroupedLayout)
    GenStamp.completeRebuild(s, dir, Seq(s"$dir/grouped", s"$dir/pbands"))
  }

  /** The band-partitioned probe rows of a collapsed-frame view: one row
    * per (collapsed frame, band) carrying the frame uid, the owning
    * video id (tombstones apply at video granularity), the multiplicity
    * (the vote weight — carried so the pruned probe never re-reads the
    * grouped table for it) and the frame hash (the popcount refine). */
  private def videoProbeRows(collapsed: DataFrame): DataFrame =
    HashBanding.bandRowsAllCols(
      requireUidRange(collapsed)
        .select((col("asset_id") * MaxFramesPerVideo + col("first_idx")).as("uid"),
          col("asset_id").as("vid"), col("cnt"), col("ahash")))

  /** (Re-)derive the video probe layout (`pbands`) from the grouped
    * table — called by the index writers; also the upgrade path for a
    * pre-layout index (probes fall back to the full scan until it
    * runs). */
  def writeVideoProbeLayout(s: SparkSession, dir: String): Unit =
    WriterLock.withLock(dir) {
    if (BandBuckets.exists(s, s"$dir/grouped")) {
      BandBuckets.write(
        videoProbeRows(collapsedRowsOfGrouped(IdBuckets.read(s, s"$dir/grouped"))),
        s"$dir/pbands", "overwrite", bandCol = "band_idx", bucketCol = "band_val")
      // reconverge the append-generation fence (GenStamp) — the layout
      // now reflects the grouped table exactly
      GenStamp.syncDerived(s, s"$dir/grouped", s"$dir/pbands")
    }
    }

  /** Assign-only append of a new video batch. Caller owns asset_id
    * uniqueness (Ledger discipline — see the image/audio index
    * appends). */
  def appendToVideoHashIndex(s: SparkSession, batch: DataFrame, dir: String): Unit =
    appendVideoHashes(s, videoFrameHashes(batch).localCheckpoint(false), dir)

  /** Append PRE-COMPUTED frame hashes (asset_id, frame_idx, ahash) —
    * the ingest loop's path, where one decode pass feeds gate, dedup,
    * probe, and this append. `hashed` must be materialized (barriered)
    * by the caller; rows are collapsed + grouped before storage. */
  def appendVideoHashes(s: SparkSession, hashed: DataFrame,
      dir: String): Unit = WriterLock.withLock(dir) {
    requireVideoMeta(s, dir)
    val hasLayout = BandBuckets.exists(s, s"$dir/pbands")
    val wasInSync = !hasLayout ||
      GenStamp.read(s, s"$dir/grouped") == GenStamp.read(s, s"$dir/pbands")
    val gen = if (hasLayout) GenStamp.beginAppend(s, s"$dir/grouped") else 0L
    IdBuckets.write(groupedVideoRows(hashed.select("asset_id", "frame_idx", "ahash")),
      "asset_id", s"$dir/grouped", "append")
    // keep the probe layout in sync — never CREATE a partial one
    // (pre-layout indexes stay on the full-scan fallback until
    // writeVideoProbeLayout derives the whole table). The grouped +
    // pbands pair is fenced (GenStamp): a crash between the commits
    // leaves the stamps diverged and probes take the full-scan
    // fallback; a layout found ALREADY diverged heals by re-derivation.
    if (hasLayout) {
      if (wasInSync) {
        BandBuckets.write(
          videoProbeRows(collapseFrames(hashed.select("asset_id", "frame_idx", "ahash"))),
          s"$dir/pbands", "append", bandCol = "band_idx", bucketCol = "band_val")
        GenStamp.stamp(s, s"$dir/pbands", gen)
      } else writeVideoProbeLayout(s, dir)
    }
  }

  /** Takedown: O(ids) tombstone append. */
  def deleteFromVideoHashIndex(s: SparkSession, ids: DataFrame, dir: String): Unit =
    Tombstones.append(s, ids, dir)

  /** Fold tombstones into the grouped table, then clear them —
    * id-bucketed, so only the partitions holding tombstoned videos are
    * rewritten. */
  def compactVideoHashIndex(s: SparkSession, dir: String): Unit =
    WriterLock.withLock(dir) {
    // probe layout first: the deleted videos' band rows are located from
    // the not-yet-folded grouped table via its id-bucket directories,
    // bounding the band-partition rewrite (the two schemes compose —
    // see DedupOps.compactMinhashIndex)
    Tombstones.read(s, dir).foreach { t =>
      if (BandBuckets.exists(s, s"$dir/pbands")) {
        val idDirs = t.select(IdBuckets.bucketOf(col("id")).as("b"))
          .distinct().collect().map(_.getInt(0))
        val ids = t.select(col("id").as("asset_id"))
        val deleted = videoProbeRows(collapsedRowsOfGrouped(
          s.read.parquet(s"$dir/grouped")
            .where(col(IdBuckets.Col).isin(idDirs.map(Integer.valueOf).toSeq: _*))
            .join(broadcast(ids), Seq("asset_id"), "left_semi")
            .drop(IdBuckets.Col)))
        BandBuckets.foldIntoBanded(s, s"$dir/pbands", dir, "vid", deleted,
          bandCol = "band_idx", bucketCol = "band_val")
      }
    }
    IdBuckets.foldIntoBucketed(s, s"$dir/grouped", dir, "asset_id")
    Tombstones.clear(s, dir)
  }

  /** Probe: which batch videos near-duplicate an indexed video? Batch
    * frames are decoded + hashed once behind a barrier; candidates come
    * from the banded frame-uid probe (linear in batch frames); the same
    * best-alignment vote as [[videoDupPairs]] decides at video level,
    * with corpus frame counts read from the persisted counts table.
    * Returns (batch_id, corpus_id, aligned_frames, n_batch, n_corpus). */
  def dedupVideosAgainstIndex(s: SparkSession, batch: DataFrame, dir: String,
      maxHamming: Int = HashBanding.DefaultMaxHamming,
      minFrac: Double = 0.5, maxBucket: Int = HashBanding.DefaultMaxBucket,
      symmetric: Boolean = false, minMatchedFrames: Long = 0L): DataFrame =
    dedupVideoHashesAgainstIndex(s, videoFrameHashes(batch).localCheckpoint(false),
      dir, maxHamming, minFrac, maxBucket, symmetric, minMatchedFrames)

  /** Probe from PRE-COMPUTED batch frame hashes (must be barriered by
    * the caller — the ingest loop's single-decode path). Batch side is
    * collapsed here; the stored side is collapsed at write/append time. */
  def dedupVideoHashesAgainstIndex(s: SparkSession, hashed: DataFrame, dir: String,
      maxHamming: Int = HashBanding.DefaultMaxHamming,
      minFrac: Double = 0.5, maxBucket: Int = HashBanding.DefaultMaxBucket,
      symmetric: Boolean = false, minMatchedFrames: Long = 0L): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0, s"minFrac must be in (0, 1], got $minFrac")
    require(minMatchedFrames >= 0L, s"minMatchedFrames must be >= 0, got $minMatchedFrames")
    requireVideoMeta(s, dir)
    val batchCounts = hashed.groupBy(col("asset_id").as("batch_id"))
      .agg(count(lit(1)).as("n_batch"))
    // batch side collapsed here; the stored side is collapsed by
    // construction (write/append). Same weighted vote as videoDupPairs.
    val bCollapsed = requireUidRange(collapseFrames(hashed))
    val batchUids = bCollapsed
      .select((col("asset_id") * MaxFramesPerVideo + col("first_idx")).as("asset_id"),
        col("ahash"))
    val bCnt = bCollapsed.select(
      (col("asset_id") * MaxFramesPerVideo + col("first_idx")).as("batch_id"),
      col("cnt").as("cnt_b"))
    // PRUNED corpus side when the band-partition layout exists: frame
    // candidates, multiplicities AND per-video frame counts all come
    // from literal-pruned reads (BandBuckets.prunedRead for band rows,
    // IdBuckets.prunedById for the candidate videos' n_frames), so the
    // probe reads O(batch frame keys) row groups at any corpus size —
    // output identical to the full-scan fallback (spec law). Tombstones
    // apply at VIDEO granularity via the carried `vid` column.
    val usePruned = GenStamp.prunedProbeOk(s, s"$dir/grouped", s"$dir/pbands",
      "video", "VideoCodec.writeVideoProbeLayout (or the append retry)")
    val b = HashBanding.bandedBatch(batchUids)
    val (frameMatches, cCnt, corpusCounts) =
      if (usePruned) {
        val prunedC = Tombstones.applyTo(s,
          BandBuckets.prunedRead(s, s"$dir/pbands",
            b.select("band_idx", "band_val"),
            bandCol = "band_idx", bucketCol = "band_val"),
          dir, "vid")
        val c0 = prunedC.select(col("uid").as("corpus_id"),
          col("ahash").as("c_hash"), col("band_idx"), col("band_val"))
        // every candidate frame has >= 1 band row in the pruned scan,
        // so its multiplicity rides along — no grouped-table read
        val cnts = prunedC
          .select(col("uid").as("corpus_id"), col("cnt").as("cnt_c")).distinct()
        // barrier: the frame-match frame feeds the bounded vid collect
        // AND the alignment vote — without it the banded probe join
        // re-runs per job (the pruned probe's fixed per-trigger
        // constant, BASELINE.md r15)
        val matches = HashBanding.probeOnBanded(b, c0, maxHamming, maxBucket)
          .localCheckpoint(false)
        // n_frames only for the candidate VIDEOS: bounded collect ->
        // point-read of the grouped table (full read past the cap)
        val vidRows = matches
          .select(expr(s"corpus_id div $MaxFramesPerVideo").as("vid")).distinct()
          .limit(IdBuckets.MaxIdLiterals + 1).collect()
        val groupedView =
          if (vidRows.length <= IdBuckets.MaxIdLiterals)
            IdBuckets.prunedById(s, s"$dir/grouped", "asset_id",
              vidRows.map(_.getLong(0)).toSeq)
          else IdBuckets.read(s, s"$dir/grouped")
        val counts = Tombstones.applyTo(s, groupedView, dir, "asset_id")
          .select(col("asset_id").as("corpus_id"), col("n_frames").as("n_corpus"))
        (matches, cnts, counts)
      } else {
        val grouped = Tombstones.applyTo(
          s, IdBuckets.read(s, s"$dir/grouped"), dir, "asset_id")
        val stored = requireUidRange(collapsedRowsOfGrouped(grouped))
        val storedUids = stored
          .select((col("asset_id") * MaxFramesPerVideo + col("first_idx")).as("asset_id"),
            col("ahash"))
        val cnts = stored.select(
          (col("asset_id") * MaxFramesPerVideo + col("first_idx")).as("corpus_id"),
          col("cnt").as("cnt_c"))
        val counts = grouped
          .select(col("asset_id").as("corpus_id"), col("n_frames").as("n_corpus"))
        (HashBanding.probe(batchUids, storedUids, maxHamming, maxBucket),
          cnts, counts)
      }
    val aligned = frameMatches
      .join(bCnt, Seq("batch_id"))
      .join(cCnt, Seq("corpus_id"))
      .select(expr(s"batch_id div $MaxFramesPerVideo").as("b_vid"),
        (col("batch_id") % MaxFramesPerVideo).as("b_idx"),
        expr(s"corpus_id div $MaxFramesPerVideo").as("c_vid"),
        (col("corpus_id") % MaxFramesPerVideo).as("c_idx"),
        col("cnt_b"), col("cnt_c"))
      .groupBy(col("b_vid"), col("c_vid"),
        (col("b_idx") - col("c_idx")).as("delta"), col("b_idx"))
      .agg(max(least(col("cnt_b"), col("cnt_c"))).as("w"))
      .groupBy(col("b_vid"), col("c_vid"), col("delta"))
      .agg(sum(col("w")).as("matches"))
      .groupBy(col("b_vid").as("batch_id"), col("c_vid").as("corpus_id"))
      .agg(max(col("matches")).as("aligned_frames"))
    val denom =
      if (symmetric) greatest(col("n_batch"), col("n_corpus"))
      else least(col("n_batch"), col("n_corpus"))
    aligned
      .join(batchCounts, Seq("batch_id"))
      .join(corpusCounts, Seq("corpus_id"))
      .where(col("aligned_frames") >= denom * minFrac &&
        col("aligned_frames") >= minMatchedFrames)
      .select(col("batch_id"), col("corpus_id"), col("aligned_frames"),
        col("n_batch"), col("n_corpus"))
  }

  /** Asset family for video dedup with planted duplicates, mirroring the
    * image/audio fixtures: doc_ids ≡ 0 (mod 5) and their ≡ 4 (mod 5)
    * partner share a texture KEY — the partner is a bit-identical
    * re-encode for even pair index and a TRUNCATED copy (last frame
    * dropped) for odd (ids ≡ 9 mod 10). All other docs get their own
    * key; textured frames make chance frame collisions vanishing. Every
    * video has 4 frames (3 when truncated) of key-and-frame-seeded
    * texture. */
  def dedupAssets(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(Multimodal.schema))
    docs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val key = if (id % 5 == 4) id - 4 else id
        val nf = if (id % 10 == 9) 3 else 4
        val w = (16 + (key % 16)).toInt
        val h = (16 + ((key / 16) % 16)).toInt
        val frames = (0 until nf).map { f =>
          ImageCodec.encodeGrayPng(w, h,
            ImageCodec.texturedLuma(key * 131 + f * 1000003L, w, h))
        }
        val container = encodeContainer(frames)
        Row(id, "video", container,
          Row("video/x-graft-gvi", Int.box(w), Int.box(h), container.length.toLong))
      }
    }(enc)
  }
}
