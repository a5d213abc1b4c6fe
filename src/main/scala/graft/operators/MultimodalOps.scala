package graft.operators

import graft.Q
import graft.functions.GraftFunctions
import graft.sources.{AudioCodec, ImageCodec, Multimodal, VideoCodec}
import org.apache.spark.sql.functions._

/** Declared queries over REAL multimodal decode (SURVEY §2 family I-mm).
  *
  * The assets are synthesized deterministically from `documents`
  * ([[graft.sources.ImageCodec]]/[[graft.sources.AudioCodec]]): every
  * pattern parameter is exact integer arithmetic on (doc_id, n_chars), so
  * the DuckDB oracle reproduces each statistic in closed form — while the
  * Spark side gets its numbers by genuinely DECODING the PNG/WAV payloads
  * with the JDK codecs. A hash match therefore proves the full
  * encode → binary column → decode → stats round-trip, not just the
  * arithmetic.
  *
  * Scale shape shared by all of these: column-pruned scan → one stateless
  * mapPartitions decode pass (no shuffle) → the query's own agg/sort. The
  * only shuffles are the final aggregates; decode failures surface as
  * `ok = false` rows, never task failures.
  */
object MultimodalOps {

  val queries: Map[String, Q] = Map(
    // Per-image stats off a real javax.imageio decode. All-BIGINT output
    // (determinism rule 6: no HUGEINT drift, no float convention).
    "q_image_stats" -> ((s, d) => {
      ImageCodec.imageStats(ImageCodec.imageAssets(s, d))
        .where(col("ok"))
        .select(col("asset_id"), col("width"), col("height"),
          col("channels"), col("n_pixels"), col("sum_luma"))
        .orderBy("asset_id")
    }),

    // Global 16-bin luma histogram: per-image bins come from decoded
    // pixels, then one partial-agg shuffle folds them corpus-wide.
    "q_image_hist" -> ((s, d) => {
      ImageCodec.imageStats(ImageCodec.imageAssets(s, d))
        .where(col("ok"))
        .select(posexplode(col("hist")).as(Seq("bucket", "cnt")))
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(sum("cnt").as("n_pixels"))
        .orderBy("bucket")
    }),

    // Perceptual near-dup pairs over planted duplicates: decode → 256-bit
    // aHash → 16x16-bit band join → exact popcount verify. ✗ rows+spec
    // tier (the aHash is an engine hash, same designation as
    // q_dedup_simhash); semantics pinned in MultimodalCodecSpec.
    "q_image_dedup" -> ((s, d) => {
      ImageCodec.perceptualDupPairs(
        ImageCodec.imageHashes(ImageCodec.dedupAssets(s, d)))
        .orderBy("a_id", "b_id")
    }),

    // Perceptual audio near-dup pairs over planted duplicates (exact
    // copies + 3/4-volume re-levels): decode → envelope hash → banded
    // self-join. ✗ rows+spec tier like q_image_dedup; semantics pinned
    // in MultimodalCodecSpec.
    "q_audio_dedup" -> ((s, d) => {
      AudioCodec.perceptualDupPairs(
        AudioCodec.audioHashes(AudioCodec.dedupAssets(s, d)))
        .orderBy("a_id", "b_id")
    }),

    // Image near-dup CLUSTERS: the keep-one-per-cluster view a curation
    // pipeline actually acts on (pairs are evidence; clusters are the
    // decision). HashBanding.clusters = banded pairs → pointer-doubling
    // connected components → (asset, cluster = min member, members); the
    // same call works on any (asset_id, ahash) frame — audio envelope
    // hashes included. ✗ rows+spec tier like q_image_dedup; semantics
    // pinned in MultimodalCodecSpec.
    "q_image_dedup_clusters" -> ((s, d) => {
      val hashes = ImageCodec.imageHashes(ImageCodec.dedupAssets(s, d))
        .where(col("ok")).select("asset_id", "ahash").localCheckpoint(false)
      graft.sources.HashBanding.clusters(hashes).orderBy("asset_id")
    }),

    // Audio near-dup CLUSTERS — the audio twin of q_image_dedup_clusters
    // over the same modality-agnostic HashBanding.clusters engine (the
    // envelope hash is just another (asset_id, ahash) frame). Completes
    // the keep-one-per-cluster curation view for the audio modality:
    // q_audio_dedup's pairs are the evidence, this is the decision. ✗
    // rows+spec tier; cluster law (components == union-find over the
    // pair graph) pinned in MultimodalCodecSpec.
    "q_audio_dedup_clusters" -> ((s, d) => {
      val hashes = AudioCodec.audioHashes(AudioCodec.dedupAssets(s, d))
        .where(col("ok")).select("asset_id", "ahash").localCheckpoint(false)
      graft.sources.HashBanding.clusters(hashes).orderBy("asset_id")
    }),

    // Video near-dup CLUSTERS through the alignment-vote pair graph
    // (VideoCodec.videoDupClusters — HashBanding.clusters cannot serve
    // video because its edges are per-pair votes, not plain hash pairs).
    // Containment vote semantics, matching q_video_dedup. ✗ rows+spec
    // tier; cluster law pinned in MultimodalCodecSpec.
    "q_video_dedup_clusters" -> ((s, d) => {
      VideoCodec.videoDupClusters(
        VideoCodec.videoFrameHashes(VideoCodec.dedupAssets(s, d)))
        .orderBy("asset_id")
    }),

    // Per-audio amplitude stats off a real javax.sound WAV decode.
    "q_audio_stats" -> ((s, d) => {
      AudioCodec.audioStats(AudioCodec.audioAssets(s, d))
        .where(col("ok"))
        .select(col("asset_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("sum_abs"), col("peak"))
        .orderBy("asset_id")
    }),

    // Per-frame video stats: container parse + real ImageIO decode of
    // EVERY frame, one row per frame. r9: parse-then-explode — the
    // decode fans out per frame row, so one long container can't
    // straggle a task (see VideoCodec.videoFrameStats).
    "q_video_frames" -> ((s, d) => {
      VideoCodec.videoFrameStats(VideoCodec.videoAssets(s, d))
        .orderBy("asset_id", "frame_idx")
    }),

    // Video-level near-dup pairs over planted re-encodes and truncations:
    // per-frame aHash256 → frame-granular banded join → best-alignment
    // vote per video pair (order-aware). ✗ rows+spec tier like the other
    // perceptual dedups; semantics pinned in MultimodalCodecSpec.
    "q_video_dedup" -> ((s, d) => {
      VideoCodec.videoDupPairs(
        VideoCodec.videoFrameHashes(VideoCodec.dedupAssets(s, d)))
        .orderBy("a_id", "b_id")
    }),

    // Multimodal retrieval composition: decoded-image features (real
    // codec through the extractFeatures seam) → brute-force cosine top-10
    // against one query image's features. ✗ rows+spec tier: the features
    // are float divisions of decoded integer counts, so no engine-exact
    // SQL twin exists; semantics pinned in MultimodalCodecSpec against a
    // local ground-truth ranking. Same scale shape as q_knn_cosine:
    // single feature pass + 1-row broadcast + TakeOrderedAndProject.
    "q_image_knn" -> ((s, d) => {
      GraftFunctions.register(s)
      val feats = Multimodal.extractFeatures(
        ImageCodec.imageAssets(s, d), ImageCodec.ImageFeatureCodec, dim = 16,
        partitionsOverride = Some(s.sparkContext.defaultParallelism))
        .localCheckpoint(false) // one decode pass feeds both query row and corpus scan
      val q = feats.where(col("asset_id") === 0).select(col("features").as("qf"))
      feats.where(col("asset_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("sim", round(expr("graft_dot(features, qf)"), 6))
        .select("asset_id", "sim")
        .orderBy(col("sim").desc, col("asset_id").asc)
        .limit(10)
    }),

    // Corpus inventory across all FOUR modalities: per-modality asset
    // count and total DECODED logical bytes (text: chars; image: pixels x
    // channels; audio: 2 bytes per sample; video: frame pixels summed
    // over the container) — the numbers a training-mix planner actually
    // budgets with. Container sizes (PNG deflate output) are deliberately
    // NOT the metric: they are codec-version-dependent, logical size is
    // not.
    //
    // Scale shape (r9): this is a METADATA pass, not a decode pass —
    // every number comes from codec HEADERS (ImageCodec.peekDims /
    // AudioCodec.peekFormat / VideoCodec.videoFrameDims), so the job
    // reads a few hundred bytes per asset instead of inflating the
    // corpus. At 100 TB that is the whole job. (Measured at sf0.1:
    // 6.2 s full-decode -> header-only, see BASELINE.) Text reads
    // meta.n_bytes (defined as n_chars), which matches the oracle for
    // any corpus where octet_length(payload) would diverge on non-ASCII.
    // Image channel counts follow peekDims' HEADER convention (stored
    // components, not decoded raster channels — palette formats count 1,
    // see ImageCodec.peekDims scaladoc), so totals are "as-stored
    // logical bytes" and stable across codec paths.
    "q_asset_inventory" -> ((s, d) => {
      val text = Multimodal.assetsFromDocuments(s, d)
        .select(col("modality"), col("meta.n_bytes").as("logical_bytes"))
      val image = ImageCodec.imageMeta(ImageCodec.imageAssets(s, d))
        .where(col("ok"))
        .select(lit("image").as("modality"),
          (col("width") * col("height") * col("channels")).as("logical_bytes"))
      val audio = AudioCodec.audioMeta(AudioCodec.audioAssets(s, d))
        .where(col("ok"))
        .select(lit("audio").as("modality"),
          (col("n_samples") * col("channels") * lit(2L)).as("logical_bytes"))
      val video = VideoCodec.videoFrameDims(VideoCodec.videoAssets(s, d))
        .groupBy("asset_id")
        .agg(sum(col("width") * col("height")).as("logical_bytes"))
        .select(lit("video").as("modality"), col("logical_bytes"))
      text.unionByName(image).unionByName(audio).unionByName(video)
        .groupBy("modality")
        .agg(count(lit(1)).as("n_assets"), sum("logical_bytes").as("total_bytes"))
        .orderBy("modality")
    }),
  )

  /** The image/audio pattern CTEs mirror ImageCodec.pattern /
    * AudioCodec.sampleCount exactly; see those scaladocs for the closed
    * forms. Everything is BIGINT arithmetic end to end. */
  val oracle: Map[String, String] = Map(
    "q_image_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         8 + (n_chars % 24) AS w,
        |         8 + (doc_id % 24) AS h,
        |         (8 + (n_chars % 24)) * (8 + (doc_id % 24)) AS npix,
        |         (doc_id * 31 + 7) % 256 AS a,
        |         (doc_id * 97 + 13) % 256 AS b,
        |         (n_chars * 2654435761) % ((8 + (n_chars % 24)) * (8 + (doc_id % 24))) AS k
        |  FROM documents)
        |SELECT doc_id AS asset_id,
        |       CAST(w AS BIGINT) AS width,
        |       CAST(h AS BIGINT) AS height,
        |       CAST(1 AS BIGINT) AS channels,
        |       CAST(npix AS BIGINT) AS n_pixels,
        |       CAST(k * a + (npix - k) * b AS BIGINT) AS sum_luma
        |FROM p
        |ORDER BY asset_id""".stripMargin,

    "q_image_hist" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         (8 + (n_chars % 24)) * (8 + (doc_id % 24)) AS npix,
        |         (doc_id * 31 + 7) % 256 AS a,
        |         (doc_id * 97 + 13) % 256 AS b,
        |         (n_chars * 2654435761) % ((8 + (n_chars % 24)) * (8 + (doc_id % 24))) AS k
        |  FROM documents),
        |u AS (
        |  SELECT a // 16 AS bucket, k AS cnt FROM p
        |  UNION ALL
        |  SELECT b // 16 AS bucket, npix - k AS cnt FROM p)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(sum(cnt) AS BIGINT) AS n_pixels
        |FROM u GROUP BY bucket
        |ORDER BY bucket""".stripMargin,

    "q_audio_stats" ->
      """WITH d AS (
        |  SELECT doc_id, 64 + ((n_chars * 7 + doc_id) % 192) AS n FROM documents),
        |g AS (
        |  SELECT doc_id, n, unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i FROM d),
        |s AS (
        |  SELECT doc_id, n, ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v FROM g)
        |SELECT doc_id AS asset_id,
        |       CAST(16000 AS BIGINT) AS sample_rate,
        |       CAST(1 AS BIGINT) AS channels,
        |       CAST(max(n) AS BIGINT) AS n_samples,
        |       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |       CAST(max(abs(v)) AS BIGINT) AS peak
        |FROM s GROUP BY doc_id
        |ORDER BY asset_id""".stripMargin,

    "q_video_frames" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars, 2 + (doc_id % 4) AS nf FROM documents),
        |g AS (
        |  SELECT doc_id, n_chars, unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS f FROM d),
        |p AS (
        |  SELECT doc_id, f,
        |         8 + ((n_chars + f) % 24) AS w,
        |         8 + ((doc_id + f * 1000003) % 24) AS h,
        |         (8 + ((n_chars + f) % 24)) * (8 + ((doc_id + f * 1000003) % 24)) AS npix,
        |         ((doc_id + f * 1000003) * 31 + 7) % 256 AS a,
        |         ((doc_id + f * 1000003) * 97 + 13) % 256 AS b,
        |         ((n_chars + f) * 2654435761) %
        |           ((8 + ((n_chars + f) % 24)) * (8 + ((doc_id + f * 1000003) % 24))) AS k
        |  FROM g)
        |SELECT doc_id AS asset_id,
        |       CAST(f AS BIGINT) AS frame_idx,
        |       CAST(w AS BIGINT) AS width,
        |       CAST(h AS BIGINT) AS height,
        |       CAST(k * a + (npix - k) * b AS BIGINT) AS sum_luma
        |FROM p
        |ORDER BY asset_id, frame_idx""".stripMargin,

    "q_asset_inventory" ->
      """WITH img AS (
        |  SELECT (8 + (n_chars % 24)) * (8 + (doc_id % 24)) AS npix FROM documents),
        |aud AS (
        |  SELECT 64 + ((n_chars * 7 + doc_id) % 192) AS n FROM documents),
        |vidg AS (
        |  SELECT doc_id, n_chars,
        |         unnest(generate_series(0, CAST(2 + (doc_id % 4) - 1 AS BIGINT))) AS f
        |  FROM documents),
        |vid AS (
        |  SELECT doc_id,
        |         sum((8 + ((n_chars + f) % 24)) * (8 + ((doc_id + f * 1000003) % 24))) AS vbytes
        |  FROM vidg GROUP BY doc_id)
        |SELECT modality, n_assets, total_bytes FROM (
        |  SELECT 'audio' AS modality, CAST(count(*) AS BIGINT) AS n_assets,
        |         CAST(sum(2 * n) AS BIGINT) AS total_bytes FROM aud
        |  UNION ALL
        |  SELECT 'image', CAST(count(*) AS BIGINT), CAST(sum(npix) AS BIGINT) FROM img
        |  UNION ALL
        |  SELECT 'text', CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'video', CAST(count(*) AS BIGINT), CAST(sum(vbytes) AS BIGINT) FROM vid)
        |ORDER BY modality""".stripMargin,
  )
}
