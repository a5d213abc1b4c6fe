package graft.sources

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
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

  private val frameStatsSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("sum_luma", LongType, nullable = false),
  ))

  /** Container parse + REAL ImageIO decode of every `everyN`th frame,
    * one output row per decoded frame. flatMap-shaped: an asset's frames
    * are emitted lazily, so a long video streams through the operator
    * instead of buffering. Frames that fail image decode are skipped
    * (same containment as the parse). */
  def videoFrameStats(assets: DataFrame, everyN: Int = 1): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameStatsSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        decodeContainer(r.getAs[Array[Byte]]("payload")).iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .flatMap { case (frame, idx) =>
            ImageCodec.decodeLuma(frame).map { d =>
              var sum = 0L
              var i = 0
              while (i < d.luma.length) { sum += d.luma(i); i += 1 }
              Row(id, idx.toLong, d.width.toLong, d.height.toLong, sum)
            }
          }
      }
    }(enc)
  }
}
