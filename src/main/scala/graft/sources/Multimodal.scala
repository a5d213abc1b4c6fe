package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus a batched
  * feature-extraction operator.
  *
  * The decode step is STUBBED (this container has no image/audio codecs) —
  * `StubCodec` produces deterministic fake features from the bytes. The
  * Spark-side plumbing is real: schema, per-partition batch shape,
  * size-bounded repartitioning, and the mapPartitions feature extractor
  * are exactly what a real codec would plug into (swap `Codec`).
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
    )), nullable = false),
  ))

  /** Decoder contract a real implementation would satisfy. */
  trait Codec extends Serializable {
    /** payload bytes → fixed-width feature vector */
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake decode: a real build swaps this for an actual
    * image/audio decoder. Features are a seeded rolling hash of the
    * bytes — stable across runs and partitionings. */
  object StubCodec extends Codec {
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      var j = 0
      while (j < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(j) = (h % 1000).toFloat / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Derive a multimodal asset table from `documents` (text bytes standing
    * in for real payloads — deterministic, no external data needed). */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").as("asset_id"),
      lit("text").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        col("n_chars").as("n_bytes")).as("meta"))
  }

  /** Frame sampling for video-like payloads: the payload splits into
    * fixed `frameBytes` chunks ("frames") and every `everyN`th is kept,
    * one output row per kept frame with its index. The chunking stands in
    * for a real frame decoder; the Spark-side shape is the real thing —
    * per-row array build + `explode` (a Generator), so frames STREAM into
    * downstream operators inside codegen instead of materializing a
    * frames array per asset, and a 100 TB video table fans out linearly.
    * Null payloads produce no rows (explode of null). */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 1024, everyN: Int = 2): DataFrame = {
    require(frameBytes >= 1 && everyN >= 1)
    assets
      .withColumn("nf",
        greatest(ceil(length(col("payload")).cast("double") / frameBytes).cast("int"), lit(1)))
      .select(col("asset_id"), col("modality"),
        explode(expr(
          s"transform(filter(sequence(0, nf - 1), i -> i % $everyN = 0), " +
            s"i -> named_struct('frame_idx', i, 'frame', substring(payload, i * $frameBytes + 1, $frameBytes)))")).as("f"))
      .select(col("asset_id"), col("modality"),
        col("f.frame_idx").as("frame_idx"), col("f.frame").as("frame"))
  }

  /** Resize stub at the codec boundary: truncate the payload to
    * `targetBytes` (a real build swaps in an image scaler) and keep the
    * metadata's n_bytes consistent. Pure per-row projection — the
    * downstream contract (payload within a size budget, meta in sync) is
    * what matters for pipeline sizing. */
  def resizeToBytes(assets: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes >= 1)
    assets
      .withColumn("payload", substring(col("payload"), 1, targetBytes))
      .withColumn("meta",
        col("meta").withField("n_bytes", least(col("meta.n_bytes"), lit(targetBytes.toLong))))
  }

  /** Batched feature extraction: size-aware repartition (so one task never
    * holds more than ~`targetBytesPerTask` of payload), then a
    * mapPartitions pass handing the codec whole batches — the Scala
    * analogue of mapInPandas batch shape. Output schema: (asset_id,
    * modality, features array<float>). */
  def extractFeatures(assets: DataFrame, codec: Codec = StubCodec, dim: Int = 16,
      targetBytesPerTask: Long = 64L * 1024 * 1024,
      partitionsOverride: Option[Int] = None): DataFrame = {
    val spark = assets.sparkSession
    // Partition count so one task holds at most ~targetBytesPerTask of
    // PAYLOAD. Catalyst's planning-time size estimate is the free fast
    // path, but it measures the whole relation (all columns) and is only
    // trustworthy when the plan is a direct file scan with real stats —
    // post-join / non-file inputs can report defaultSizeInBytes
    // (Long.MaxValue) and would clamp this to 10000 near-empty tasks.
    // Anywhere the estimate is unreliable we pay one cheap aggregate job
    // over the pruned meta.n_bytes column (never the payload) instead.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}
    def directScan(p: LogicalPlan): Boolean = p match {
      case Project(_, c) => directScan(c)
      case Filter(_, c)  => directScan(c)
      case _: LeafNode   => true
      case _             => false
    }
    // partitionsOverride skips the sizing entirely — the escape hatch for
    // SYNTHESIZED (non-file-scan) inputs, where the one-pass n_bytes
    // aggregate below would itself cost a full codec pass (q_image_knn
    // measured it at ~half the query).
    val parts = partitionsOverride.getOrElse {
      val plan = assets.queryExecution.optimizedPlan
      val estimate = plan.stats.sizeInBytes
      val statsReliable = directScan(plan) &&
        estimate < BigInt(spark.sessionState.conf.defaultSizeInBytes)
      val totalBytes: BigInt =
        if (statsReliable) estimate
        else BigInt(assets.agg(coalesce(sum(col("meta.n_bytes")), lit(0L)))
          .head().getLong(0))
      ((totalBytes / targetBytesPerTask + 1)
        .min(BigInt(10000)).max(BigInt(1))).toInt
    }
    require(parts >= 1, s"partitionsOverride must be >= 1, got $parts")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val slim = assets.select("asset_id", "modality", "payload")
      .repartition(parts, col("asset_id"))
    slim.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = if (payload == null) null else codec.features(payload, dim)
        Row(r.getLong(0), r.getString(1), feats)
      }
    }(ExpressionEncoder(enc))
  }
}
