package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental DISTINCT-COUNT accounting over an append-only ingest —
  * the sketch-table pattern every 100 TB pipeline ends up needing for
  * cardinality monitoring (vocabulary growth, distinct doc hashes per
  * source, dedup-rate dashboards): re-scanning the corpus to answer
  * "how many distinct X so far" is a full-table pass per question,
  * while a per-batch HLL sketch table answers it from kilobytes.
  *
  * Built on Spark's native DataSketches HLL expressions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate` — real
  * mergeable sketches, NOT approx_count_distinct's one-shot estimate):
  * each ingest batch appends one row per key carrying its serialized
  * sketch (+ exact row count); any later question merges the relevant
  * sketch rows — commutative, idempotent under re-merge, and the
  * re-appended-batch case degrades gracefully (a duplicate batch can
  * only re-OR the same registers; see the union-idempotence law in
  * SketchLedgerSpec).
  *
  * Error contract: standard HLL — ~1.04/√2^lgk relative error (~1.6% at
  * the default lgConfigK=12, ~520 bytes per key). `lgConfigK` is pinned
  * in the ledger's 1-row meta at first append and enforced on every
  * later append: merging sketches of different precision is a silent
  * accuracy downgrade, so a mismatch fails loudly instead (the
  * IndexMeta discipline, parameter tier).
  *
  * The `rows` column is exact bookkeeping (sums linearly), giving every
  * reader the (exact processed rows, approximate distinct) pair that
  * dedup-rate monitoring actually wants.
  */
object SketchLedger {

  private def fs(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def metaPath(dir: String) = s"$dir/meta"

  private def readMeta(s: SparkSession, dir: String): Option[(Int, Seq[String], String)] =
    if (fs(s, dir).exists(new Path(metaPath(dir)))) {
      val m = s.read.parquet(metaPath(dir)).head()
      Some((m.getAs[Int]("lgk"), m.getSeq[String](m.fieldIndex("keys")).toList,
        m.getAs[String]("value")))
    } else None

  /** Append one ingest batch's sketches. `keys` group the accounting
    * (e.g. Seq("source")), `value` is the column whose distinct
    * cardinality is tracked, `batchId` is the caller's batch label
    * (the Ledger step id in the composed pipelines) — kept per row so a
    * ledger can also be queried per batch or re-derived after a batch
    * is disowned. First append stamps (lgk, keys, value) into the meta;
    * later appends must match all three. */
  def append(s: SparkSession, batch: DataFrame, keys: Seq[String], value: String,
      dir: String, batchId: String, lgConfigK: Int = 12): Unit = {
    require(keys.nonEmpty, "SketchLedger.append: at least one key column required")
    require(lgConfigK >= 4 && lgConfigK <= 21,
      s"lgConfigK must be in [4, 21], got $lgConfigK")
    readMeta(s, dir).foreach { case (lgk, ks, v) =>
      require(lgk == lgConfigK && ks == keys && v == value,
        s"SketchLedger at $dir was created with (lgk=$lgk, keys=$ks, value=$v); " +
          s"this append uses (lgk=$lgConfigK, keys=$keys, value=$value) - merging " +
          "mixed-parameter sketches silently degrades accuracy, so it is refused. " +
          "Start a new ledger dir for new parameters.")
    }
    val sk = batch
      .groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($value, $lgConfigK)").as("sketch"),
        count(col(value)).as("rows"))
      .withColumn("batch_id", lit(batchId))
    sk.write.mode("append").parquet(s"$dir/sketches")
    if (readMeta(s, dir).isEmpty) {
      import s.implicits._
      Seq((lgConfigK, keys, value)).toDF("lgk", "keys", "value")
        .coalesce(1).write.mode("overwrite").parquet(metaPath(dir))
    }
  }

  /** Distinct estimate + exact processed rows per key, merged across
    * every appended batch — reads only the sketch table (bytes per
    * key·batch), never the corpus. */
  def distinctByKey(s: SparkSession, dir: String): DataFrame = {
    val (_, keys, _) = readMeta(s, dir).getOrElse(
      sys.error(s"SketchLedger at $dir has no meta - nothing was ever appended"))
    s.read.parquet(s"$dir/sketches")
      .groupBy(keys.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("distinct_est"),
        sum(col("rows")).as("rows"))
      .orderBy(keys.map(c => col(c).asc): _*)
  }

  /** Global distinct estimate across ALL keys and batches — one merge
    * over the whole sketch table (valid because every sketch shares the
    * meta-pinned lgConfigK). */
  def distinctTotal(s: SparkSession, dir: String): Long = {
    readMeta(s, dir).getOrElse(
      sys.error(s"SketchLedger at $dir has no meta - nothing was ever appended"))
    s.read.parquet(s"$dir/sketches")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("distinct_est"))
      .head().getLong(0)
  }
}
