package graft.sources

import graft.Tables
import graft.plans.Scale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data user runs
  * daily, built from the same shapes as the declared operators:
  *
  *   redact (q_text_redact) → quality gate (q_text_quality's score) →
  *   exact-dedup keepers (q_dedup_exact's normalized sha256, min-id
  *   keeper) → deterministic split (q_sample_split's md5 bucket) →
  *   split-partitioned parquet layout.
  *
  * Every stage is a per-row projection or a keyed shuffle: redact and
  * score are codegen'd row maps; the keeper pick is one shuffle on the
  * content hash with a WindowGroupLimit-pruned rank; the split is a
  * per-row hash. Nothing here collects to the driver or joins all-pairs,
  * so the same program curates 500 docs or 100 TB.
  */
object CurationPipeline {

  /** Curate `documents` at `sfDir`: returns (doc_id, lang, source, text,
    * n_tok, score, split) for the kept docs — redacted text, quality
    * score >= `minScore`, one doc per normalized content hash (smallest
    * doc_id wins), each assigned its deterministic train/val/test split. */
  def curate(spark: SparkSession, sfDir: String, minScore: Double = 0.3): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val redacted = docs.withColumn("text", regexp_replace(col("text"), "[0-9]+", "<NUM>"))
    val scored = redacted
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("stop_ratio",
        expr("size(filter(toks, t -> array_contains(array('a','the','of'), t)))").cast("double") /
          col("n_tok"))
      .withColumn("score",
        col("stop_ratio") * 0.3 + least(col("n_tok"), lit(100)).cast("double") / 100.0 * 0.7)
      .where(col("score") >= minScore)
    val keepers = scored
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .withColumn("rn", row_number().over(Window.partitionBy("h").orderBy("doc_id")))
      .where(col("rn") === 1)
    keepers
      .withColumn("b", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("split",
        when(col("b") < "c", "train").when(col("b") < "e", "val").otherwise("test"))
      .select("doc_id", "lang", "source", "text", "n_tok", "score", "split")
  }

  /** Land the curated corpus split-partitioned, so downstream training
    * readers prune to their split's directory. */
  def writeSplits(curated: DataFrame, path: String): Unit =
    Scale.writePartitioned(curated, path, Seq("split"))
}
