package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated testdata layout
  * (TESTDATA.md): one file per table at `$sfDir/<name>.parquet`.
  *
  * Scale note: each loader is a plain `spark.read.parquet` so Catalyst can
  * push filters / prune columns into the scan. On a real cluster the same
  * call fans out over all files/row-groups; nothing here is local-mode-only.
  */
object Tables {

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** `events.ts` has shipped under two physical types across testdata
    * generations, so the loader adapts by schema:
    *   - Parquet TIMESTAMP(NANOS): Spark 4 refuses it unless
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (SURVEY §7.3 G1), then
    *     surfaces it as BIGINT nanos. The data is µs-aligned, so integer-
    *     dividing by 1000 is lossless (G2: must be integer `div`, not
    *     `/1000` — double arithmetic loses µs precision at 1.7e18).
    *   - Parquet TIMESTAMP(MICROS) (r9 testdata): read natively as
    *     TIMESTAMP/TIMESTAMP_NTZ; `unix_micros` after a cast recovers the
    *     same epoch micros (session timeZone is UTC everywhere, matching
    *     the oracle's `epoch_us(CAST(ts AS TIMESTAMP))` on the naive type).
    * Exposes:
    *   - ts_us BIGINT epoch microseconds (use in declared-query output, G3)
    *   - ts    TIMESTAMP (µs precision) for interval/window arithmetic
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
