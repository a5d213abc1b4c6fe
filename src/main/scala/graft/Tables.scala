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

  /** `events.ts` is Parquet TIMESTAMP(NANOS); Spark 4 refuses it unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (SURVEY §7.3 G1). The data
    * is µs-aligned, so integer-dividing the raw nanos by 1000 is lossless
    * (G2: must be integer `div`, not `/1000` — double arithmetic loses µs
    * precision at 1.7e18). Exposes:
    *   - ts_us BIGINT epoch microseconds (use in declared-query output, G3)
    *   - ts    TIMESTAMP (µs precision) for interval/window arithmetic
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
