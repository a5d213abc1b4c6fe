package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-posture utilities (SURVEY §4.3 "100 TB posture"): skew salting
  * and storage layout. These are config+layout tools, not custom
  * operators — spill, vectorization, and codegen are already Spark's.
  */
object Scale {

  /** Equi-join with skew salting: rows of the (big, skewed) side scatter
    * across `salts` sub-keys; the small side replicates once per salt.
    * Same result set as a plain join, but a hot key's rows land on
    * `salts` reducers instead of one. Use when AQE's skew split isn't
    * available (e.g. a broadcast-disabled build side) or a key is
    * pathological. The salt is derived from a hash of the big side's
    * whole row, so the scatter is deterministic.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    bigS.join(smallS, bigS(bigKey) === smallS(smallKey) && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }

  /** On-disk byte size of a table path (Hadoop FS, so s3a://, hdfs://
    * resolve) — a planning-time stat for broadcast decisions, no job. */
  def sourceBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Pin a broadcast only when an upper bound on the relation's source
    * bytes is genuinely shippable to every executor; above the threshold
    * the plan is left to AQE (which will still broadcast at runtime if
    * the built side turns out small). This is how a fact-DERIVED relation
    * gets the small-scale broadcast win without the 100 TB OOM: the
    * decision input is the fact table's on-disk size, not a guess. */
  def broadcastIfSmall(df: DataFrame, upperBoundBytes: Long,
      threshold: Long = 64L << 20): DataFrame =
    if (upperBoundBytes <= threshold) broadcast(df) else df

  /** Hive-style partitioned parquet layout: readers prune whole
    * directories on the partition key (PartitionFilters in the scan). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed layout: co-locates join/agg keys so equal-bucketed joins
    * skip their shuffle entirely. Table-catalog based (bucketing metadata
    * lives in the catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
