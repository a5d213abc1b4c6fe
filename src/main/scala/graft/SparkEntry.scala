package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions.Scalars
import graft.sources.Scans

/** Driver contract — see /root/repo/SURVEY.md §0.1/§7.
  *
  * `queries` is the declared operator inventory (SURVEY §2): every entry is
  * a deterministic DataFrame program; `oracleSql` carries the DuckDB
  * equivalent the driver hash-compares against at sf0.01. Column names and
  * aliases must match pairwise between the two maps.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Relational.queries, Relational.oracle),
    (Aggregates.queries, Aggregates.oracle),
    (Joins.queries, Joins.oracle),
    (Sets.queries, Sets.oracle),
    (Windows.queries, Windows.oracle),
    (Events.queries, Events.oracle),
    (TextOps.queries, TextOps.oracle),
    (VectorOps.queries, VectorOps.oracle),
    (Scalars.queries, Scalars.oracle),
    (DedupOps.queries, DedupOps.oracle),
    (Scans.queries, Scans.oracle),
    (Reshape.queries, Reshape.oracle),
    (Extended.queries, Extended.oracle),
    (CurationOps.queries, CurationOps.oracle),
    (BpeTrainer.queries, BpeTrainer.oracle),
    (MultimodalOps.queries, MultimodalOps.oracle),
    (graft.plans.Scale.queries, graft.plans.Scale.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Joins.queries("q_join_bhj")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = modules.map(_._2).reduce(_ ++ _)
}
