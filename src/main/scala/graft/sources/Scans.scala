package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scan/source operators (SURVEY §2.A). The projection+filter scan is the
  * pushdown showcase: `.explain` shows PushedFilters and a 3-column
  * ReadSchema — the parquet reader never materializes the other columns.
  */
object Scans {

  val queries: Map[String, Q] = Map(
    // Column pruning + predicate pushdown into the parquet scan.
    // (l_orderkey, l_linenumber) is not unique — l_extendedprice completes
    // the total order (G6).
    "scan_parquet_project" -> ((s, d) => {
      s.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .where(col("l_extendedprice") > 90000)
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc, col("l_extendedprice").asc)
    }),

    // Multi-file scan: one read over several paths (same file twice here —
    // the testdata has one file per table), rows concatenated.
    "scan_union_files" -> ((s, d) => {
      val p = s"$d/region.parquet"
      s.read.parquet(p, p)
        .groupBy("r_regionkey", "r_name")
        .agg(count(lit(1)).as("n"))
        .orderBy("r_regionkey")
    }),
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_extendedprice > 90000
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC""".stripMargin,

    "scan_union_files" ->
      """SELECT r_regionkey, r_name, count(*) AS n FROM (
        |  SELECT * FROM region UNION ALL SELECT * FROM region) u
        |GROUP BY r_regionkey, r_name ORDER BY r_regionkey""".stripMargin,
  )
}
