package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Projection / filter / sort / limit operators (SURVEY §2.B, §2.F).
  * All predicates are Catalyst-native expressions so they push down to the
  * parquet scan (PushedFilters) and stay inside whole-stage codegen.
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // Compound predicate: AND/OR/NOT, BETWEEN, IN-list, LIKE.
    // NOTE: (l_orderkey, l_linenumber) is NOT unique in this data (verified
    // at every SF) — l_extendedprice completes the total order (G6).
    "q_filter_compound" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(expr(
          "l_shipdate BETWEEN TIMESTAMP_NTZ '1996-01-01 00:00:00' AND TIMESTAMP_NTZ '1996-12-31 23:59:59'" +
            " AND l_returnflag IN ('A','R') AND NOT (l_discount < 0.02) AND l_linestatus LIKE 'F%'"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_returnflag")
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc, col("l_extendedprice").asc)
    }),

    // CASE WHEN bucketing of order totals.
    "q_case_when" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("bucket")
    }),

    // coalesce / nullif / null-test over a derived nullable column.
    "q_null_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("ls", expr("coalesce(nullif(l_linestatus,'F'),'X')"))
        .groupBy(col("l_returnflag"), col("ls"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(expr("nullif(l_discount, 0.0)").isNull, 1).otherwise(0)).as("zero_disc"))
        .orderBy(col("l_returnflag").asc, col("ls").asc)
    }),

    // Arithmetic projection over the full fact table. Deliberately NOT
    // rounded: per-row IEEE arithmetic with a fixed expression tree is
    // bit-identical across engines, while round() at a .xxxx5 boundary is
    // not (Spark HALF_UP vs DuckDB binary rounding — observed divergence).
    "q_project_expr" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          expr("l_extendedprice*(1-l_discount)*(1+l_tax)").as("charge"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc, col("l_extendedprice").asc)
    }),

    // Global ORDER BY + LIMIT — Catalyst fuses to TakeOrderedAndProject,
    // a per-partition top-k + driver merge: no global sort at any scale.
    "q_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
    }),

    // Multi-key sort, mixed direction, explicit null placement (G5).
    "q_sort_multi" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("seg", expr("nullif(c_mktsegment,'BUILDING')"))
        .select("c_custkey", "seg", "c_acctbal")
        .orderBy(col("seg").asc_nulls_first, col("c_acctbal").desc_nulls_last,
          col("c_custkey").asc)
    }),

    // Pagination: LIMIT/OFFSET after a total order.
    "q_limit_offset" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_orderkey").asc)
        .offset(40)
        .limit(20)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        |  AND l_returnflag IN ('A','R') AND NOT (l_discount < 0.02) AND l_linestatus LIKE 'F%'
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC""".stripMargin,

    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_null_funcs" ->
      """SELECT l_returnflag, coalesce(nullif(l_linestatus,'F'),'X') AS ls,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS zero_disc
        |FROM lineitem GROUP BY l_returnflag, ls
        |ORDER BY l_returnflag ASC, ls ASC""".stripMargin,

    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  l_extendedprice*(1-l_discount)*(1+l_tax) AS charge
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,

    "q_sort_multi" ->
      """SELECT c_custkey, nullif(c_mktsegment,'BUILDING') AS seg, c_acctbal
        |FROM customer
        |ORDER BY seg ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey ASC""".stripMargin,

    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC LIMIT 20 OFFSET 40""".stripMargin,
  )
}
