package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY §2.D). Hash aggregation with map-side
  * partial aggregation is Spark's default physical plan here; at 100 TB the
  * partial/final split keeps the shuffle proportional to group cardinality,
  * not input rows.
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: scan-heavy multi-measure hash agg over lineitem.
    "q_agg_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_shipdate") < expr("TIMESTAMP_NTZ '2001-01-01 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("sum_disc_price"),
          round(sum(expr("l_extendedprice*(1-l_discount)*(1+l_tax)")), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // count(DISTINCT) → Catalyst expand + two-phase aggregate.
    "q_agg_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // ROLLUP over the region→nation hierarchy (star join first).
    // NOTE: rollup/cube must be given functions.col Columns, not bare
    // strings — the String overload resolves via Dataset.col, whose
    // dataset-id metadata survives into the Expand node's duplicated
    // attributes and falsely trips DetectAmbiguousSelfJoin on the final
    // sort (Spark 4.1.2 behavior, verified).
    "q_agg_rollup" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("c_acctbal"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
  )
}
