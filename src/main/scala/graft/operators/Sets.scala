package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Set operators (SURVEY §2.G). `except` is the engine's
  * completeness-ledger primitive: "computed keys" EXCEPT "target keys"
  * = remaining work (the reference's known-ledger gap pattern).
  */
object Sets {

  val queries: Map[String, Q] = Map(
    // UNION ALL then re-aggregate (distinct collapse happens in the agg).
    "q_set_union" -> ((s, d) => {
      val cust = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val supp = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      cust.unionByName(supp)
        .groupBy("nk")
        .agg(count(lit(1)).as("n_all"))
        .orderBy("nk")
    }),

    // INTERSECT: nations present on both sides.
    "q_set_intersect" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    }),

    // EXCEPT — the completeness-ledger gap: high-value orders having no
    // large-quantity lineitem (non-empty at every SF, unlike nation keys).
    "q_set_except" -> ((s, d) => {
      Tables.orders(s, d).where(col("o_totalprice") > 300000)
        .select(col("o_orderkey").as("k"))
        .except(Tables.lineitem(s, d).where(col("l_quantity") > 30)
          .select(col("l_orderkey").as("k")))
        .orderBy("k")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_set_union" ->
      """SELECT nk, count(*) AS n_all FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey FROM supplier) u
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_set_except" ->
      """SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000
        |EXCEPT
        |SELECT l_orderkey FROM lineitem WHERE l_quantity > 30
        |ORDER BY k""".stripMargin,
  )
}
