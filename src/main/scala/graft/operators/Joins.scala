package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY §2.C). The filtered customer side is small after
  * pushdown, so Catalyst broadcasts it (BroadcastHashJoin) — at 100 TB the
  * dimension tables stay broadcastable while the fact tables never shuffle
  * for these joins.
  */
object Joins {

  val queries: Map[String, Q] = Map(
    // TPC-H Q3 shape: small×large×large 3-way join + agg + native top-k
    // (Catalyst fuses ORDER BY+LIMIT into TakeOrderedAndProject).
    "q_join_bhj" -> ((s, d) => {
      Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Semi join (EXISTS): customers holding at least one >400k order.
    "q_join_semi" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Semi + anti (EXISTS / NOT EXISTS): >400k order but no F-status order.
    "q_join_anti" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(Tables.orders(s, d).where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_join_bhj" ->
      """SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |AND NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
  )
}
