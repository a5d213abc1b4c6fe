package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window operators (SURVEY §2.E). Window execution shuffles once on the
  * partition key then sorts within partitions — the per-customer key space
  * scales linearly, no driver-side state.
  */
object Windows {

  val queries: Map[String, Q] = Map(
    // Top-3 orders per customer via row_number (unique tiebreak o_orderkey).
    "q_win_topn" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .orderBy(col("o_custkey").asc, col("rn").asc)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_win_topn" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC, rn ASC""".stripMargin,
  )
}
