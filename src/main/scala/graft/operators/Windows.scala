package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window operators (SURVEY §2.E). One shuffle on the partition key, then
  * an in-partition sort; every frame here is a ROWS frame (RANGE-interval
  * frames differ subtly across engines). Running/moving aggregates are
  * computed in deterministic row order, so even float results are
  * bit-identical cross-engine without rounding tricks.
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

    // rank / dense_rank / percent_rank / ntile in one window.
    "q_win_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prnk", round(percent_rank().over(w), 6))
        .withColumn("tile", ntile(4).over(w))
        .drop("o_totalprice")
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    }),

    // lag/lead: inter-event gaps per user (epoch-µs BIGINT arithmetic, G3).
    "q_win_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select("user_id", "event_id", "ts_us")
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .withColumn("next_gap_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .orderBy(col("user_id").asc, col("ts_us").asc, col("event_id").asc)
    }),

    // Running revenue per customer, ROWS UNBOUNDED PRECEDING.
    "q_win_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .withColumn("running", round(sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running")
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    }),

    // 5-row centered moving average of event values per user.
    "q_win_moving" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(-2, 2)
      Tables.events(s, d)
        .select("user_id", "event_id", "ts_us", "value")
        .withColumn("mavg", round(avg("value").over(w), 6))
        .select("user_id", "event_id", "ts_us", "mavg")
        .orderBy(col("user_id").asc, col("ts_us").asc, col("event_id").asc)
    }),

    // cume_dist + nth_value — the two ranking-family functions the other
    // window queries don't touch (percent_rank lives in q_win_rank).
    // cume_dist assigns tied rows the same fraction in both engines;
    // nth_value needs the explicit full frame for the same reason as
    // last_value below.
    "q_win_dist" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("second_best", nth_value(col("o_orderkey"), 2).over(wf))
        .drop("o_totalprice")
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    }),

    // Rolling DISTINCT count — the window family's missing builtin:
    // neither Spark nor DuckDB allows count(DISTINCT) OVER, so engines
    // either punt or users fall back to a quadratic self-join. Here:
    // reduce to distinct (user, day, type) rows, collect_set over a
    // 7-day RANGE frame, size it — one shuffle, per-user linear work.
    // The oracle IS the quadratic self-join rewrite (exact but O(n·w)
    // rows) — the declarative frame and the join must agree exactly,
    // which also documents why the window form is the 100 TB shape.
    "q_win_rolling_distinct" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("day")).rangeBetween(-6, 0)
      Tables.events(s, d)
        .withColumn("day", expr("ts_us div 86400000000"))
        .select("user_id", "day", "event_type").distinct()
        .withColumn("n_types",
          size(array_distinct(collect_list("event_type").over(w))).cast("bigint"))
        .groupBy("user_id", "day")
        .agg(max("n_types").as("n_types"))
        .orderBy("user_id", "day")
    }),

    // first_value / last_value with an explicit full-partition frame
    // (Spark's last_value default frame ends at CURRENT ROW — the classic
    // pitfall; always spell the frame).
    "q_win_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("best", first(col("o_orderkey")).over(w))
        .withColumn("worst", last(col("o_orderkey")).over(w))
        .drop("o_totalprice")
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_win_rolling_distinct" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, event_type
        |      FROM events),
        |d AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT d.user_id AS user_id, d.day AS day,
        |       CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
        |FROM d JOIN e ON e.user_id = d.user_id AND e.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.user_id, d.day
        |ORDER BY d.user_id, d.day""".stripMargin,

    "q_win_topn" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC, rn ASC""".stripMargin,

    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  ntile(4) OVER w AS tile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,

    "q_win_lag" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT user_id, event_id, ts_us,
        |  ts_us - lag(ts_us) OVER w AS gap_us,
        |  lead(ts_us) OVER w - ts_us AS next_gap_us
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
        |ORDER BY user_id ASC, ts_us ASC, event_id ASC""".stripMargin,

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS UNBOUNDED PRECEDING), 2) AS running
        |FROM orders
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,

    "q_win_moving" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events)
        |SELECT user_id, event_id, ts_us,
        |  round(avg(value) OVER (PARTITION BY user_id
        |    ORDER BY ts_us ASC, event_id ASC
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS mavg
        |FROM e
        |ORDER BY user_id ASC, ts_us ASC, event_id ASC""".stripMargin,

    "q_win_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING) AS second_best
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,

    "q_win_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS best,
        |  last_value(o_orderkey) OVER w AS worst
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
  )
}
