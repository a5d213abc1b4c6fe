package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators, batch-declared (SURVEY §2.J). Timestamps are
  * carried as epoch-microsecond BIGINTs end to end (SURVEY §7.3 G2/G3):
  * integer nanos→micros conversion is lossless and hash-stable across
  * engines, unlike raw timestamp columns.
  */
object Events {

  private val SessionGapUs = 30L * 60 * 1000000 // 30 minutes in µs

  val queries: Map[String, Q] = Map(
    // Sessionization: 30-min inactivity gap → lag + cumulative-sum window.
    // Streaming twin: session_window(ts, "30 minutes") — see graft.streaming.
    "q_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select("user_id", "event_id", "ts_us")
        .withColumn("new_s",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > SessionGapUs, 1).otherwise(0))
        .withColumn("sid",
          sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("ev"), min("ts_us").as("start_us"))
        .orderBy(col("user_id").asc, col("sid").asc)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |              - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |                (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |            > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us ASC, event_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM g)
        |SELECT user_id, sid, count(*) AS ev, min(ts_us) AS start_us
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id ASC, sid ASC""".stripMargin,
  )
}
