package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event row for the typed streaming operators (events table shape,
  * timestamp materialized to TimestampType). */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user running state for the arbitrary-stateful operator. */
case class UserAgg(user_id: Long, n: Long, total: Double)

/** Structured-Streaming twins of the batch event operators (SURVEY §2.J).
  *
  * Each transform is an unbound logical plan: apply it to a batch
  * DataFrame and it runs as a normal agg; apply it to `readStream` input
  * and Catalyst plans the incremental stateful version with watermark-
  * driven state eviction. That symmetry is the point — one operator
  * definition, two execution regimes — so these are NEVER declared in t2
  * (no DuckDB oracle for streaming semantics); StreamingSpec drives them
  * with MemoryStream and asserts watermark/late-data behavior.
  *
  * Scale posture: state size is bounded by (windows in watermark horizon ×
  * key cardinality); watermarks are what keep 100 TB/day streams from
  * accreting unbounded state.
  */
object StreamingOps {

  /** 1h tumbling counts per event type; watermark bounds lateness. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sv"))

  /** 6h windows sliding 1h — streaming twin of q_evt_sliding. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "6 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("n"))

  /** 30-min-gap session windows per user — streaming twin of q_sessionize. */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("ev"))
      .select(col("user_id"), col("w.start").as("session_start"), col("ev"))

  /** Streaming dedup with bounded state — twin of q_evt_dedup. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Arbitrary stateful processing: running per-user count/total kept in
    * GroupState, emitted on every update (mapGroupsWithState). */
  def runningUserAggs(ds: Dataset[Ev]): Dataset[UserAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          evs.foreach { e => n += 1; total += e.value }
          // state keeps the RAW total — rounding state would compound the
          // rounding error across micro-batches; round only the emission
          state.update(UserAgg(uid, n, total))
          UserAgg(uid, n, math.rint(total * 100) / 100)
      }
  }
}
