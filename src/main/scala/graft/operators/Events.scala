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

    // 6h tumbling windows per event type (epoch-µs bucket arithmetic —
    // identical in both engines; streaming twin is window(ts, "6 hours")).
    "q_evt_tumbling" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("bucket", expr("ts_us div 21600000000"))
        .groupBy("bucket", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
        .orderBy(col("bucket").asc, col("event_type").asc)
    }),

    // 6h windows sliding by 1h: each event explodes into its 6 covering
    // window starts — a generate+explode rewrite, no self-join. Streaming
    // twin is window(ts, "6 hours", "1 hour").
    "q_evt_sliding" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("h", expr("ts_us div 3600000000"))
        .withColumn("wstart", explode(expr("sequence(h - 5, h)")))
        .groupBy("wstart")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
        .orderBy(col("wstart").asc)
    }),

    // Dedup events to one per (user, type, minute) with a deterministic
    // keeper (min event_id) — dropDuplicates picks an arbitrary row, so
    // the declared form is the min_by groupBy; the streaming twin is
    // dropDuplicatesWithinWatermark.
    "q_evt_dedup" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("minute", expr("ts_us div 60000000"))
        .groupBy("user_id", "event_type", "minute")
        .agg(min("event_id").as("keep_id"), count(lit(1)).as("dups"))
        .orderBy(col("user_id").asc, col("event_type").asc, col("minute").asc)
    }),

    // Per-user rate limiting: admit at most 8 events per (user, hour),
    // earliest-first — the ingestion throttle every event pipeline runs
    // in front of expensive downstream operators (and the batch twin of
    // a streaming token-bucket). One window keyed (user_id, hour): a
    // bot user's flood bounds its OWN partition's output at 8 while
    // draining in parallel with everyone else; emitted rows carry rn so
    // downstream can distinguish "first of the hour" from "barely made
    // the cut". Hour arithmetic is epoch-µs integer division — exact in
    // both engines.
    "q_evt_rate_limit" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "hour")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("hour", expr("ts_us div 3600000000"))
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .where(col("rn") <= 8)
        .select("user_id", "hour", "event_id", "rn")
        .orderBy("user_id", "hour", "rn")
    }),

    // Gaps-and-islands: each user's LONGEST streak of consecutive active
    // days — the classic `day - row_number()` trick: inside a run of
    // consecutive days the difference is constant, so it IS the island
    // key, turning streak detection into one window pass + one keyed
    // aggregate (no self-join, no iteration). Ties on length break to
    // the earliest streak start for a total order.
    "q_win_streaks" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy(col("day").asc)
      val streaks = days
        .withColumn("grp", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      val best = Window.partitionBy("user_id")
        .orderBy(col("len").desc, col("start_day").asc)
      streaks.withColumn("rn", row_number().over(best))
        .where(col("rn") === 1)
        .select("user_id", "len", "start_day")
        .orderBy("user_id")
    }),

    // Calendar-spine join with zero-fill: every day of the observed
    // range emits a row even when the (rare) fact slice has no events
    // that day — the gap-free time series every dashboard/training-label
    // pipeline needs (6 of 30 days are genuinely zero-filled at sf0.01).
    // Scale order matters: the facts aggregate to per-day rows FIRST
    // (keyed shuffle, ~days rows), then the tiny generated spine
    // left-joins the daily aggregate — never a spine-to-raw-facts outer
    // join, which would put the unbounded side on the right of a
    // left_outer at 100 TB.
    "q_date_spine" -> ((s, d) => {
      val e = Tables.events(s, d)
      val daily = e.where(col("event_type") === "purchase" && col("value") < 1)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n0"), round(sum("value"), 2).as("t0"))
      val spine = e.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      spine.join(daily, Seq("day"), "left_outer")
        .select(col("day"), coalesce(col("n0"), lit(0L)).as("n"),
          coalesce(col("t0"), lit(0.0)).as("total"))
        .orderBy("day")
    }),

    // Time-series LINEAR INTERPOLATION — q_date_spine's zero-fill is
    // right for counts; a measured signal (sensor values, daily spend)
    // needs gap values estimated from the neighbors instead. Classic
    // two-window recipe: per-user daily averages (sparse by
    // construction: purchase events only), a per-user day spine, then
    // last/first(ignoreNulls) windows carry the previous/next observed
    // (day, value) to every gap row and the fill is the exact linear
    // blend pv + (nv - pv) * (day - pd)/(nd - pd). The spine runs
    // min..max per user, so edge rows are always observed and the blend
    // never divides by zero. Same shape at scale: one keyed shuffle for
    // the daily agg, windows on the (tiny) per-user day series.
    "q_ts_interpolate" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .where(col("event_type") === "purchase" && col("user_id") < 50)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(avg("value").as("v"))
      val spine = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val wPrev = Window.partitionBy("user_id").orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("user_id").orderBy(col("day").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext))
        // 6dp, not 4: daily averages of 2dp values blended at small-
        // denominator ratios land EXACTLY on 4dp halves (e.g. 75.91375),
        // where the engines' half-rounding disagrees; at 6dp the rounding
        // position sits past the blend's last nonzero decimal digit, so
        // there is no boundary to disagree on (caught by the sf0.01 gate).
        .withColumn("vi", round(when(col("v").isNotNull, col("v")).otherwise(
          col("pv") + (col("nv") - col("pv")) *
            datediff(col("day"), col("pd")).cast("double") / datediff(col("nd"), col("pd"))), 6))
        .withColumn("filled", col("v").isNull)
        .select("user_id", "day", "vi", "filled")
        .orderBy("user_id", "day")
    }),

    // Shannon entropy of each user's event-type mix — the behavioral-
    // diversity score (0 = one event type; ln(5) ≈ 1.609 = uniform over
    // all five). Uses the single-pass identity
    //   H = ln(T) - (Σ c·ln c) / T   (T = Σ c)
    // so the per-user pass is one groupBy over (user, type) counts and
    // one over users — no p=c/T per-row division whose summation order
    // could drift across engines; ln is libm-stable and 4dp rounding
    // absorbs the last ulp (same discipline as q_math_funcs).
    "q_evt_entropy" -> ((s, d) => {
      val c = Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"))
      c.groupBy("user_id")
        .agg(
          round(log(sum("cnt")) - sum(col("cnt") * log(col("cnt"))) / sum("cnt"), 4)
            .as("entropy"),
          count(lit(1)).as("n_types"),
          sum("cnt").as("n_events"))
        .orderBy("user_id")
    }),

    // User-journey transition matrix: adjacent (from → to) event-type
    // pairs along each user's (ts, event_id)-ordered timeline, with the
    // per-from-state total alongside — the Markov view (funnel analysis
    // generalized to every path at once). The counts stay pure BIGINT
    // (consumers divide n/total_from themselves), so no float rounding
    // convention ever enters the result. One lead() window keyed by
    // user (parallelism = users), one keyed groupBy over at most
    // |types|² rows, and the per-from total is a window over that tiny
    // aggregate — nothing here grows faster than the event count.
    "q_evt_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select("user_id", "event_id", "ts_us", "event_type")
        .withColumn("to_type", lead("event_type", 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("total_from",
          sum("n").over(Window.partitionBy("from_type")).cast("bigint"))
        .orderBy(col("from_type").asc, col("to_type").asc)
    }),

    // Inter-arrival gap statistics per event type: each (user, type)
    // timeline's successive-event gaps, aggregated to count / mean /
    // exact interpolated median / max seconds — the arrival-process
    // profile behind rate-limit and anomaly tuning. The mean is exact
    // integer µs arithmetic until ONE final double division (no
    // order-sensitive double summation); median follows q_agg_median's
    // cross-engine convention; both engines compute the identical
    // association order before the 4dp round.
    "q_evt_inter_arrival" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select("user_id", "event_id", "ts_us", "event_type")
        .withColumn("prev_us", lag("ts_us", 1).over(w))
        .where(col("prev_us").isNotNull)
        .withColumn("gap_us", col("ts_us") - col("prev_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(sum("gap_us").cast("double") / count(lit(1)) / 1000000.0, 4).as("avg_gap_s"),
          round(median(col("gap_us")) / 1000000.0, 4).as("p50_gap_s"),
          round(max("gap_us").cast("double") / 1000000.0, 4).as("max_gap_s"))
        .orderBy(col("event_type").asc)
    }),

    // Peak session concurrency per day — the sweep-line interval query
    // (capacity planning over q_sessionize's sessions): each session
    // contributes +1 at its start and -1 just past its inclusive end,
    // deltas collapse per instant (so intra-instant order can't matter),
    // and the running sum over instants is the live-session level; the
    // per-day max over change-points is the answer. The global ordered
    // running sum is the q_token_budget_select two-level scan again,
    // keyed by time: instants range-bucket into chunks off one broadcast
    // (min, max) row, chunks cumulate locally, and the 16-row per-chunk
    // totals (summed, NOT max — deltas are signed, so a chunk's shift is
    // its sum, not its running peak) shift each chunk to its global
    // level. No task ever scans the whole timeline.
    "q_evt_concurrency" -> ((s, d) => {
      // scale-adaptive chunk count (r21): the per-chunk local window is
      // the parallel stage of the two-level scan, so a constant caps it
      // regardless of cluster width; the prefix arithmetic is exact for
      // ANY chunking, so the result is chunk-count independent
      // (oracle-gated). Floor of 16 keeps tiny-core runs off the
      // degenerate 1-chunk path.
      val chunks = math.max(16, s.sparkContext.defaultParallelism)
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      val sess = Tables.events(s, d)
        .select("user_id", "event_id", "ts_us")
        .withColumn("new_s",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > SessionGapUs, 1).otherwise(0))
        .withColumn("sid",
          sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"))
      val deltas = sess.select(col("start_us").as("t"), lit(1L).as("delta"))
        .unionByName(sess.select((col("end_us") + 1L).as("t"), lit(-1L).as("delta")))
        .groupBy("t").agg(sum("delta").as("d"))
      // the shared TwoLevel.prefix engine with signed = true: sweep-line
      // deltas can peak above a chunk's end, so chunk totals re-aggregate
      // sum(d) from the base rather than harvesting the running max (G24)
      // divide-first bucketing (r21 advice): `(t - __lo) * chunks` in
      // Long wraps once chunks is cluster-sized and t spans years of
      // microseconds (~10 y * 20k parallelism brushes Long.Max); the
      // chunk-width divisor form is overflow-proof for every Long t,
      // provably lands in [0, chunks-1], and stays monotone — and the
      // scan is chunking-independent (exact prefix arithmetic), so the
      // result is unchanged (oracle-gated). See packTwoLevel for the
      // bounds proof.
      TwoLevel.prefix(deltas, boundCol = "t",
          chunkExpr =
            s"CAST(CASE WHEN __hi = __lo THEN 0 ELSE least($chunks - 1, " +
              s"(t - __lo) div ((__hi - __lo) div $chunks + 1)) END AS INT)",
          groupCols = Seq.empty, orderCols = Seq(col("t").asc),
          valueCol = "d", signed = true)
        .withColumnRenamed("cum", "conc")
        .withColumn("day", expr("t div 86400000000"))
        .groupBy("day")
        .agg(max("conc").as("max_conc"), count(lit(1)).as("n_changes"))
        .orderBy(col("day").asc)
    }),

    // Last-touch attribution: for every purchase, the user's most recent
    // STRICTLY PRECEDING click/signup touch (type + instant) from one
    // ignore-nulls last() over the user timeline — the marketing-
    // attribution primitive. Purchases with no prior touch keep NULLs
    // (organic conversions are a real category, not a dropped row). One
    // window keyed by user, then a per-row filter: linear, no join.
    "q_evt_attribution" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select("event_id", "user_id", "event_type", "ts_us")
        .withColumn("attr_type",
          last(when(col("event_type").isin("click", "signup"), col("event_type")),
            ignoreNulls = true).over(w))
        .withColumn("attr_ts_us",
          last(when(col("event_type").isin("click", "signup"), col("ts_us")),
            ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .select("event_id", "user_id", "attr_type", "attr_ts_us")
        .orderBy(col("event_id").asc)
    }),

    // Cohort time-to-convert: each user's first signup joined to their
    // first purchase AT OR AFTER it, with the gap in seconds — the
    // conversion-latency table a growth dashboard medians over. Two
    // keyed min-aggregations and one user-keyed join (the range predicate
    // rides the equi-join); never a timeline scan per user pair.
    "q_evt_time_to_convert" -> ((s, d) => {
      val t = Tables.events(s, d).select("user_id", "event_type", "ts_us")
      val signup = t.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("signup_us"))
      val conv = signup.join(
          t.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_us").as("p_us")), Seq("user_id"))
        .where(col("p_us") >= col("signup_us"))
        .groupBy("user_id", "signup_us").agg(min("p_us").as("conv_us"))
      conv
        .withColumn("tt_s",
          round((col("conv_us") - col("signup_us")).cast("double") / 1000000.0, 4))
        .select("user_id", "signup_us", "conv_us", "tt_s")
        .orderBy(col("user_id").asc)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_evt_transitions" ->
      """WITH s AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events)
        |SELECT event_type AS from_type, to_type, count(*) AS n,
        |  CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT) AS total_from
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY event_type, to_type
        |ORDER BY from_type ASC, to_type ASC""".stripMargin,

    "q_evt_inter_arrival" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |        (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS gap_us
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 4) AS avg_gap_s,
        |  round(median(gap_us) / 1000000.0, 4) AS p50_gap_s,
        |  round(CAST(max(gap_us) AS DOUBLE) / 1000000.0, 4) AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type ASC""".stripMargin,

    "q_evt_concurrency" ->
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
        |  FROM g),
        |sess AS (SELECT user_id, sid, min(ts_us) AS start_us, max(ts_us) AS end_us
        |         FROM s GROUP BY user_id, sid),
        |del AS (SELECT start_us AS t, 1 AS delta FROM sess
        |        UNION ALL SELECT end_us + 1, -1 FROM sess),
        |agg AS (SELECT t, sum(delta) AS d FROM del GROUP BY t),
        |run AS (SELECT t, CAST(sum(d) OVER (ORDER BY t ASC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc FROM agg)
        |SELECT t // 86400000000 AS day, max(conc) AS max_conc, count(*) AS n_changes
        |FROM run GROUP BY day ORDER BY day ASC""".stripMargin,

    "q_evt_attribution" ->
      """WITH t AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |w AS (SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type IN ('click','signup') THEN event_type END
        |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_type,
        |    last_value(CASE WHEN event_type IN ('click','signup') THEN ts_us END
        |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_ts_us
        |  FROM t)
        |SELECT event_id, user_id, attr_type, attr_ts_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id ASC""".stripMargin,

    "q_evt_time_to_convert" ->
      """WITH t AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |s AS (SELECT user_id, min(ts_us) AS signup_us FROM t
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT s.user_id, s.signup_us, min(t.ts_us) AS conv_us
        |      FROM s JOIN t ON t.user_id = s.user_id
        |        AND t.event_type = 'purchase' AND t.ts_us >= s.signup_us
        |      GROUP BY s.user_id, s.signup_us)
        |SELECT user_id, signup_us, conv_us,
        |  round(CAST(conv_us - signup_us AS DOUBLE) / 1000000.0, 4) AS tt_s
        |FROM c ORDER BY user_id ASC""".stripMargin,

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

    "q_evt_tumbling" ->
      """SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 AS bucket,
        |  event_type, count(*) AS n, round(sum(value),2) AS sv
        |FROM events GROUP BY bucket, event_type
        |ORDER BY bucket ASC, event_type ASC""".stripMargin,

    "q_evt_sliding" ->
      """WITH h AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h, value FROM events),
        |x AS (SELECT unnest(generate_series(h - 5, h)) AS wstart, value FROM h)
        |SELECT wstart, count(*) AS n, round(sum(value),2) AS sv
        |FROM x GROUP BY wstart ORDER BY wstart ASC""".stripMargin,

    "q_win_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |              FROM events),
        |isl AS (SELECT user_id, day,
        |          CAST(day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |            AS INTEGER) AS DATE) AS grp
        |        FROM days),
        |streaks AS (SELECT user_id, grp, count(*) AS len, min(day) AS start_day
        |            FROM isl GROUP BY user_id, grp),
        |best AS (SELECT user_id, len, start_day,
        |           row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_day ASC) AS rn
        |         FROM streaks)
        |SELECT user_id, len, start_day FROM best WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Same association order as the Spark blend so both engines round
    // the same double. generate_series over DATEs needs the ::DATE cast
    // back from the TIMESTAMP it yields.
    "q_ts_interpolate" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, avg(value) AS v
        |  FROM events WHERE event_type = 'purchase' AND user_id < 50
        |  GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |spine AS (SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |            CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |j AS (SELECT s.user_id, s.day, d.v FROM spine s
        |      LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day),
        |w AS (SELECT user_id, day, v,
        |        last_value(v IGNORE NULLS) OVER wp AS pv,
        |        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS pd,
        |        first_value(v IGNORE NULLS) OVER wn AS nv,
        |        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS nd
        |      FROM j
        |      WINDOW wp AS (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING),
        |             wn AS (PARTITION BY user_id ORDER BY day
        |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |        ELSE pv + (nv - pv) * CAST(date_diff('day', pd, day) AS DOUBLE)
        |             / date_diff('day', pd, nd) END, 6) AS vi,
        |  (v IS NULL) AS filled
        |FROM w ORDER BY user_id, day""".stripMargin,

    "q_date_spine" ->
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
        |           FROM events WHERE event_type = 'purchase' AND value < 1),
        |daily AS (SELECT day, count(*) AS n, round(sum(value), 2) AS t
        |          FROM d GROUP BY day),
        |b AS (SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS lo,
        |             max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM b)
        |SELECT s.day, coalesce(daily.n, 0) AS n, coalesce(daily.t, 0) AS total
        |FROM spine s LEFT JOIN daily ON s.day = daily.day
        |ORDER BY s.day""".stripMargin,

    "q_evt_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
        |           FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 4) AS entropy,
        |  count(*) AS n_types,
        |  CAST(sum(cnt) AS BIGINT) AS n_events
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_evt_dedup" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS minute, event_id FROM events)
        |SELECT user_id, event_type, minute,
        |  min(event_id) AS keep_id, count(*) AS dups
        |FROM e GROUP BY user_id, event_type, minute
        |ORDER BY user_id ASC, event_type ASC, minute ASC""".stripMargin,

    "q_evt_rate_limit" ->
      """WITH e AS (SELECT user_id, event_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour
        |      FROM events),
        |r AS (SELECT user_id, hour, event_id,
        |        row_number() OVER (PARTITION BY user_id, hour
        |                           ORDER BY ts_us, event_id) AS rn
        |      FROM e)
        |SELECT user_id, hour, event_id, rn FROM r WHERE rn <= 8
        |ORDER BY user_id, hour, rn""".stripMargin,
  )
}
