package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave declared operators: distribution windows (ntile /
  * percent_rank / cume_dist), value-range window frames, correlation /
  * covariance / median aggregates, width_bucket histograms, regexp
  * extraction, bitwise aggregates, embedding int8 quantization,
  * click→purchase funnel analysis, and normalized near-exact dedup.
  *
  * Determinism rules follow SURVEY §7.3: every query ends in a total
  * ORDER BY (G6), floating aggregates are rounded (G4), event timestamps
  * travel as epoch-µs BIGINTs (G3), and quantization uses an explicit
  * floor(x + 0.5) instead of round() so both engines share one rounding
  * definition.
  */
object Extended {

  /** How [[winsorize]] computes its per-group clipping band. */
  sealed trait Bounds
  /** Exact `percentile`. CAVEAT (the q_stats_histogram rule): Spark's
    * exact Percentile buffers a value→count map PER GROUP in the
    * merging task — O(distinct values per group) on one reducer each.
    * Fine for bounded domains (prices, small int metrics); on the
    * continuous-valued columns a feature pipeline clips, that buffer is
    * unbounded. Use [[Approx]] at scale. */
  case object Exact extends Bounds
  /** `approx_percentile(…, accuracy)` — the 100 TB path: a mergeable
    * sketch with bounded memory per group and rank error ≤ 1/accuracy,
    * aggregated map-side like any partial agg. */
  final case class Approx(accuracy: Int = 10000) extends Bounds

  /** Library face of the q_winsorize operator: clip `valueCol` to its
    * group's [lower, upper] percentile band. Returns the input rows
    * plus `lo`, `hi` and `<valueCol>_winsorized` (all DOUBLE).
    *
    * Plan shape: ONE tiny per-group bounds aggregate joined back onto
    * the fact scan — never a window over the fact table. The join
    * strategy is left to Catalyst: with few groups the bounds side
    * broadcasts (the declared query's case); with a high-cardinality
    * group column the bounds table is itself large and the shuffle
    * join on the group key is the correct plan.
    *
    * `bounds = Exact` matches the declared oracle bit-for-bit but
    * carries the per-group percentile buffer caveat (see [[Exact]]);
    * the default [[Approx]] is the scale path. PropertiesSpec bounds
    * the clipped-count drift between the two modes. */
  def winsorize(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      valueCol: String, lower: Double = 0.05, upper: Double = 0.95,
      bounds: Bounds = Approx()): org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "winsorize: at least one group column required")
    require(0.0 <= lower && lower < upper && upper <= 1.0,
      s"winsorize needs 0 <= lower < upper <= 1, got ($lower, $upper)")
    val pct = bounds match {
      case Exact => s"percentile($valueCol, array($lower, $upper))"
      case Approx(acc) =>
        require(acc >= 1, s"accuracy must be >= 1, got $acc")
        s"approx_percentile($valueCol, array(cast($lower as double), " +
          s"cast($upper as double)), $acc)"
    }
    val b = df.groupBy(groupCols.map(col): _*)
      .agg(expr(pct).as("__wband"))
      .select(groupCols.map(col) :+
        expr("cast(__wband[0] as double)").as("lo") :+
        expr("cast(__wband[1] as double)").as("hi"): _*)
    df.join(b, groupCols)
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(col(valueCol).cast("double"), col("lo")), col("hi")))
  }

  val queries: Map[String, Q] = Map(
    // Per-group winsorization — the standard outlier-clipping step of a
    // feature/metrics pipeline: clip each row's value to its group's
    // [p05, p95] band and report clipped-row counts + the winsorized
    // sum. The band is ONE tiny per-group aggregate broadcast back onto
    // the fact scan (no window over the fact table, no second shuffle of
    // it), so the plan is two passes at any scale. Bounds are rounded to
    // 6dp on BOTH engines before comparing — the interpolated percentile
    // is the only cross-engine float in a comparison position.
    // EXACT-percentile caveat (r16 verdict): the DECLARED query keeps
    // exact `percentile` because the DuckDB oracle needs it, and
    // l_extendedprice's bounded domain keeps the per-group buffer sane;
    // the library face ([[winsorize]]) defaults to approx_percentile —
    // the scale path for continuous-valued metrics.
    "q_winsorize" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      val b = li.groupBy("l_returnflag").agg(
        round(expr("percentile(l_extendedprice, 0.05)"), 6).as("lo"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("hi"))
      li.join(broadcast(b), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("lo") ||
            col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_clipped"),
          round(sum(least(greatest(col("l_extendedprice"), col("lo")), col("hi"))), 2)
            .as("sum_winsorized"))
        .orderBy("l_returnflag")
    }),

    // Distribution windows per market segment. The partition key keeps the
    // sort per-segment (a GLOBAL ntile would single-partition the sort at
    // scale); ties broken by c_custkey for a total order (G6).
    "q_win_ntile" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("c_custkey")
    }),

    // Value-RANGE window frame: per-customer trailing-30-day revenue.
    // The order key is epoch days (integer), so RANGE 30 PRECEDING is a
    // true value range — same-day orders share one frame in both engines.
    "q_win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("d").asc)
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("d", datediff(col("o_orderdate"), to_date(lit("1995-01-01"))))
        .select(col("o_orderkey"), col("o_custkey"), col("d"),
          round(sum("o_totalprice").over(w), 2).as("r30"))
        .orderBy("o_orderkey")
    }),

    // Correlation / covariance per return flag (two-pass-free: Spark's
    // single-pass co-moment aggregates, map-side combinable).
    "q_agg_corr" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
          round(covar_pop("l_quantity", "l_extendedprice"), 2).as("cov_pop"),
          round(covar_samp("l_quantity", "l_extendedprice"), 2).as("cov_samp"))
        .orderBy("l_returnflag")
    }),

    // Exact interpolated median per order status.
    "q_agg_median" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(round(median(col("o_totalprice")), 2).as("med"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Histogram via width_bucket: 10 equal buckets over [0, 500k).
    "q_math_width_bucket" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("bucket",
          width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0), lit(10)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("bucket")
    }),

    // Regexp extraction over documents: all '…ing' tokens, serialized to
    // a scalar string (driver hasher cannot hash arrays).
    "q_str_regexp_extract_all" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(expr("regexp_extract_all(text, '[a-z]+ing', 0)"), " ").as("ings"),
          size(expr("regexp_extract_all(text, '[a-z]+ing', 0)")).as("n_ing"))
        .orderBy("doc_id")
    }),

    // Bitwise aggregates (and/or/xor are commutative+associative — safe
    // under any partial-aggregation order).
    "q_agg_bitwise" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("CAST(bit_and(l_linenumber) AS BIGINT)").as("b_and"),
          expr("CAST(bit_or(l_linenumber) AS BIGINT)").as("b_or"),
          expr("CAST(bit_xor(l_linenumber) AS BIGINT)").as("b_xor"))
        .orderBy("l_returnflag")
    }),

    // Symmetric int8 quantization of embeddings: scale = max|x|/127,
    // q_i = floor(x_i/scale + 0.5). floor(+0.5) — not round() — so both
    // engines share one rounding definition; scale is computed via max
    // (order-independent), so q is bit-deterministic. The quantized
    // vector serializes to CSV for the driver hasher.
    "q_embed_quantize" -> ((s, d) => {
      Tables.embeddings(s, d)
        .withColumn("scale",
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
            "(m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))) / 127.0"))
        .where(col("scale") > 0)
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale_r"),
          expr("array_join(transform(embedding, " +
            "x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)), ',')").as("q"),
          size(col("embedding")).as("dims"))
        .orderBy("vec_id")
    }),

    // Funnel: per user, clicks that convert to a purchase within 1h.
    // Equi-key on user_id (hash join) + range predicate on epoch-µs —
    // never a time-only band join, so the shuffle is keyed and bounded.
    "q_evt_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_us").as("pts"))
      clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("pts") >= col("cts") && col("pts") <= col("cts") + expr("3600000000"))
        .groupBy("user_id")
        .agg(countDistinct(col("cts")).as("conv_clicks"), count(lit(1)).as("pairs"))
        .orderBy("user_id")
    }),

    // Day-over-day retention cohort: per activity day, how many of its
    // distinct active users come back the next day. Activity first
    // collapses to distinct (user, day) — events per user-day disappear
    // before any join — then a self-join on (user, day+1) keyed on
    // user_id. Both aggs and the join shuffle on bounded keys.
    "q_evt_retention" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val act = days.groupBy("day").agg(countDistinct(col("user_id")).as("active"))
      val ret = days.join(
          days.select(col("user_id").as("user_b"), col("day").as("day_b")),
          col("user_id") === col("user_b") && col("day_b") === date_add(col("day"), 1))
        .groupBy("day").agg(countDistinct(col("user_id")).as("retained"))
      act.join(ret, Seq("day"), "left_outer")
        .select(col("day"), col("active"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          round(coalesce(col("retained"), lit(0L)).cast("double") / col("active"), 4).as("rate"))
        .orderBy("day")
    }),

    // Z-score outliers: events whose value sits >= 3 sigma from their
    // event_type's mean. The per-type stats are a tiny aggregate
    // broadcast back onto the stream — one scan + one broadcast join,
    // no window over the full table. (Precedent for float-aggregate
    // threshold comparisons surviving the cross-engine hash:
    // q_subquery_scalar's avg comparison, green at both SFs.)
    "q_evt_anomaly" -> ((s, d) => {
      val e = Tables.events(s, d)
      val stats = e.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
      e.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mu")) / col("sigma"))
        .where(abs(col("z")) >= 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 4).as("z"))
        .orderBy("event_id")
    }),

    // DAU / WAU / stickiness per day: each (user, day) activity fact
    // contributes to the 7-day windows of days day..day+6, expressed as
    // a 7-row explode (keyed shuffle, linear) rather than a day-range
    // self-join; WAU days outside the observed range are dropped by the
    // semi-join back to real days. countDistinct handles users active on
    // several days of one window exactly once.
    "q_evt_wau" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = days.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val contrib = days.select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6), interval 1 day)")).as("day"))
      val wau = contrib.join(days.select("day").distinct(), Seq("day"), "left_semi")
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
        .orderBy("day")
    }),

    // Near-exact dedup on NORMALIZED text (case/punctuation-insensitive):
    // the canonical first pass of a training-data dedup pipeline. The
    // corpus plants uppercase copies (doc_id + 1_000_000) that only
    // normalization catches; md5 has an identical twin in DuckDB.
    "q_dedup_normalized" -> ((s, d) => {
      val norm = md5(lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
      val orig = Tables.documents(s, d).select(col("doc_id"), norm.as("h"))
      val shout = Tables.documents(s, d)
        .select((col("doc_id") + 1000000).as("doc_id"),
          md5(lower(regexp_replace(upper(col("text")), "[^a-zA-Z0-9 ]", ""))).as("h"))
      orig.unionByName(shout)
        .groupBy("h")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dups"))
        .orderBy("keep_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_evt_anomaly" ->
      """WITH stats AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
        |               FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - s.mu) / s.sigma, 4) AS z
        |FROM events e JOIN stats s ON e.event_type = s.event_type
        |WHERE abs((e.value - s.mu) / s.sigma) >= 3.0
        |ORDER BY e.event_id""".stripMargin,

    "q_evt_wau" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM days GROUP BY day),
        |wau AS (SELECT a.day, count(DISTINCT b.user_id) AS wau
        |        FROM (SELECT DISTINCT day FROM days) a
        |        JOIN days b ON b.day BETWEEN a.day - INTERVAL 6 DAY AND a.day
        |        GROUP BY a.day)
        |SELECT dau.day, dau.dau, wau.wau,
        |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY dau.day""".stripMargin,

    "q_evt_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |act AS (SELECT day, count(DISTINCT user_id) AS active FROM days GROUP BY day),
        |ret AS (SELECT a.day, count(DISTINCT a.user_id) AS retained
        |        FROM days a JOIN days b
        |          ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
        |        GROUP BY a.day)
        |SELECT act.day, act.active,
        |  coalesce(ret.retained, 0) AS retained,
        |  round(CAST(coalesce(ret.retained, 0) AS DOUBLE) / act.active, 4) AS rate
        |FROM act LEFT JOIN ret ON act.day = ret.day
        |ORDER BY act.day""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,

    "q_win_range_frame" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS d
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, d,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY d ASC
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS r30
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "q_agg_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) AS cov_pop,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_samp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_median" ->
      """SELECT o_orderstatus, round(median(o_totalprice), 2) AS med, count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // DuckDB 1.0 has no width_bucket; the closed form below is identical
    // for in-range inputs (orders prices live in (1001, 500000)).
    "q_math_width_bucket" ->
      """SELECT CAST(floor(o_totalprice / 50000) + 1 AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_str_regexp_extract_all" ->
      """SELECT doc_id,
        |  COALESCE(array_to_string(regexp_extract_all(text, '[a-z]+ing'), ' '), '') AS ings,
        |  CAST(len(regexp_extract_all(text, '[a-z]+ing')) AS INTEGER) AS n_ing
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |         round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
        |         round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  round(sum(least(greatest(l_extendedprice, lo), hi)), 2) AS sum_winsorized
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "q_agg_bitwise" ->
      """SELECT l_returnflag,
        |  CAST(bit_and(l_linenumber) AS BIGINT) AS b_and,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS b_or,
        |  CAST(bit_xor(l_linenumber) AS BIGINT) AS b_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_embed_quantize" ->
      """WITH s AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings)
        |SELECT vec_id, round(scale, 6) AS scale_r,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INTEGER)), ',') AS q,
        |  CAST(len(embedding) AS INTEGER) AS dims
        |FROM s WHERE scale > 0 ORDER BY vec_id""".stripMargin,

    "q_evt_funnel" ->
      """WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS cts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, count(DISTINCT c.cts) AS conv_clicks, count(*) AS pairs
        |FROM c JOIN p ON p.user_id = c.user_id
        |  AND p.pts >= c.cts AND p.pts <= c.cts + 3600000000
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,

    "q_dedup_normalized" ->
      """WITH u AS (
        |  SELECT doc_id, md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS h
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    md5(lower(regexp_replace(upper(text), '[^a-zA-Z0-9 ]', '', 'g')))
        |  FROM documents)
        |SELECT h, min(doc_id) AS keep_id, count(*) AS dups
        |FROM u GROUP BY h ORDER BY keep_id""".stripMargin,
  )
}
