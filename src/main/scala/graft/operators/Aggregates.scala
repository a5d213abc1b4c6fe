package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
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

    // Grand-total aggregate, no grouping keys.
    "q_agg_global" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("total"),
        round(avg("l_discount"), 6).as("avg_disc"),
        round(min("l_quantity"), 2).as("min_q"),
        round(max("l_quantity"), 2).as("max_q"))
    }),

    // Two distinct aggregates in one query (Catalyst expand rewrite).
    "q_agg_multi_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("users"),
          countDistinct(col("value")).as("vals"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // HAVING: post-aggregation filter.
    "q_agg_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .where(col("n") >= 15)
        .orderBy("o_custkey")
    }),

    // CUBE over two low-cardinality keys (functions.col per the rollup note).
    // grouping_id() disambiguates "NULL data key" from "subtotal row" —
    // same bit encoding as DuckDB's GROUPING(a, b).
    "q_agg_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // GROUPING SETS ((r_name),(n_name),()) — per-region, per-nation, total.
    "q_agg_gsets" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("c_acctbal"))
        .groupingSets(
          Seq(Seq(col("r_name")), Seq(col("n_name")), Seq()),
          col("r_name"), col("n_name"))
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // max_by / min_by (DuckDB arg_max / arg_min). The ordering key is a
    // (price, orderkey) struct: max_by alone breaks price ties arbitrarily
    // — no ties exist at the verified SFs (audited), but the tiebreak
    // keeps the query deterministic by construction (G6) at any scale.
    "q_agg_minmax_by" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("best_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("worst_order"))
        .orderBy("o_custkey")
    }),

    // Deterministic per-group list: collect, sort numerically inside the
    // row, then serialize to a CSV string — the driver's pandas-based
    // hasher cannot sort/hash array cells, so every declared query must
    // emit scalar columns only (round-1 CORRECTNESS err; arrays stay
    // array-typed in the non-declared library surface).
    "q_agg_collect_sorted" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          array_join(
            transform(sort_array(collect_list(col("o_orderkey"))),
              x => x.cast("string")),
            ",").as("orders"))
        .orderBy("o_custkey")
    }),

    // Statistical aggregates (rounded per G4; variance kept on the
    // small-magnitude column so cross-engine FP noise stays below 1e-4).
    "q_agg_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_q"),
          round(var_samp(col("l_quantity")), 4).as("var_q"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
        .orderBy("l_returnflag")
    }),

    // Equi-depth histogram — the ANALYZE-style statistic an optimizer
    // keeps per column (and the planning input for the zone-map layout's
    // range boundaries): ntile(10) over the price order splits rows into
    // equal-count buckets whose [lo, hi] bounds are the decile edges.
    // ntile is deterministic under a totalized order (price, orderkey),
    // so the bucket assignment — and therefore every bound — is exact
    // across engines. The global window is ONE sort task — acceptable
    // for a statistic but not the 100 TB path: at scale you compute the
    // decile EDGES with approx_percentile (declared as
    // q_agg_approx_percentile, fully parallel) and bucket by comparing
    // against the broadcast edges; this exact variant is the
    // oracle-able twin that pins the semantics.
    "q_stats_histogram" -> ((s, d) => {
      val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("bucket", ntile(10).over(w).cast("bigint"))
        .groupBy("bucket")
        .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"),
          count(lit(1)).as("rows"))
        .orderBy("bucket")
    }),

    // Interpolated median (percentile_cont semantics in both engines).
    "q_agg_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_q"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy("l_returnflag")
    }),

    // bool_and / bool_or per group.
    "q_agg_bool" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          bool_and(col("l_discount") < 0.05).as("all_low_disc"),
          bool_or(col("l_quantity") > 45).as("any_big_qty"))
        .orderBy("l_returnflag")
    }),

    // HLL sketch distinct — no oracle (sketch internals differ across
    // engines); accuracy is property-tested against exact distinct.
    "q_agg_approx_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")
    }),

    // Linear-regression aggregates (single-pass co-moment form, map-side
    // combinable like corr). Slope/intercept/r2 of price ~ quantity per
    // return flag; rounded per G4 (co-moments over 1e5 well-scaled values
    // were stable at 4dp in q_agg_stats/q_agg_corr).
    "q_agg_regr" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("icept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          expr("CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)").as("n"))
        .orderBy("l_returnflag")
    }),

    // Deterministic per-group MODE: native mode() is tie-UNSTABLE in both
    // engines (ties resolve by encounter order), so the declared form is
    // the portable rewrite — count per value, window-pick the (count desc,
    // value asc) winner. Same two-shuffle shape an exact mode costs at
    // scale; ties can never flip the result between engines.
    "q_agg_mode" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
        .orderBy("l_returnflag")
    }),

    // Conditional (FILTER-clause) aggregates: several differently-
    // filtered measures in ONE pass over the group — the alternative is
    // one scan per predicate. Spark spells it count_if / sum(CASE);
    // DuckDB spells it FILTER (WHERE ...); semantics identical, and the
    // empty-filter sum is NULL in both engines (kept as-is to pin that).
    "q_agg_filtered" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("count_if(l_quantity > 25)").as("big_qty"),
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 2).as("disc_rev"),
          expr("count_if(l_tax = 0)").as("no_tax"),
          round(avg(when(col("l_linestatus") === "F", col("l_quantity"))), 4).as("avg_f_qty"))
        .orderBy("l_returnflag")
    }),

    // t-digest-style quantile sketch (approx_percentile with a bounded
    // accuracy parameter) — the scale path where exact percentile's full
    // sort-per-group is unaffordable; the sketch partial-merges map-side
    // like any aggregate. No oracle (sketch internals are engine-
    // specific); LlmOpsSpec bounds its error against the exact
    // percentiles. Array output serialized to a string for the driver's
    // row hasher.
    "q_agg_approx_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr(
          "array_join(transform(approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000), " +
            "x -> cast(round(x, 2) AS STRING)), ',')").as("p50_90_99"))
        .orderBy("l_returnflag")
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

    "q_agg_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_filtered" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 25) AS big_qty,
        |  round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_rev,
        |  count(*) FILTER (WHERE l_tax = 0) AS no_tax,
        |  round(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS avg_f_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY l_returnflag, l_quantity)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY cnt DESC, l_quantity ASC) AS rn FROM c) t
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_agg_global" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice),2) AS total,
        |  round(avg(l_discount),6) AS avg_disc,
        |  round(min(l_quantity),2) AS min_q, round(max(l_quantity),2) AS max_q
        |FROM lineitem""".stripMargin,

    "q_agg_multi_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users,
        |  count(DISTINCT value) AS vals, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_having" ->
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        |  count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_gsets" ->
      """SELECT r_name, n_name,
        |  CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid, count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name),(n_name),())
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_agg_minmax_by" ->
      """SELECT o_custkey,
        |  max(CASE WHEN rn_max = 1 THEN o_orderkey END) AS best_order,
        |  max(CASE WHEN rn_min = 1 THEN o_orderkey END) AS worst_order
        |FROM (SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
        |  FROM orders) t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_agg_collect_sorted" ->
      """SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity),4) AS sd_q,
        |  round(var_samp(l_quantity),4) AS var_q,
        |  round(stddev_samp(l_extendedprice),2) AS sd_price,
        |  round(corr(l_quantity, l_extendedprice),6) AS corr_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5),4) AS median_q,
        |  round(quantile_cont(l_extendedprice, 0.9),4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_stats_histogram" ->
      """WITH b AS (SELECT o_totalprice,
        |        CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
        |      FROM orders)
        |SELECT bucket, min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |       count(*) AS rows
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_discount < 0.05) AS all_low_disc,
        |  bool_or(l_quantity > 45) AS any_big_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
