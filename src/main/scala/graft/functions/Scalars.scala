package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function operators (SURVEY §2.H): string / regex / date / math /
  * json families. Everything is a codegen'd built-in — no UDFs — so these
  * all fuse into the scan's whole-stage-codegen pipeline.
  */
object Scalars {

  val queries: Map[String, Q] = Map(
    // String builtins: concat/substring/upper/lower/trim/lpad/replace/length.
    "q_str_funcs" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 1, 8).as("pre"),
          concat(col("c_mktsegment"), lit("-"), col("c_name")).as("cat"),
          length(col("c_name")).as("len"),
          lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
          expr("replace(c_name, 'Customer', 'C')").as("rep"),
          trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"))
        .orderBy("c_custkey")
    }),

    // Regex extract (part number out of c_name) + global regex replace.
    "q_str_regex" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).cast("bigint").as("num"),
          regexp_replace(col("c_name"), "0+", "").as("squeezed"))
        .orderBy("c_custkey")
    }),

    // Edit distance over a bounded self-join of part names.
    "q_str_levenshtein" -> ((s, d) => {
      val a = Tables.part(s, d).where(col("p_partkey") < 50)
        .select(col("p_partkey").as("pa"), col("p_name").as("name_a"))
      val b = Tables.part(s, d).where(col("p_partkey") < 50)
        .select(col("p_partkey").as("pb"), col("p_name").as("name_b"))
      a.join(b, col("pa") < col("pb"))
        .select(col("pa"), col("pb"), levenshtein(col("name_a"), col("name_b")).as("dist"))
        .orderBy("pa", "pb")
    }),

    // Calendar histogram: year/month breakdown + month start.
    "q_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("y", year(col("o_orderdate")))
        .withColumn("m", month(col("o_orderdate")))
        .withColumn("mstart", date_trunc("month", col("o_orderdate")))
        .groupBy(col("y"), col("m"), col("mstart"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("y", "m")
    }),

    // Interval arithmetic + day difference as INT (no interval output —
    // parquet cannot hold CalendarIntervalType).
    "q_date_arith" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          expr("o_orderdate + INTERVAL '30' DAY").as("due"),
          expr("datediff(DATE '2001-01-01', CAST(o_orderdate AS DATE))").as("days_to_2001"))
        .orderBy("o_orderkey")
    }),

    // Math builtins, irrational outputs rounded to 6dp (G4).
    // (l_orderkey, l_linenumber) is not unique — l_extendedprice (as "ep")
    // completes the total order (G6).
    "q_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("ep"),
          abs(col("l_discount") - 0.05).as("ad"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(expr("ln(l_extendedprice)"), 6).as("lnp"),
          round(log10(col("l_extendedprice")), 6).as("lg"),
          round(exp(col("l_discount")), 6).as("ex"),
          expr("l_orderkey % 7").as("m7"),
          signum(col("l_discount") - 0.05).as("sg"))
        .orderBy("l_orderkey", "l_linenumber", "ep")
    }),

    // JSON path extraction over the events props column.
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round(avg("k"), 4).as("avg_k"),
          max("k").as("max_k"),
          min("k").as("min_k"))
        .orderBy("event_type")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  substring(c_name, 1, 8) AS pre,
        |  concat(c_mktsegment, '-', c_name) AS cat,
        |  length(c_name) AS len,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |  replace(c_name, 'Customer', 'C') AS rep,
        |  trim(concat('  ', c_name, '  ')) AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_str_regex" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT) AS num,
        |  regexp_replace(c_name, '0+', '', 'g') AS squeezed
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_str_levenshtein" ->
      """SELECT a.p_partkey AS pa, b.p_partkey AS pb,
        |  levenshtein(a.p_name, b.p_name) AS dist
        |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        |WHERE a.p_partkey < 50 AND b.p_partkey < 50
        |ORDER BY pa, pb""".stripMargin,

    "q_date_funcs" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
        |  count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY y, m, mstart ORDER BY y, m""".stripMargin,

    "q_date_arith" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS due,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS days_to_2001
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS ep,
        |  abs(l_discount - 0.05) AS ad,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  round(sqrt(l_quantity),6) AS sq,
        |  round(ln(l_extendedprice),6) AS lnp,
        |  round(log10(l_extendedprice),6) AS lg,
        |  round(exp(l_discount),6) AS ex,
        |  l_orderkey % 7 AS m7,
        |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, ep""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)),4) AS avg_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
