package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY §2.I). Tokenization is
  * a codegen'd `split` — no UDFs in the hot path, so whole-stage codegen
  * keeps the scan→project→agg pipeline fused.
  */
object TextOps {

  val queries: Map[String, Q] = Map(
    // Per-language corpus stats: doc counts, avg chars, avg tokens.
    "q_text_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("docs"),
          round(avg("n_chars"), 4).as("avg_chars"),
          round(avg(size(split(col("text"), " "))), 4).as("avg_tokens"))
        .orderBy("lang")
    }),

    // Tokenize → explode (Catalyst Generator) → top-20 token counts.
    "q_str_split_explode" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),

    // Array builtins over the token array.
    "q_array_funcs" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("tokens", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("tokens")).as("n_tok"),
          size(array_distinct(col("tokens"))).as("n_uniq"),
          array_contains(col("tokens"), "spark").as("has_spark"),
          slice(sort_array(array_distinct(col("tokens"))), 1, 5).as("first5"),
          size(flatten(array(col("tokens"), col("tokens")))).as("n2"))
        .orderBy("doc_id")
    }),

    // Higher-order functions: filter → transform → aggregate, all Catalyst
    // lambda expressions (no UDF serialization).
    "q_array_hof" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          expr("aggregate(transform(filter(split(text, ' '), t -> length(t) >= 5), " +
            "t -> length(t)), 0, (acc, x) -> acc + x)").as("chars5"))
        .orderBy("doc_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_text_stats" ->
      """SELECT lang, count(*) AS docs,
        |  round(avg(n_chars),4) AS avg_chars,
        |  round(avg(len(string_split(text,' '))),4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_str_split_explode" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
        |SELECT doc_id,
        |  CAST(len(tokens) AS INTEGER) AS n_tok,
        |  CAST(len(list_distinct(tokens)) AS INTEGER) AS n_uniq,
        |  list_contains(tokens, 'spark') AS has_spark,
        |  list_sort(list_distinct(tokens))[1:5] AS first5,
        |  CAST(len(flatten([tokens, tokens])) AS INTEGER) AS n2
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_array_hof" ->
      """SELECT doc_id,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(string_split(text, ' '), t -> len(t) >= 5),
        |    t -> len(t))), 0) AS INTEGER) AS chars5
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
