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
  )

  val oracle: Map[String, String] = Map(
    "q_text_stats" ->
      """SELECT lang, count(*) AS docs,
        |  round(avg(n_chars),4) AS avg_chars,
        |  round(avg(len(string_split(text,' '))),4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
