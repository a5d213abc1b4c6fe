package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Similarity-search operators over `embeddings` (SURVEY §2.I). Embeddings
  * are exactly L2-normalized (FIXTURES.md), so cosine ≡ dot product. The
  * dot product is a Catalyst higher-order function (zip_with + aggregate)
  * — lambda expressions, no UDF serialization. Floats are widened to
  * DOUBLE inside the lambda (SURVEY §7.3 G4) for cross-engine parity.
  */
object VectorOps {

  /** Dot product of two float-array columns, accumulated in double. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-20 against one query vector. The query side is
    // a 1-row broadcast; the scan side streams — at 100 TB this is a single
    // pass with a TakeOrderedAndProject, no shuffle of the big side.
    "q_knn_cosine" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("sim", round(expr(dotExpr("embedding", "qv")), 6))
        .select("vec_id", "label", "sim")
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(20)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_knn_cosine" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  round(CAST(list_cosine_similarity(e.embedding, q.qv) AS DOUBLE),6) AS sim
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY sim DESC, e.vec_id ASC LIMIT 20""".stripMargin,
  )
}
