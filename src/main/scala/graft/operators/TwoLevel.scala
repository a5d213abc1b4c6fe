package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level distributed prefix scan — ONE implementation of the
  * pattern behind sequence packing (TextOps.packTwoLevel), the
  * token-budget cut (CurationOps.budgetCut → q_token_budget_select) and
  * sweep-line concurrency (q_evt_concurrency), which each used to carry
  * their own ~30-line transposition of it.
  *
  * Shape: rows bucket into `chunks` contiguous spans of a MONOTONE chunk
  * key (any of doc_id, score, time — the caller's `chunkExpr` may read
  * the broadcast `__lo`/`__hi` bound columns of `boundCol`), each
  * (group, chunk) cumulates `valueCol` locally in parallel under
  * `orderCols`, and a broadcast exclusive prefix over the per-chunk
  * totals shifts every row to its global offset `cum` — no task ever
  * scans a whole group, which is what a bare Window.orderBy gets wrong
  * at 100 TB. Chunk assignment must be monotone ALONG `orderCols` so
  * chunk-ascending concatenation is the global order; bucketing depends
  * only on the one broadcast (min, max) row, so output is deterministic
  * and bit-identical for any `chunks >= 1` (PropertiesSpec pins the law
  * for packing).
  *
  * `signed` picks the chunk-total harvest (SURVEY §7.3 G24): a
  * non-negative summand's total IS its last running sum, so totals come
  * from max(cum_local) over the WINDOWED output — both consumers then
  * hang off the same hashpartitioning exchange, which Spark reuses (one
  * corpus shuffle for the whole operator). A SIGNED summand (sweep-line
  * ±1 deltas) can peak above its end, so totals re-aggregate
  * sum(valueCol) from the chunked base instead.
  */
object TwoLevel {

  /** Adds `chunk`, `cum_local` and the global running sum `cum` (BIGINT)
    * of `valueCol` over (`groupCols`, `orderCols`); input columns pass
    * through. `chunkExpr` is a SQL expression producing an INT chunk id,
    * evaluated with `__lo`/`__hi` (min/max of `boundCol`) in scope. */
  def prefix(df: DataFrame, boundCol: String, chunkExpr: String,
      groupCols: Seq[String], orderCols: Seq[Column], valueCol: String,
      signed: Boolean): DataFrame = {
    val bounds = df.agg(min(boundCol).as("__lo"), max(boundCol).as("__hi"))
    val withChunk = df.crossJoin(broadcast(bounds))
      .withColumn("chunk", expr(chunkExpr))
      .drop("__lo", "__hi")
    val keyCols = (groupCols :+ "chunk").map(col)
    val wLocal = Window.partitionBy(keyCols: _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withChunk.withColumn("cum_local", sum(valueCol).over(wLocal))
    val wShift = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals =
      if (signed)
        withChunk.groupBy(keyCols: _*).agg(sum(valueCol).as("__tot"))
      else
        local.groupBy(keyCols: _*).agg(max("cum_local").as("__tot"))
    val shifts = totals
      .withColumn("__shift", coalesce(sum("__tot").over(wShift), lit(0L)))
      .select(keyCols :+ col("__shift"): _*)
    local.join(broadcast(shifts), groupCols :+ "chunk")
      .withColumn("cum", (col("cum_local") + col("__shift")).cast("bigint"))
      .drop("__shift")
  }
}
