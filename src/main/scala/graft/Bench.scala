package graft

import org.apache.spark.sql.SparkSession

import scala.util.control.NonFatal

/** Bench entry point: times the headline queries (the 9 BASELINE.md
  * categories) on SPARK_GRAFT_SF_DIR, then the FULL declared inventory
  * once each. Prints the compact headline contract line FIRST, then the
  * full-inventory telemetry line, then the contract line again LAST —
  * identical copies, so both tail-capture and first-parseable-line
  * consumers find it.
  *
  * Methodology matches BASELINE.md: one untimed warm-up materialization
  * per headline query (JIT/codegen/FS-init), then one timed run — the
  * baseline's 6.52 s was measured warm the same way. `value` remains the
  * headline total (the 2x contract metric); the `all`/`all_rows` section
  * is single-pass regression telemetry over every declared query (set
  * SPARK_GRAFT_HEADLINE_ONLY=1 to skip it).
  */
object Bench {
  /** One per major SURVEY §2 category, mirroring BASELINE.md's 9-query set. */
  val headline: Seq[String] = Seq(
    "q_agg_pricing",   // TPC-H Q1 hash agg
    "q_join_bhj",      // 3-way join + top-k
    "q_agg_rollup",    // ROLLUP
    "q_win_topn",      // window rank
    "q_agg_distinct",  // count distinct
    "q_sessionize",    // lag+cumsum session windows
    "q_join_anti",     // EXISTS / NOT EXISTS
    "q_text_stats",    // string/token agg
    "q_knn_cosine",    // vector top-20
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = headline.filter(SparkEntry.queries.contains)
    // warm-up: untimed first materialization (exceptions surface in the
    // timed pass instead; keep going)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case NonFatal(_) => () }
    }
    // Timing materializes via .count() DELIBERATELY: BASELINE.md's 6.52 s
    // was measured with identical .count() semantics, so the 2× contract
    // stays apples-to-apples. (count() lets Catalyst prune unused
    // aggregate columns — both sides of the comparison get that pruning.)
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case NonFatal(_) => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val contractLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // The contract line is printed BOTH first and last: a consumer that
    // keeps a bounded tail sees the final copy; one that takes the first
    // parseable JSON line sees this copy, ahead of the (much longer)
    // telemetry line. Both copies are identical.
    println(contractLine)
    // Full-inventory telemetry (BASELINE.md "bench contract"): every
    // declared query timed once, single pass, warm JVM but cold per-query
    // plan — a REGRESSION signal for the queries the headline set never
    // times (SURVEY §7.3 G9 at bench scale), not a contract metric. The
    // headline `value` stays the BASELINE.md 2x-contract number.
    // rows come along so a silent sf0.1-only breakage (0 or -1 rows)
    // is visible, not just slow.
    //
    // Printed as its OWN line, BEFORE the contract line: the harness
    // captures a bounded tail of stdout, and round 4 showed that one
    // combined line pushes the headline metric out of the capture window
    // (BENCH_r04.json's tail holds only the end of the telemetry map).
    // The compact contract line is the LAST thing this process prints.
    // Per-query failures catch NonFatal only — a fatal JVM error (OOM,
    // stack overflow) must propagate, not be recorded as -1 rows while
    // the loop keeps timing a possibly-corrupted JVM (round-4 advice).
    if (!sys.env.contains("SPARK_GRAFT_HEADLINE_ONLY")) {
      val all = SparkEntry.queries.keys.toSeq.sorted.map { name =>
        val t0 = System.nanoTime()
        val rows =
          try SparkEntry.queries(name)(spark, sfDir).count()
          catch { case NonFatal(_) => -1L }
        (name, (System.nanoTime() - t0) / 1e9, rows)
      }
      // Locale.ROOT: the default-locale format turns 0.123 into "0,123"
      // under comma-decimal locales, corrupting the telemetry JSON (the
      // contract line below concatenates raw Doubles and is locale-safe).
      val times = all.map { case (k, v, _) =>
        "\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, v) }
        .mkString("{", ",", "}")
      val rows = all.map { case (k, _, r) => "\"" + k + "\":" + r }
        .mkString("{", ",", "}")
      val allFailed = all.collect { case (k, _, r) if r < 0 => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      println(s"""{"metric":"all_inventory","unit":"sec","all":$times,"all_rows":$rows,"all_failed":$allFailed,"sf":"$sfDir"}""")
    }
    println(contractLine)
    spark.stop()
  }
}
