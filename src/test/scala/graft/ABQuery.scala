package graft

import org.apache.spark.sql.SparkSession

/** Test-scope timing harness: `Test/runMain graft.ABQuery q_name [runs]`
  * times one declared query end-to-end (count + full materialization) on
  * SPARK_GRAFT_SF_DIR, printing per-run seconds and the median. Not part
  * of the suite; exists so perf work can measure a single query without
  * a full Bench pass. */
object ABQuery {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .appName("ab-query").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    for (name <- args(0).split(",")) {
      val q = SparkEntry.queries(name)
      val times = (0 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = q(s, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, n)
      }.drop(1) // first run is warm-up
      val med = times.map(_._1).sorted.apply(times.length / 2)
      println(f"ABQ $name rows=${times.head._2} runs=${times.map(t => f"${t._1}%.3f").mkString(",")} median=$med%.3f")
    }
    s.stop()
  }
}
