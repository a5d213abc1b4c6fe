package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named declared queries into
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * files (the judge reads these instead of running Spark).
  *
  * Usage: `sbt "runMain graft.PlanDump <tag> <suffix> q1 q2 ..."`
  * e.g.   `sbt "runMain graft.PlanDump r21 before headline"`
  * The literal name `headline` expands to Bench.headline. Session config
  * mirrors Bench.scala (same master/shuffle-partitions source of truth)
  * so the dumped plans are the plans the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query|headline>...")
    val (tag, suffix) = (args(0), args(1))
    val names = args.drop(2).toSeq.flatMap {
      case "headline" => Bench.headline
      case q          => Seq(q)
    }.distinct
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // Also capture the AQE-final executed plan: the formatted explain of
      // an adaptive plan shows isFinalPlan=false; the executed string is
      // where AQE join rewrites / coalesced reads become visible.
      df.queryExecution.executedPlan.execute().count()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"),
        s"== explain(formatted), sf=$sfDir, cpus=$cpus ==\n$formatted\n" +
        s"== AQE final executed plan ==\n$finalPlan")
      println(s"dumped $name -> plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
