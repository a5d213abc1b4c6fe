package graft

import java.nio.file.Files

import graft.plans.Scale
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {

  // NOTE: getOrCreate returns whichever suite's session came first in this
  // forked JVM, so per-suite configs (e.g. warehouse.dir) cannot be relied
  // on — the bucketing test cleans its tables/locations explicitly instead.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dropBucketTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (wh.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(wh)
    }
  }

  test("salted join returns exactly the plain join's rows on a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a tail; dimension of 3 keys
    val big = (Seq.fill(10000)(1) ++ (2 to 50)).toDF("k")
    val small = Seq((1, "hot"), (2, "warm"), (42, "cold")).toDF("sk", "name")
    val plain = big.join(small, $"k" === $"sk").groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedEquiJoin(big, small, "k", "sk", salts = 8)
      .groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 10000L)
  }

  test("partitioned write enables partition pruning in the scan") {
    val path = Files.createTempDirectory("part").toString + "/docs"
    Scale.writePartitioned(Tables.documents(spark, "/root/testdata/sf0.001"), path, Seq("lang"))
    val pruned = spark.read.parquet(path).where(col("lang") === "de")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning in plan:\n$plan")
    assert(pruned.count() > 0)
    // pruning is real: only the lang=de directory is listed
    val allLangs = spark.read.parquet(path).select("lang").distinct().count()
    assert(allLangs === 5)
  }

  test("broadcastIfSmall pins below the threshold and defers to AQE above it") {
    import spark.implicits._
    val dim = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val small = Scale.broadcastIfSmall(dim, upperBoundBytes = 1L << 20)
    val big = Scale.broadcastIfSmall(dim, upperBoundBytes = 100L << 30)
    def hinted(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(hinted(small), "below-threshold relation must carry the broadcast hint")
    assert(!hinted(big), "above-threshold relation must NOT carry a broadcast hint")
    // sourceBytes is a real FS stat, usable as the upper bound
    val bytes = Scale.sourceBytes(spark, "/root/testdata/sf0.001/orders.parquet")
    assert(bytes > 0)
    assert(Scale.sourceBytes(spark, "/root/testdata/sf0.001/definitely_absent.parquet") === 0L)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    dropBucketTable("docs_b")
    dropBucketTable("emb_b")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id", "lang")
    Scale.writeBucketed(docs, "docs_b", "doc_id", buckets = 4)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").select("vec_id", "label")
    Scale.writeBucketed(emb.withColumnRenamed("vec_id", "doc_id"), "emb_b", "doc_id", buckets = 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("docs_b").join(spark.table("emb_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
