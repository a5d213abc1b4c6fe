package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scope A/B harness behind BASELINE.md's r11 "IVF SIMD adoption"
  * table: `Test/runMain graft.ABIvfShapes <n> <dim>` times six IVF
  * full-probe search shapes over a persisted store — exact single-pass,
  * four exact-rerank variants (carry-through with/without qv, join-back,
  * sort-key-only carry; all measured SLOWER than exact and rejected,
  * because a rerank keeps `embedding` alive past the sort), and the
  * adopted simd single-pass. Kept so the rejection stays reproducible,
  * like ABSimd for the int8 kernel. */
object ABIvfShapes {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(s)
    val n = args(0).toLong
    val dim = args(1).toInt
    val dir = java.nio.file.Files.createTempDirectory("scratch_ivf").toString
    val e = s.range(n).select(col("id").as("vec_id"),
        (col("id") % 8).cast("string").as("label"))
      .withColumn("raw", expr(
        s"transform(sequence(1, $dim), j -> CAST(pmod(xxhash64(concat(" +
          "CAST(vec_id AS STRING), '_', CAST(j AS STRING))), 2000) AS DOUBLE) / 1000.0 - 1.0)"))
      .withColumn("nrm", expr("sqrt(aggregate(raw, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
      .select(col("vec_id"), col("label"),
        expr("transform(raw, x -> CAST(x / nrm AS FLOAT))").as("embedding"))
      .localCheckpoint(false)
    val cells = 16
    val cb0 = VectorOps.trainCodebook(e.limit(20000), cells, iters = 1)
    cb0.write.mode("overwrite").parquet(s"$dir/codebook")
    VectorOps.appendToIvfIndex(s, e, dir)
    val (cb, postings) = VectorOps.readIvfIndex(s, dir)
    val q = postings.where(col("vec_id") === 0)
      .select(col("embedding").as("qv")).limit(1)
    val cands = postings.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
    val pool = 800
    def finish(df: DataFrame): DataFrame = df
      .withColumn("sim", round(expr("graft_dot(embedding, qv)"), 6))
      .select("vec_id", "label", "sim")
      .orderBy(col("sim").desc, col("vec_id").asc).limit(100)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "exact" -> (() => finish(cands)),
      "carry_qv" -> (() => finish(cands
        .withColumn("asim", expr("graft_dot_simd(embedding, qv)"))
        .orderBy(col("asim").desc, col("vec_id").asc).limit(pool))),
      "carry_noqv" -> (() => finish(cands
        .withColumn("asim", expr("graft_dot_simd(embedding, qv)"))
        .select("vec_id", "label", "embedding", "asim")
        .orderBy(col("asim").desc, col("vec_id").asc).limit(pool)
        .crossJoin(broadcast(q)))),
      "joinback" -> (() => finish(cands.join(broadcast(cands
        .orderBy(expr("graft_dot_simd(embedding, qv)").desc, col("vec_id").asc)
        .limit(pool).select("vec_id")), "vec_id"))),
      "sortkey_carry" -> (() => finish(cands
        .orderBy(expr("graft_dot_simd(embedding, qv)").desc, col("vec_id").asc)
        .limit(pool))),
      "simd_single" -> (() => cands
        .withColumn("sim", round(expr("graft_dot_simd(embedding, qv)"), 6))
        .select("vec_id", "label", "sim")
        .orderBy(col("sim").desc, col("vec_id").asc).limit(100)))
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
    }
    val ref = variants.head._2().collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    variants.foreach { case (name, f) =>
      val got = f().collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      if (name == "simd_single") { // reassociated scores: near-tie contract only
        val overlap = got.map(_._1).toSet.intersect(ref.map(_._1).toSet).size
        require(overlap >= 95, s"$name overlap only $overlap/100")
      } else require(got == ref, s"$name diverged from exact")
      val med = (1 to 3).map(_ => time(f)).sorted.apply(1)
      println(f"SCRATCH $name n=$n dim=$dim median=$med%.3f")
    }
    s.stop()
  }
}
