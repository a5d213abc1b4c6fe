package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the SURVEY §4.3 SIMD lever: `Test/runMain graft.ABSimd
  * [nRows] [dim] [runs]`. Two measurements, reported separately because
  * they answer different questions:
  *
  *  1. kernel microbench (driver-side, no Spark): the raw reassociated
  *     Panama kernel vs the sequential double fold on resident float[] —
  *     the ceiling the query path could ever reach;
  *  2. query-path A/B: a brute-force top-k scan over a synthetic parquet
  *     corpus (written once under target/, re-used across runs) with
  *     `graft_dot` vs `graft_dot_simd` — what the lever is worth once
  *     parquet decode, UnsafeArrayData→float[] copies, and the top-k
  *     machinery dilute it.
  *
  * The sf0.1 embeddings table (2k rows × dim 64) is noise-dominated for
  * this question, hence the synthetic corpus sized like a real ANN shard.
  * Results are recorded in BASELINE.md (round-10 section).
  */
object ABSimd {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 64
    val runs = if (args.length > 2) args(2).toInt else 5

    // --- 1. kernel microbench, driver-side ---------------------------
    val rnd = new java.util.Random(42)
    val vecs = Array.fill(4096)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val q = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    def timeKernel(f: (Array[Float], Array[Float]) => Double): Double = {
      var sink = 0.0
      val reps = 2000
      // warm-up for JIT, then timed reps over the resident corpus
      for (_ <- 0 until 3; v <- vecs) sink += f(v, q)
      val t0 = System.nanoTime()
      for (_ <- 0 until reps; v <- vecs) sink += f(v, q)
      val sec = (System.nanoTime() - t0) / 1e9
      val dots = reps.toLong * vecs.length
      println(f"  ${dots / sec / 1e6}%.1f Mdot/s (sink=$sink%.1f)")
      dots / sec / 1e6
    }
    println(s"kernel microbench dim=$dim simdActive=${graft.simd.SimdBridge.simdActive()}")
    print("  scalar:"); val mScalar = timeKernel(graft.simd.SimdBridge.scalarDot)
    print("  simd:  "); val mSimd = timeKernel(graft.simd.SimdBridge.dot)
    println(f"  kernel speedup ${mSimd / mScalar}%.2fx")

    // int8 variant (the SQ8 scan's arithmetic — exact, so also a
    // correctness cross-check against the scalar long fold)
    val bvecs = vecs.map(_.map(f => (f * 127f).toByte))
    val bq = q.map(f => (f * 127f).toByte)
    def timeKernelI8(f: (Array[Byte], Array[Byte]) => Double): Double = {
      var sink = 0.0
      val reps = 2000
      for (_ <- 0 until 3; v <- bvecs) sink += f(v, bq)
      val t0 = System.nanoTime()
      for (_ <- 0 until reps; v <- bvecs) sink += f(v, bq)
      val sec = (System.nanoTime() - t0) / 1e9
      val dots = reps.toLong * bvecs.length
      println(f"  ${dots / sec / 1e6}%.1f Mdot/s (sink=$sink%.1f)")
      dots / sec / 1e6
    }
    assert(bvecs.forall(v =>
      graft.simd.SimdBridge.dotI8(v, bq) == graft.simd.SimdBridge.scalarDotI8(v, bq)),
      "int8 SIMD must be bit-identical to the scalar long fold")
    println(s"kernel microbench int8 dim=$dim")
    print("  scalar:"); val mScalarI8 = timeKernelI8(graft.simd.SimdBridge.scalarDotI8)
    print("  simd:  "); val mSimdI8 = timeKernelI8(graft.simd.SimdBridge.dotI8)
    println(f"  kernel speedup ${mSimdI8 / mScalarI8}%.2fx")

    // --- 2. query-path A/B ------------------------------------------
    val spark = SparkSession.builder()
      .appName("ab-simd").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    GraftFunctions.register(spark)

    val corpusPath = s"target/bench-tmp/simd-corpus-n$n-d$dim"
    if (!new java.io.File(corpusPath).exists()) {
      // deterministic synthetic corpus: hash-derived floats in [-1, 1)
      spark.range(n).select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "j -> CAST((hash(id, j) / 2147483648.0) AS FLOAT))").as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath)
    val qdf = corpus.where(col("vec_id") === 7).select(col("embedding").as("qv"))

    def timeQuery(fn: String): Double = {
      val t0 = System.nanoTime()
      val top = corpus.crossJoin(broadcast(qdf))
        .select(col("vec_id"), expr(s"$fn(embedding, qv)").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(100)
      top.collect()
      (System.nanoTime() - t0) / 1e9
    }
    for (fn <- Seq("graft_dot", "graft_dot_simd")) {
      val times = (0 to runs).map(_ => timeQuery(fn)).drop(1).sorted
      println(f"query $fn%-16s n=$n dim=$dim runs=${times.map(t => f"$t%.3f").mkString(",")} median=${times(times.length / 2)}%.3f")
    }
    spark.stop()
  }
}
