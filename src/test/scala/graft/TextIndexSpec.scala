package graft

import java.nio.file.{Files, Paths}

import graft.sources.{GenStamp, TextIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the persisted inverted index (TextIndex): bucket-twin
  * equality, indexed == scan scoring, the rebuild crash fence, pruning,
  * and existence semantics. All on sf0.001.
  */
class TextIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def docs: DataFrame = Tables.documents(spark, sf)

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"textidx_$tag").toString + "/idx"

  test("driver-side bucket twin equals the column hash over the real vocabulary") {
    val terms = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .distinct().limit(500)
      .withColumn("b_col", TextIndex.bucketOf(col("term")))
      .collect()
    assert(terms.nonEmpty)
    terms.foreach { r =>
      val t = r.getString(0)
      assert(TextIndex.bucketOfTerm(t) === r.getInt(1),
        s"bucket twin diverged for term '$t'")
    }
  }

  /** Scan-path BM25 twin — byte-for-byte the q_text_search_bm25 plan
    * with a parameterized term set. */
  private def scanBm25(terms: Seq[String], k: Int): DataFrame = {
    val d = docs
    val qtok = d
      .select(col("doc_id"), size(split(col("text"), " ")).as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .where(col("term").isin(terms: _*))
    val tf = qtok.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dft = qtok.groupBy("term").agg(countDistinct(col("doc_id")).as("dfc"))
    val stats = d.agg(count(lit(1)).as("n"),
      avg(size(split(col("text"), " ")).cast("double")).as("avgdl"))
    tf.join(broadcast(dft), "term").crossJoin(broadcast(stats))
      .withColumn("w",
        log((col("n").cast("double") - col("dfc") + 0.5) / (col("dfc") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("w"), 4).as("score"), count(lit(1)).as("matched"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  test("indexed BM25 equals the scan path exactly, for several term sets") {
    val dir = freshDir("bm25")
    TextIndex.build(spark, dir, docs)
    for (terms <- Seq(Seq("query", "join", "table"), Seq("spark"),
        Seq("data", "vector", "stream", "spark"))) {
      val idx = TextIndex.searchBm25(spark, dir, terms, 25).collect().toSeq
      val scan = scanBm25(terms, 25).collect().toSeq
      assert(idx === scan, s"indexed vs scan BM25 diverged for terms $terms")
      assert(idx.nonEmpty)
    }
  }

  test("indexed tf-idf matches an independently computed score") {
    val dir = freshDir("tfidf")
    TextIndex.build(spark, dir, docs)
    val terms = Seq("query", "join")
    val idx = TextIndex.searchTfIdf(spark, dir, terms, 10).collect()
    // independent twin: q_text_search's scoring shape
    val qtok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(col("term").isin(terms: _*))
    val tf = qtok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = qtok.groupBy("term").agg(countDistinct(col("doc_id")).as("dfc"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scan = tf.join(broadcast(dft), "term").crossJoin(broadcast(n))
      .withColumn("w", col("tf") * log(col("n").cast("double") / col("dfc")))
      .groupBy("doc_id")
      .agg(round(sum("w"), 6).as("score"), count(lit(1)).as("matched"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10).collect()
    assert(idx === scan)
  }

  test("a crashed rebuild fails the next search loudly; a re-run heals it") {
    val dir = freshDir("crash")
    TextIndex.build(spark, dir, docs)
    // simulate a build that died between beginRebuild and completeRebuild
    GenStamp.beginRebuild(spark, dir)
    val e = intercept[IllegalArgumentException] {
      TextIndex.searchBm25(spark, dir, Seq("query"), 5).collect()
    }
    assert(e.getMessage.contains("TextIndex.build"))
    assert(!TextIndex.exists(spark, dir))
    TextIndex.build(spark, dir, docs) // the documented recovery
    assert(TextIndex.exists(spark, dir))
    assert(TextIndex.searchBm25(spark, dir, Seq("query"), 5).count() === 5)
  }

  test("pruned postings read touches fewer files than the layout total") {
    val dir = freshDir("prune")
    TextIndex.build(spark, dir, docs)
    val all = spark.read.parquet(TextIndex.postingsPath(dir))
    val total = all.select(col("_metadata.file_path")).distinct().count()
    val kept = TextIndex.postingsFor(spark, dir, Seq("query", "join"))
      .select(col("_metadata.file_path")).distinct().count()
    assert(kept < total, s"pruned read touched all $total files")
    assert(kept >= 1)
  }

  test("empty or absent term sets return empty results, not errors") {
    val dir = freshDir("empty")
    TextIndex.build(spark, dir, docs)
    assert(TextIndex.postingsFor(spark, dir, Nil).count() === 0)
    assert(TextIndex.searchBm25(spark, dir, Seq("zzz_not_a_token"), 5).count() === 0)
  }

  test("batch retrieval equals the per-query single search, qid by qid") {
    import spark.implicits._
    val dir = freshDir("batch")
    TextIndex.build(spark, dir, docs)
    val qs = Seq((1L, "query"), (1L, "join"), (2L, "data"), (2L, "stream"),
      (3L, "table"), (3L, "spark"), (4L, "zzz_absent"))
    val batch = TextIndex.searchBatchBm25(spark, dir, qs.toDF("qid", "term"), 10)
      .collect().groupBy(_.getLong(0))
    qs.groupBy(_._1).foreach { case (qid, rows) =>
      val single = TextIndex.searchBm25(spark, dir, rows.map(_._2), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val got = batch.getOrElse(qid, Array.empty)
        .sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getDouble(3), r.getLong(4)))
      assert(got.toSeq === single.toSeq, s"qid $qid batch vs single diverged")
    }
    // the all-absent query contributes no rows, not an error
    assert(!batch.contains(4L))
  }

  test("an empty-corpus build leaves a readable empty index, not a schema-less husk") {
    val dir = freshDir("emptycorpus")
    TextIndex.build(spark, dir, docs.where(lit(false)))
    assert(TextIndex.exists(spark, dir))
    assert(TextIndex.searchBm25(spark, dir, Seq("query"), 5).count() === 0)
    assert(TextIndex.postingsFor(spark, dir, Seq("query")).count() === 0)
    // a rebuild over real data replaces it cleanly
    TextIndex.build(spark, dir, docs)
    assert(TextIndex.searchBm25(spark, dir, Seq("query"), 5).count() === 5)
  }

  test("exists: false before build, true after, false for a marker husk") {
    val dir = freshDir("exists")
    assert(!TextIndex.exists(spark, dir))
    TextIndex.build(spark, dir, docs)
    assert(TextIndex.exists(spark, dir))
    GenStamp.beginRebuild(spark, dir)
    assert(!TextIndex.exists(spark, dir))
  }

  test("declared q_text_search_indexed runs and carries its oracle") {
    val out = graft.operators.TextOps.queries("q_text_search_indexed")(spark, sf)
    val rows = out.collect()
    assert(rows.length === 10)
    assert(graft.operators.TextOps.oracle.contains("q_text_search_indexed"))
    // schema contract with the oracle: (doc_id, score, matched)
    assert(out.columns.toSeq === Seq("doc_id", "score", "matched"))
  }
}
