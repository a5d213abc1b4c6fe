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

  // ------------------------------------------------------------------
  // Incremental maintenance (r18): delta segments + merge-on-read +
  // compaction. The central law: build(A) + append(B) + append(C)
  // answers every search exactly as build(A ∪ B ∪ C) would, and
  // compactTextIndex folds the segments into a base whose TABLES are
  // row-identical to the one-shot build's.
  // ------------------------------------------------------------------

  private def termSets = Seq(Seq("query", "join", "table"), Seq("spark"),
    Seq("data", "vector", "stream", "spark"), Seq("zzz_not_a_token"))

  private def assertSearchesEqual(dirA: String, dirB: String, note: String): Unit = {
    import spark.implicits._
    for (terms <- termSets) {
      assert(TextIndex.searchBm25(spark, dirA, terms, 25).collect().toSeq ===
        TextIndex.searchBm25(spark, dirB, terms, 25).collect().toSeq,
        s"$note: BM25 diverged for $terms")
      assert(TextIndex.searchTfIdf(spark, dirA, terms, 25).collect().toSeq ===
        TextIndex.searchTfIdf(spark, dirB, terms, 25).collect().toSeq,
        s"$note: tf-idf diverged for $terms")
    }
    val qs = Seq((1L, "query"), (1L, "join"), (2L, "data"), (2L, "stream"),
      (3L, "table"), (3L, "spark")).toDF("qid", "term")
    assert(TextIndex.searchBatchBm25(spark, dirA, qs, 10).collect().toSeq ===
      TextIndex.searchBatchBm25(spark, dirB, qs, 10).collect().toSeq,
      s"$note: batch BM25 diverged")
    for (phrase <- Seq(Seq("join", "order"), Seq("the", "fast", "key")))
      assert(TextIndex.searchPhrase(spark, dirA, phrase, 20).collect().toSeq ===
        TextIndex.searchPhrase(spark, dirB, phrase, 20).collect().toSeq,
        s"$note: phrase search diverged for $phrase")
  }

  private def postingsRows(dir: String): Seq[String] =
    spark.read.parquet(TextIndex.postingsPath(dir))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("positions"), col("term_bucket").cast("int"))
      .collect().map(_.toString).sorted.toSeq

  test("build + append + append answers searches exactly as the one-shot rebuild") {
    val inc = freshDir("inc")
    val oneshot = freshDir("oneshot")
    TextIndex.build(spark, inc, docs.where(col("doc_id") % 3 === 0))
    TextIndex.append(spark, inc, docs.where(col("doc_id") % 3 === 1))
    TextIndex.append(spark, inc, docs.where(col("doc_id") % 3 === 2))
    TextIndex.build(spark, oneshot, docs)
    assertSearchesEqual(inc, oneshot, "merge-on-read")
  }

  test("compactTextIndex folds deltas into a base row-identical to the one-shot build") {
    val inc = freshDir("fold")
    val oneshot = freshDir("fold1s")
    TextIndex.build(spark, inc, docs.where(col("doc_id") % 3 === 0))
    TextIndex.append(spark, inc, docs.where(col("doc_id") % 3 === 1))
    TextIndex.append(spark, inc, docs.where(col("doc_id") % 3 === 2))
    TextIndex.build(spark, oneshot, docs)
    assert(TextIndex.compactTextIndex(spark, inc) === Seq(1L, 2L))
    // deltas gone, stage/manifest debris gone, fence lifted
    val fs = new org.apache.hadoop.fs.Path(inc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$inc/deltas")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$inc/deltas")).isEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$inc/_compact_stage")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$inc/_compact_manifest")))
    assert(TextIndex.exists(spark, inc))
    // table-level equality with the one-shot build
    assert(postingsRows(inc) === postingsRows(oneshot))
    val sInc = spark.read.parquet(TextIndex.statsPath(inc)).collect().toSeq
    val sOne = spark.read.parquet(TextIndex.statsPath(oneshot)).collect().toSeq
    assert(sInc === sOne, "merged stats must be bit-equal to the one-shot build's")
    assertSearchesEqual(inc, oneshot, "post-compaction")
    // a second compaction is a no-op
    assert(TextIndex.compactTextIndex(spark, inc) === Nil)
  }

  test("a crashed append leaves only ignorable debris; the next append GCs it") {
    val dir = freshDir("appcrash")
    TextIndex.build(spark, dir, docs.where(col("doc_id") % 2 === 0))
    // simulate: a delta staged but never renamed (crash before commit)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/deltas/_tmp_1"))
    val clean = freshDir("appclean")
    TextIndex.build(spark, clean, docs.where(col("doc_id") % 2 === 0))
    assertSearchesEqual(dir, clean, "tmp debris must be invisible")
    TextIndex.append(spark, dir, docs.where(col("doc_id") % 2 === 1))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/deltas/_tmp_1")),
      "the next append must GC crashed-append debris")
    TextIndex.append(spark, clean, docs.where(col("doc_id") % 2 === 1))
    assertSearchesEqual(dir, clean, "post-GC append")
  }

  test("compaction crash windows: pre-marker discards, post-marker heals forward") {
    val oneshot = freshDir("cconeshot")
    TextIndex.build(spark, oneshot, docs)
    // window 1: stage + manifest committed, marker never rose — sources
    // intact, searches unaffected, re-run folds cleanly
    val w1 = freshDir("ccw1")
    TextIndex.build(spark, w1, docs.where(col("doc_id") % 2 === 0))
    TextIndex.append(spark, w1, docs.where(col("doc_id") % 2 === 1))
    TextIndex.failDuringCompact = 1
    intercept[IllegalStateException](TextIndex.compactTextIndex(spark, w1))
    assertSearchesEqual(w1, oneshot, "window-1 crash must not affect reads")
    assert(TextIndex.compactTextIndex(spark, w1) === Seq(1L))
    assert(postingsRows(w1) === postingsRows(oneshot))
    // window 2: marker up, swap not run — reads fail LOUDLY, the re-run
    // heals forward from the complete stage
    val w2 = freshDir("ccw2")
    TextIndex.build(spark, w2, docs.where(col("doc_id") % 2 === 0))
    TextIndex.append(spark, w2, docs.where(col("doc_id") % 2 === 1))
    TextIndex.failDuringCompact = 2
    intercept[IllegalStateException](TextIndex.compactTextIndex(spark, w2))
    val e = intercept[IllegalArgumentException](
      TextIndex.searchBm25(spark, w2, Seq("query"), 5).collect())
    assert(e.getMessage.contains("TextIndex.build"))
    // the heal runs at the next compact's head; folded ids were already
    // manifested, so the re-run reports no NEW folds — but the tables
    // must land identical to the one-shot build
    TextIndex.compactTextIndex(spark, w2)
    assert(TextIndex.exists(spark, w2))
    assert(postingsRows(w2) === postingsRows(oneshot))
    assertSearchesEqual(w2, oneshot, "window-2 heal")
  }

  test("append requires a completed base and refuses a mid-rebuild index") {
    val dir = freshDir("appfence")
    TextIndex.build(spark, dir, docs)
    GenStamp.beginRebuild(spark, dir)
    val e = intercept[IllegalArgumentException](
      TextIndex.append(spark, dir, docs.limit(5)))
    assert(e.getMessage.contains("TextIndex.build"))
  }

  test("indexed phrase search equals substring counting on the aliasing-free corpus") {
    val dir = freshDir("phrase")
    TextIndex.build(spark, dir, docs)
    for (phrase <- Seq(Seq("join", "order"), Seq("key", "order"),
        Seq("the", "fast", "key"))) {
      val pl = phrase.mkString(" ")
      val scan = docs
        .withColumn("hits",
          ((length(col("text")) -
            length(expr(s"replace(text, '$pl', '')"))) / pl.length)
            .cast("bigint"))
        .where(col("hits") > 0)
        .select("doc_id", "hits")
        .orderBy(col("hits").desc, col("doc_id").asc)
        .limit(20).collect().toSeq
      val idx = TextIndex.searchPhrase(spark, dir, phrase, 20).collect().toSeq
      assert(idx === scan, s"indexed phrase diverged from substring scan for '$pl'")
      assert(idx.nonEmpty, s"fixture phrase '$pl' matched nothing — weak law")
    }
    // single-token phrase degenerates to tf ranking
    val one = TextIndex.searchPhrase(spark, dir, Seq("spark"), 5).collect()
    assert(one.length === 5 && one.forall(_.getLong(1) >= 1))
    // an absent term empties the result, not errors
    assert(TextIndex.searchPhrase(spark, dir, Seq("join", "zzz_absent"), 5).count() === 0)
    // overlapping self-phrase: adjacency counts overlaps, substring does
    // not — the documented boundary of the shared-oracle equivalence
    val rep = TextIndex.searchPhrase(spark, dir, Seq("batch", "batch"), 5).collect()
    rep.foreach(r => assert(r.getLong(1) >= 1))
  }

  test("batch phrase search equals the single-phrase search, qid by qid") {
    import spark.implicits._
    val dir = freshDir("phrasebatch")
    TextIndex.build(spark, dir, docs)
    val phrases = Map(
      1 -> Seq("join", "order"),
      2 -> Seq("the", "fast", "key"),
      3 -> Seq("spark"),
      4 -> Seq("join", "zzz_absent"))
    val qs = phrases.toSeq.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t) }
    }.toDF("qid", "pos", "term")
    val batch = TextIndex.searchPhraseBatch(spark, dir, qs, 10)
      .collect().groupBy(_.getInt(0))
    phrases.foreach { case (qid, ts) =>
      val single = TextIndex.searchPhrase(spark, dir, ts, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val got = batch.getOrElse(qid, Array.empty).sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getLong(3))).toSeq
      assert(got === single, s"qid $qid batch vs single phrase search diverged")
    }
    assert(!batch.contains(4), "the absent-term phrase must contribute no rows")
    assert(batch(1).nonEmpty && batch(3).nonEmpty)
    // slot-contract violations fail loudly up front
    val gapped = Seq((9, 0, "join"), (9, 2, "order")).toDF("qid", "pos", "term")
    val e = intercept[IllegalArgumentException](
      TextIndex.searchPhraseBatch(spark, dir, gapped, 5))
    assert(e.getMessage.contains("contiguous"))
  }

  test("status reports segment shape and the measured compaction knob") {
    val dir = freshDir("status")
    assert(TextIndex.status(spark, dir) ===
      TextIndex.Status(exists = false, 0, 0L, compactRecommended = false))
    TextIndex.build(spark, dir, docs.where(col("doc_id") % 5 === 0))
    (1 to 4).foreach(i =>
      TextIndex.append(spark, dir, docs.where(col("doc_id") % 5 === i)))
    val st = TextIndex.status(spark, dir)
    assert(st.exists && st.deltaSegments === 4)
    assert(st.docs === docs.count(), "stats tier must carry the exact corpus size")
    assert(st.compactRecommended, "4 live deltas >= the default compactAt")
    assert(!TextIndex.status(spark, dir, compactAt = 10).compactRecommended)
    TextIndex.compactTextIndex(spark, dir)
    val after = TextIndex.status(spark, dir)
    assert(after.deltaSegments === 0 && !after.compactRecommended &&
      after.docs === docs.count())
  }

  test("text ingest with textIndexDir maintains the BM25 index per window") {
    import graft.sources.AssetIngest
    val base = java.nio.file.Files.createTempDirectory("ingest_tidx").toString
    val (idx, data, tidx) = (s"$base/idx", s"$base/data", s"$base/tidx")
    val d = docs.select("doc_id", "source", "text")
    AssetIngest.ingestTextBatch(spark, d.where(col("doc_id") < 100), idx, data,
      batchId = Some("w0"), textIndexDir = Some(tidx))
    AssetIngest.ingestTextBatch(spark,
      d.where(col("doc_id") >= 100 && col("doc_id") < 200), idx, data,
      batchId = Some("w1"), textIndexDir = Some(tidx))
    // window 0 built the base, window 1 appended a delta
    assert(TextIndex.status(spark, tidx).deltaSegments === 1)
    // the index answers exactly as a one-shot build over the LANDED docs
    val landed = spark.read.parquet(s"$data/docs").select("doc_id", "text")
    val oneshot = freshDir("ingest1s")
    TextIndex.build(spark, oneshot, landed, "doc_id", "text")
    for (terms <- Seq(Seq("query", "join", "table"), Seq("spark"))) {
      assert(TextIndex.searchBm25(spark, tidx, terms, 15).collect().toSeq ===
        TextIndex.searchBm25(spark, oneshot, terms, 15).collect().toSeq,
        s"ingest-maintained index diverged from one-shot for $terms")
    }
    // a retried window admits nothing and leaves the index unchanged
    val before = TextIndex.status(spark, tidx)
    AssetIngest.ingestTextBatch(spark,
      d.where(col("doc_id") >= 100 && col("doc_id") < 200), idx, data,
      batchId = Some("w1"), textIndexDir = Some(tidx))
    assert(TextIndex.status(spark, tidx) === before,
      "a fully-ingested retry must append no text-index segment")
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
