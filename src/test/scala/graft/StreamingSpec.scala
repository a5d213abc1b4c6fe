package graft

import java.sql.Timestamp

import graft.streaming.{DocEv, Ev, LVec, QVec, SrcDoc, StreamingOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** MemoryStream-driven checks of the streaming twins: watermark semantics,
  * late-data drops, stateful processing, and batch/stream plan symmetry.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def ev(id: Long, t: String, uid: Long = 1, typ: String = "click", v: Double = 1.0) =
    Ev(id, ts(t), uid, typ, v)

  test("tumbling agg emits closed windows and drops late-beyond-watermark rows") {
    import spark.implicits._
    val in = MemoryStream[Ev](1, spark, None)
    val q = StreamingOps.tumblingCounts(in.toDF(), "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("tumble_out").start()
    try {
      // window [10:00,11:00) gets 2 rows; then advance event time past
      // 11:10 so the watermark closes that window.
      in.addData(ev(1, "10:05"), ev(2, "10:20"))
      q.processAllAvailable()
      in.addData(ev(3, "11:30"))
      q.processAllAvailable()
      val afterClose = spark.table("tumble_out")
        .where(col("wstart") === ts("10:00")).select("n").collect()
      assert(afterClose.map(_.getLong(0)).toSeq === Seq(2L))
      // late row inside the closed window: watermark (11:30-10m=11:20)
      // is past window end 11:00 → must be dropped, emitted count stays 2.
      in.addData(ev(4, "10:40"))
      q.processAllAvailable()
      val afterLate = spark.table("tumble_out")
        .where(col("wstart") === ts("10:00")).select("n").collect()
      assert(afterLate.map(_.getLong(0)).toSeq === Seq(2L),
        "late-beyond-watermark row leaked into a closed window")
    } finally q.stop()
  }

  test("late-but-within-watermark rows are included") {
    import spark.implicits._
    val in = MemoryStream[Ev](2, spark, None)
    val q = StreamingOps.tumblingCounts(in.toDF(), "2 hours")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("tumble_wm").start()
    try {
      in.addData(ev(1, "10:05"), ev(2, "11:30"))
      q.processAllAvailable()
      // watermark = 11:30 - 2h = 09:30 < 11:00 → window [10:00,11:00) still
      // open; a "late" 10:40 row must be included when it finally closes.
      in.addData(ev(3, "10:40"))
      q.processAllAvailable()
      in.addData(ev(4, "13:30")) // watermark 11:30 → closes [10:00,11:00)
      q.processAllAvailable()
      val rows = spark.table("tumble_wm")
        .where(col("wstart") === ts("10:00")).select("n").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(2L))
    } finally q.stop()
  }

  test("session windows merge events within the 30-minute gap") {
    import spark.implicits._
    val in = MemoryStream[Ev](3, spark, None)
    val q = StreamingOps.sessionCounts(in.toDF(), "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    try {
      // one session (gaps < 30m): 10:00,10:20,10:45; a second session at 12:00
      in.addData(ev(1, "10:00"), ev(2, "10:20"), ev(3, "10:45"), ev(4, "12:00"))
      q.processAllAvailable()
      in.addData(ev(5, "14:00")) // advance watermark to close both sessions
      q.processAllAvailable()
      val sessions = spark.table("sess_out")
        .where(col("user_id") === 1 && col("session_start") < ts("13:00"))
        .select("session_start", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).sortBy(_._1.getTime)
      assert(sessions.toSeq === Seq((ts("10:00"), 3L), (ts("12:00"), 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps one row per user/type") {
    import spark.implicits._
    val in = MemoryStream[Ev](4, spark, None)
    val q = StreamingOps.dedupEvents(in.toDF(), "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData(ev(1, "10:00"), ev(2, "10:01"), ev(3, "10:02", typ = "view"))
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      assert(n === 2, s"expected 2 deduped rows, got $n")
    } finally q.stop()
  }

  test("flatMapGroupsWithState(EventTimeTimeout) emits sessions on watermark timeout and drops state") {
    import spark.implicits._
    val in = MemoryStream[Ev](6, spark, None)
    val q = StreamingOps.sessionizeWithTimeout(in.toDS(), gapMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_state_out").start()
    try {
      // one open session for user 7: 10:00, 10:20
      in.addData(ev(1, "10:00", uid = 7), ev(2, "10:20", uid = 7))
      q.processAllAvailable()
      assert(spark.table("sess_state_out").count() === 0,
        "open session must not emit before timeout")
      // other-user event advances the watermark to 12:50 — past
      // 10:20 + 30m, so user 7's session times out, emits, state dropped
      in.addData(ev(3, "13:00", uid = 9))
      q.processAllAvailable()
      in.addData(ev(4, "13:05", uid = 9)) // extra trigger to fire the timeout
      q.processAllAvailable()
      val sessions = spark.table("sess_state_out").where(col("user_id") === 7)
        .select("session_start", "session_end", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
      assert(sessions.toSeq === Seq((ts("10:00"), ts("10:20"), 2L)))
      // a NEW user-7 event after the timeout starts a fresh session — if
      // state had survived, this would have merged into the old one
      in.addData(ev(5, "14:00", uid = 7))
      q.processAllAvailable()
      in.addData(ev(6, "16:00", uid = 9)) // advance watermark again
      q.processAllAvailable()
      in.addData(ev(7, "16:05", uid = 9))
      q.processAllAvailable()
      val all7 = spark.table("sess_state_out").where(col("user_id") === 7)
        .select("session_start", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).sortBy(_._1.getTime)
      assert(all7.toSeq === Seq((ts("10:00"), 2L), (ts("14:00"), 1L)))
    } finally q.stop()
  }

  test("sessionizeWithTimeout closes in-batch sessions eagerly on gap") {
    import spark.implicits._
    val in = MemoryStream[Ev](7, spark, None)
    val q = StreamingOps.sessionizeWithTimeout(in.toDS(), gapMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_state_eager").start()
    try {
      // 10:00,10:10 then a >30m gap then 12:00 — first session closes
      // within the batch, no watermark needed
      in.addData(ev(1, "10:00", uid = 3), ev(2, "10:10", uid = 3), ev(3, "12:00", uid = 3))
      q.processAllAvailable()
      val closed = spark.table("sess_state_eager")
        .select("session_start", "session_end", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
      assert(closed.toSeq === Seq((ts("10:00"), ts("10:10"), 2L)))
    } finally q.stop()
  }

  test("streaming curation gates low-quality docs and dedups content in one flow") {
    import spark.implicits._
    val in = MemoryStream[DocEv](13, spark, None)
    val q = StreamingOps.curateStream(in.toDF(), minScore = 0.3, watermark = "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("curate_stream_out").start()
    try {
      val good = "the order of the table is the row of the query " * 3
      in.addData(
        DocEv(1, ts("10:00"), good + "one 123"),
        DocEv(2, ts("10:05"), "x"), // 1 token, no stopwords -> gated out
        DocEv(3, ts("10:10"), good + "one 456")) // same text post-redaction as doc 1
      q.processAllAvailable()
      val rows = spark.table("curate_stream_out")
        .select("doc_id", "text", "score").collect()
      assert(rows.map(_.getLong(0)).toSet === Set(1L),
        "expected only doc 1: doc 2 fails the gate, doc 3 dedups against doc 1")
      // redaction happened before dedup: the kept text carries the placeholder
      assert(rows.head.getString(1).contains("<NUM>"))
      assert(rows.head.getDouble(2) >= 0.3)
    } finally q.stop()
  }

  test("streaming content dedup drops in-horizon duplicates, state bounded by watermark") {
    import spark.implicits._
    val in = MemoryStream[DocEv](12, spark, None)
    val q = StreamingOps.dedupByContent(in.toDF(), watermark = "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("content_dedup_out").start()
    try {
      in.addData(DocEv(1, ts("10:00"), "The quick fox"), DocEv(2, ts("10:05"), "other text"))
      q.processAllAvailable()
      // same normalized content ("  the QUICK fox " -> "the quick fox"),
      // different doc, within the hour: dropped
      in.addData(DocEv(3, ts("10:30"), "  the QUICK fox "))
      q.processAllAvailable()
      assert(spark.table("content_dedup_out").count() === 2)
      // fresh content always passes
      in.addData(DocEv(4, ts("10:40"), "genuinely new"))
      q.processAllAvailable()
      val ids = spark.table("content_dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("streaming index probe flags near-dups of the stored corpus, stateless append") {
    import spark.implicits._
    import graft.operators.DedupOps
    // corpus: three documents with disjoint vocabularies, indexed once
    val mk = (i: Int) => (1 to 12).map(t => s"w${i}_$t").mkString(" ")
    val corpus = Seq((1L, "a", mk(1)), (2L, "a", mk(2)), (3L, "a", mk(3)))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("mh_stream_idx").toString
    DedupOps.writeMinhashIndex(spark, corpus, dir)
    val in = MemoryStream[DocEv](14, spark, None)
    val q = StreamingOps.dedupAgainstIndexStream(in.toDF(), dir)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("idx_probe_out").start()
    try {
      in.addData(
        // near-dup of corpus doc 1: last 2 tokens cut (shingle jac 8/10)
        DocEv(101, ts("10:00"), (1 to 10).map(t => s"w1_$t").mkString(" ")),
        // genuinely novel vocabulary: zero shared shingles
        DocEv(102, ts("10:01"), (1 to 12).map(t => s"fresh_$t").mkString(" ")))
      q.processAllAvailable()
      // the band-priority pick bounds emission to EXACTLY ONE row per
      // matched pair — a raw (no distinct) read must already be deduped
      // even though an identical near-dup agrees in every band
      val pairs = spark.table("idx_probe_out")
        .select("batch_id", "corpus_id", "jac")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.length === 1 && (pairs.head._1, pairs.head._2) === ((101L, 1L)),
        s"expected exactly ONE row for the planted (101, 1) match, got ${pairs.toSeq}")
      assert(pairs.head._3 >= 0.5)
    } finally q.stop()
    // deletion: tombstone corpus doc 1, restart the gate — a fresh
    // near-dup of the deleted doc must pass clean (deleted corpus docs
    // are excluded from both stored tiers at stream planning time)
    import spark.implicits._
    DedupOps.deleteFromMinhashIndex(spark, Seq(1L).toDF("doc_id"), dir)
    val in2 = MemoryStream[DocEv](15, spark, None)
    val q2 = StreamingOps.dedupAgainstIndexStream(in2.toDF(), dir)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("idx_probe_out2").start()
    try {
      in2.addData(DocEv(103, ts("10:05"), (1 to 10).map(t => s"w1_$t").mkString(" ")))
      q2.processAllAvailable()
      assert(spark.table("idx_probe_out2").count() === 0,
        "a near-dup of a DELETED corpus doc was still flagged")
    } finally q2.stop()
  }

  test("streaming BM25 gate scores arriving docs with the index's exact stats, stateless") {
    import spark.implicits._
    import graft.sources.TextIndex
    // literal corpus with hand-checkable statistics: n=3, sum_dl=11
    val corpus = Seq((1L, "apple banana apple cherry"),
      (2L, "banana cherry date"), (3L, "apple date date fig"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25_gate").toString + "/idx"
    TextIndex.build(spark, dir, corpus)
    // watched set: qid 1 = {apple, cherry}; qid 2 = {fig, zzz} where zzz
    // is absent from the corpus (df = 0 — the honest unseen-term idf)
    val watched = Seq((1L, "apple"), (1L, "cherry"), (2L, "fig"), (2L, "zzz"))
      .toDF("qid", "term")
    // independent expected-score twin: pure Scala doubles in the exact
    // association and fold order of the batch scorer (terms sorted,
    // zero-tf terms contribute +0.0)
    val n = 3.0; val avgdl = 11.0 / 3.0
    val dfOf = Map("apple" -> 2.0, "cherry" -> 2.0, "fig" -> 1.0, "zzz" -> 0.0)
    def score(terms: Seq[String], toks: Seq[String]): (Double, Long) = {
      val dl = toks.length
      val w = terms.sorted.foldLeft(0.0) { (acc, t) =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log((n - dfOf(t) + 0.5) / (dfOf(t) + 0.5) + 1.0)
        acc + (if (tf > 0)
          (idf * (tf * 2.2)) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        else 0.0)
      }
      (BigDecimal(w).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        terms.count(t => toks.contains(t)).toLong)
    }
    val in = MemoryStream[DocEv](21, spark, None)
    val q = StreamingOps.bm25ScoreStream(in.toDF(), dir, watched)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bm25_gate_out").start()
    try {
      in.addData(
        DocEv(100, ts("10:00"), "apple apple cherry kiwi"), // matches qid 1 only
        DocEv(101, ts("10:01"), "zzz fig zzz"),             // matches qid 2 only
        DocEv(102, ts("10:02"), "kiwi mango"))              // matches nothing
      q.processAllAvailable()
      val got = spark.table("bm25_gate_out")
        .select("doc_id", "qid", "score", "matched").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
      val exp100 = score(Seq("apple", "cherry"), "apple apple cherry kiwi".split(" ").toSeq)
      val exp101 = score(Seq("fig", "zzz"), "zzz fig zzz".split(" ").toSeq)
      assert(got === Map((100L, 1L) -> exp100, (101L, 2L) -> exp101),
        s"stream scores diverged from the hand-computed batch twin: $got")
      // a second batch re-scores statelessly (no dedup, no state)
      in.addData(DocEv(103, ts("10:05"), "apple apple cherry kiwi"))
      q.processAllAvailable()
      assert(spark.table("bm25_gate_out").where(col("doc_id") === 103).count() === 1)
      assert(spark.table("bm25_gate_out")
        .where(col("doc_id") === 103).head().getDouble(3) === exp100._1)
    } finally q.stop()
    // for a doc the INDEX also holds, the gate's score equals the
    // persisted searchBm25 on the same terms — the scorer-twin law
    val in2 = MemoryStream[DocEv](22, spark, None)
    val q2 = StreamingOps.bm25ScoreStream(in2.toDF(), dir,
      Seq((9L, "apple"), (9L, "cherry")).toDF("qid", "term"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bm25_gate_twin").start()
    try {
      in2.addData(DocEv(1, ts("11:00"), "apple banana apple cherry"))
      q2.processAllAvailable()
      val streamScore = spark.table("bm25_gate_twin").head().getDouble(3)
      val batchScore = TextIndex.searchBm25(spark, dir, Seq("apple", "cherry"), 3)
        .where(col("doc_id") === 1).head().getDouble(1)
      assert(streamScore === batchScore,
        s"gate score $streamScore != persisted searchBm25 score $batchScore for an indexed doc")

      // restart contract: a deletion shrinks (N, avgdl, df) for a NEWLY
      // constructed gate (stats snapshot at construction, the probe
      // family's convention) — scores move to the rebuild-without-
      // victims values the batch face serves
      TextIndex.deleteFrom(spark, dir, Seq(3L).toDF("doc_id"))
      val in3 = MemoryStream[DocEv](23, spark, None)
      val q3 = StreamingOps.bm25ScoreStream(in3.toDF(), dir,
        Seq((9L, "apple"), (9L, "cherry")).toDF("qid", "term"))
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("bm25_gate_restart").start()
      try {
        in3.addData(DocEv(1, ts("12:00"), "apple banana apple cherry"))
        q3.processAllAvailable()
        val restartScore = spark.table("bm25_gate_restart").head().getDouble(3)
        val deletedBatch = TextIndex.searchBm25(spark, dir, Seq("apple", "cherry"), 3)
          .where(col("doc_id") === 1).head().getDouble(1)
        assert(restartScore === deletedBatch,
          s"restarted gate score $restartScore != post-delete searchBm25 $deletedBatch")
        assert(restartScore !== batchScore,
          "the delete must actually move the snapshot stats (N/avgdl/df shrink)")
      } finally q3.stop()
    } finally q2.stop()
  }

  test("streaming hybrid gate: both leg scores exact per doc; trigger fuse == batch RRF arithmetic on the same rows") {
    import spark.implicits._
    import graft.sources.TextIndex
    import graft.streaming.HybridDocEv
    graft.functions.GraftFunctions.register(spark)
    val corpus = Seq((1L, "apple banana apple cherry"),
      (2L, "banana cherry date"), (3L, "apple date date fig"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hybrid_gate").toString + "/idx"
    TextIndex.build(spark, dir, corpus)
    // qid 1: both legs; qid 2: dense-only; qid 3: lex-only
    val wLex = Seq((1L, "apple"), (1L, "cherry"), (3L, "date"))
      .toDF("qid", "term")
    val wDense = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("qid", "embedding")
    def v(a: Float, b: Float, c: Float): Seq[Float] = Seq(a, b, c)
    val docs = Seq(
      HybridDocEv(100L, ts("10:00"), "apple apple cherry kiwi", v(0.9f, 0.1f, 0f)),
      HybridDocEv(101L, ts("10:01"), "date date fig", v(0.2f, 0.8f, 0f)),
      HybridDocEv(102L, ts("10:02"), "kiwi mango", v(0.5f, 0.5f, 0f)))
    val in = MemoryStream[HybridDocEv](31, spark, None)
    val q = StreamingOps.hybridScoreStream(in.toDF(), dir, wLex, wDense)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hybrid_gate_out").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("hybrid_gate_out")
      // dense leg exact: sim == round(dot, 6) for every (doc, dense qid)
      val wants = for (d <- docs; (qid, qv) <- Seq(
          1L -> v(1f, 0f, 0f), 2L -> v(0f, 1f, 0f))) yield {
        val dot = d.embedding.zip(qv).map { case (x, y) =>
          x.toDouble * y.toDouble }.sum
        (d.doc_id, qid) ->
          BigDecimal(dot).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val simGot = got.where(col("sim").isNotNull)
        .select("doc_id", "qid", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(simGot === wants.toMap, "dense-leg sims diverged from round(dot, 6)")
      // lexical leg: doc 100 matches qid 1's terms; doc 101 matches qid 3
      assert(got.where(col("bm25").isNotNull)
        .select("doc_id", "qid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet === Set((100L, 1L), (101L, 3L)))
      // a lex-only qid never emits sims; a dense-only qid never emits bm25
      assert(got.where(col("qid") === 3L && col("sim").isNotNull).count() === 0)
      assert(got.where(col("qid") === 2L && col("bm25").isNotNull).count() === 0)
      // fusion law: fuseHybridTrigger on the trigger's rows == the batch
      // RRF arithmetic (rrfFuseBatch) over per-leg rankings derived
      // independently from the same rows
      val trig = got.select("doc_id", "qid", "bm25", "sim")
      val fused = StreamingOps.fuseHybridTrigger(trig, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
      // hand legs as LITERAL frames (collected Scala ranks), so the
      // reference fuse is rrfFuseBatch on lineage-independent inputs —
      // an entirely separate code path from fuseHybridTrigger's
      // join-free window form
      val rows = trig.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      val handDense = rows.filter(_._4.isDefined)
        .groupBy(_._2).toSeq.flatMap { case (qid, rs) =>
          rs.sortBy(r => (-r._4.get, r._1)).zipWithIndex
            .map { case (r, i) => (qid, r._1, i + 1) }
        }.toDF("qid", "id", "vrank")
      val handLex = rows.filter(_._3.isDefined)
        .groupBy(_._2).toSeq.flatMap { case (qid, rs) =>
          rs.sortBy(r => (-r._3.get, r._1)).zipWithIndex
            .map { case (r, i) => (qid, r._1, i + 1) }
        }.toDF("qid", "id", "lrank")
      val want = graft.operators.VectorOps.rrfFuseBatch(handDense, handLex, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
      assert(fused === want, "trigger fuse diverged from the batch RRF arithmetic")
      assert(fused.nonEmpty)
    } finally q.stop()
  }

  test("hybridGateSink: per-trigger fused hits land exactly-once under their trigger partition") {
    import spark.implicits._
    import graft.sources.TextIndex
    import graft.streaming.HybridDocEv
    graft.functions.GraftFunctions.register(spark)
    val corpus = Seq((1L, "apple banana apple cherry"),
      (2L, "banana cherry date"), (3L, "apple date date fig"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("hybrid_sink").toString
    val dir = s"$base/idx"
    TextIndex.build(spark, dir, corpus)
    val wLex = Seq((1L, "apple"), (1L, "cherry")).toDF("qid", "term")
    val wDense = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("qid", "embedding")
    val in = MemoryStream[HybridDocEv](32, spark, None)
    var reports = List.empty[(Long, Long)]
    val q = StreamingOps.hybridGateSink(in.toDF(), dir, wLex, wDense,
        s"$base/out", s"$base/ckpt", k = 3,
        onTrigger = (id, f) => reports ::= (id, f.count()))
      .start()
    try {
      in.addData(
        HybridDocEv(100L, ts("10:00"), "apple apple cherry", Seq(0.9f, 0.1f)),
        HybridDocEv(101L, ts("10:01"), "kiwi", Seq(0.2f, 0.8f)))
      q.processAllAvailable()
      in.addData(HybridDocEv(102L, ts("10:05"), "apple", Seq(0.7f, 0.3f)))
      q.processAllAvailable()
      val landed = spark.read.parquet(s"$base/out")
      // two trigger partitions, each holding ITS docs' fused hits
      assert(landed.select("trigger_id").distinct().count() === 2)
      val t0 = landed.where(col("trigger_id") === 0)
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // trigger 0: qid 1 fuses docs 100 (both legs) + 101 (dense only);
      // qid 2 (dense-only) fuses both docs
      assert(t0 === Set((1L, 100L), (1L, 101L), (2L, 100L), (2L, 101L)))
      assert(landed.where(col("trigger_id") === 1)
        .select("id").collect().map(_.getLong(0)).toSet === Set(102L))
      assert(reports.map(_._1).sorted === List(0L, 1L))
      // replay-idempotence: re-landing trigger 0's rows (the foreachBatch
      // at-least-once case) overwrites its own partition — no duplicates,
      // trigger 1 untouched
      val trig0 = StreamingOps.hybridScoreStream(
        Seq((100L, ts("10:00"), "apple apple cherry", Seq(0.9f, 0.1f)),
          (101L, ts("10:01"), "kiwi", Seq(0.2f, 0.8f)))
          .toDF("doc_id", "ts", "text", "embedding"), dir, wLex, wDense)
      val before = spark.read.parquet(s"$base/out").orderBy("trigger_id", "qid", "id")
        .collect().toSeq
      StreamingOps.landFusedTrigger(trig0, s"$base/out", 0L, k = 3)
      val after = spark.read.parquet(s"$base/out").orderBy("trigger_id", "qid", "id")
        .collect().toSeq
      assert(after === before, "a replayed trigger must replace, not append")
    } finally q.stop()
  }

  test("streaming decontamination gate: one row per doc, exact leaked counts, stateless") {
    import spark.implicits._
    val mk = (i: Int) => (1 to 12).map(t => s"w${i}_$t").mkString(" ")
    val benchmark = Seq((1L, mk(1)), (2L, mk(2))).toDF("doc_id", "text")
    val in = MemoryStream[DocEv](16, spark, None)
    val q = StreamingOps.contaminationGateStream(in.toDF(), benchmark)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("contam_gate_out").start()
    try {
      in.addData(
        // first 8 tokens of benchmark doc 1 -> exactly 4 leaked 5-grams
        DocEv(201, ts("10:00"), (1 to 8).map(t => s"w1_$t").mkString(" ")),
        // disjoint vocabulary: clean
        DocEv(202, ts("10:01"), (1 to 12).map(t => s"fresh_$t").mkString(" ")))
      q.processAllAvailable()
      val rows = spark.table("contam_gate_out")
        .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getBoolean(3)))).toMap
      assert(rows.keySet === Set(201L, 202L), s"expected one row per doc, got $rows")
      assert(rows(201) === ((4, false)), s"contaminated doc mis-scored: ${rows(201)}")
      assert(rows(202) === ((0, true)), s"clean doc mis-scored: ${rows(202)}")
    } finally q.stop()
  }

  test("bloom decontamination gate: admits exactly the exact gate's clean docs, no join") {
    import spark.implicits._
    // same fixture as the exact-gate test: at fpp=1e-5 over ~16 grams
    // the FP probability is ~1e-4, so hits should equal the exact
    // leaked counts outright — and the clean/flag decision MUST agree
    // (bloom-clean ⊆ exact-clean can only break via a false negative,
    // which a bloom cannot produce)
    val mk = (i: Int) => (1 to 12).map(t => s"w${i}_$t").mkString(" ")
    val benchmark = Seq((1L, mk(1)), (2L, mk(2))).toDF("doc_id", "text")
    val in = MemoryStream[DocEv](26, spark, None)
    val q = StreamingOps.contaminationGateStreamBloom(in.toDF(), benchmark)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("contam_bloom_out").start()
    try {
      in.addData(
        DocEv(201, ts("10:00"), (1 to 8).map(t => s"w1_$t").mkString(" ")),
        DocEv(202, ts("10:01"), (1 to 12).map(t => s"fresh_$t").mkString(" ")))
      q.processAllAvailable()
      val rows = spark.table("contam_bloom_out")
        .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getBoolean(3)))).toMap
      assert(rows.keySet === Set(201L, 202L), s"expected one row per doc, got $rows")
      assert(rows(201) === ((4, false)), s"contaminated doc mis-scored: ${rows(201)}")
      assert(rows(202) === ((0, true)), s"clean doc mis-scored: ${rows(202)}")
    } finally q.stop()
  }

  test("streaming rate limiter: caps per (user, hour) across batches, fresh cap each hour") {
    import spark.implicits._
    val in = MemoryStream[Ev](19, spark, None)
    val q = StreamingOps.rateLimitStream(in.toDS(), perHour = 3)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("rate_out").start()
    try {
      // batch 1: user 1 floods 4 events in hour 10 -> only 3 admitted;
      // user 2 sends 1 -> admitted
      in.addData(ev(1, "10:00"), ev(2, "10:05"), ev(3, "10:10"), ev(4, "10:15"),
        ev(50, "10:00", uid = 2))
      q.processAllAvailable()
      // batch 2: same user, same hour -> cap already exhausted, 0 admitted
      in.addData(ev(5, "10:20"), ev(6, "10:25"))
      q.processAllAvailable()
      // batch 3: next hour -> fresh cap
      in.addData(ev(7, "11:00"), ev(8, "11:05"))
      q.processAllAvailable()
      val admitted = spark.table("rate_out")
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(admitted === Set(1L, 2L, 3L, 50L, 7L, 8L),
        s"unexpected admission set: $admitted")
    } finally q.stop()
  }

  test("stateful last-touch attribution: credit survives batches, newer touch wins, organic is null") {
    import spark.implicits._
    val in = MemoryStream[Ev](27, spark, None)
    val q = StreamingOps.lastTouchAttributionStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_out").start()
    try {
      // batch 1: an organic purchase (no touch yet), then a click
      in.addData(ev(1, "10:00", typ = "purchase"), ev(2, "10:05", typ = "click"))
      q.processAllAvailable()
      // batch 2: the purchase credits the batch-1 click ACROSS batches;
      // a signup then replaces the click and takes the next credit
      in.addData(ev(3, "10:10", typ = "purchase"),
        ev(4, "10:15", typ = "signup"), ev(5, "10:20", typ = "purchase"))
      q.processAllAvailable()
      // batch 3: a non-touch, non-convert event must not disturb the state
      in.addData(ev(6, "10:25", typ = "view"), ev(7, "10:30", typ = "purchase"))
      q.processAllAvailable()
      def usOf(t: String) = ts(t).getTime / 1000 * 1000000L + ts(t).getNanos / 1000
      val rows = spark.table("attr_out").collect().map(r => r.getLong(0) ->
        ((Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
      assert(rows(1L) === ((None, None)), "organic purchase must emit null attribution")
      assert(rows(3L) === ((Some("click"), Some(usOf("10:05")))),
        "purchase must credit the previous batch's click")
      assert(rows(5L) === ((Some("signup"), Some(usOf("10:15")))),
        "a newer touch must replace the older one")
      assert(rows(7L) === ((Some("signup"), Some(usOf("10:15")))),
        "a view must neither take nor clear credit")
      assert(rows.size === 4)
    } finally q.stop()
  }

  test("foreachBatch sketch accounting: ledgers match landed data; a replayed batch is absorbed") {
    import spark.implicits._
    import graft.sources.SketchLedger
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files.createTempDirectory("sk_stream").toString
    val in = MemoryStream[SrcDoc](28, spark, None)
    val q = in.toDF().writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: DataFrame, id: Long) =>
        StreamingOps.sketchLedgerBatch(b, id, Seq("source"), "doc_id",
          length(col("source")), dir)
      }.start()
    try {
      in.addData(SrcDoc(1, "a", ts("10:00")), SrcDoc(2, "a", ts("10:01")),
        SrcDoc(3, "bb", ts("10:02")))
      q.processAllAvailable()
      // doc 2 arrives AGAIN in a later batch: rows count it, distinct must not
      in.addData(SrcDoc(4, "a", ts("10:03")), SrcDoc(2, "a", ts("10:04")))
      q.processAllAvailable()
    } finally q.stop()
    def state() = SketchLedger.distinctByKey(spark, s"$dir/distinct").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byKey = state()
    assert(byKey("a") === ((3L, 4L)), s"source a: $byKey")  // distinct {1,2,4}, 4 processed
    assert(byKey("bb") === ((1L, 1L)))
    // foreachBatch is at-least-once: simulate a crashed trigger replaying
    // micro-batch 0 under the SAME batch id — the (keys, batch_id) dedup
    // must leave estimates AND exact rows byte-identical
    val b0 = Seq(SrcDoc(1, "a", ts("10:00")), SrcDoc(2, "a", ts("10:01")),
      SrcDoc(3, "bb", ts("10:02"))).toDF()
    StreamingOps.sketchLedgerBatch(b0, 0L, Seq("source"), "doc_id",
      length(col("source")), dir)
    assert(state() === byKey, "a replayed micro-batch moved the ledger")
    // the quantile twin serves from the same dir pair and stays consistent
    assert(SketchLedger.quantileTotal(spark, s"$dir/size", 0.5) >= 1.0)
  }

  test("streaming mixture gate: rates applied statelessly, replay reproduces the sample") {
    import spark.implicits._
    val rates = Seq(("keep", 1.0), ("double", 2.0), ("drop", 0.0), ("half", 0.5))
      .toDF("source", "rate")
    def run(name: String, id: Int): Map[(Long, String), Seq[Long]] = {
      val in = MemoryStream[SrcDoc](id, spark, None)
      val q = StreamingOps.mixtureGateStream(in.toDF(), rates)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try {
        in.addData((1L to 40L).flatMap(i => Seq(
          SrcDoc(i, "keep", ts("10:00")), SrcDoc(i, "double", ts("10:00")),
          SrcDoc(i, "drop", ts("10:00")), SrcDoc(i, "half", ts("10:00")))))
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
          .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sorted.toSeq).toMap
      } finally q.stop()
    }
    val out = run("mix_gate_out", 17)
    // whole rates exact: every keep-doc once, every double-doc twice
    // with dense epochs, no drop-doc at all
    (1L to 40L).foreach { i =>
      assert(out.get(i -> "keep").contains(Seq(1L)))
      assert(out.get(i -> "double").contains(Seq(1L, 2L)))
      assert(!out.contains(i -> "drop"))
    }
    // fractional rate: admitted subset within Bernoulli bounds, epoch 1
    val halves = out.keys.count(_._2 == "half")
    assert(halves >= 8 && halves <= 32, s"half-rate admitted $halves of 40")
    out.filter(_._1._2 == "half").values.foreach(e => assert(e === Seq(1L)))
    // replaying the identical stream reproduces the identical sample
    assert(run("mix_gate_out2", 18) === out)
    // a malformed rates table fails loudly at wiring time, not as
    // silent per-source data loss
    val bad = intercept[IllegalArgumentException] {
      StreamingOps.mixtureGateStream(
        MemoryStream[SrcDoc](20, spark, None).toDF(),
        Seq(("keep", -1.0)).toDF("source", "rate"))
    }
    assert(bad.getMessage.contains("rates table"))
  }

  test("sessionizeWithTimeout: out-of-order events older than the open session never inflate it") {
    import spark.implicits._
    val in = MemoryStream[Ev](11, spark, None)
    // watermark delay (3h) deliberately larger than the gap (30m): only
    // then can an event be simultaneously NOT watermark-late and far
    // older than the open session — the exact hole this guards.
    val q = StreamingOps.sessionizeWithTimeout(in.toDS(), gapMinutes = 30, watermark = "3 hours")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_state_ooo").start()
    try {
      in.addData(ev(1, "12:00", uid = 9))
      q.processAllAvailable()
      // slightly-older out-of-order: within gap of the span → merges and
      // EXTENDS the start backwards (startMs = min), n = 2
      in.addData(ev(2, "11:45", uid = 9))
      q.processAllAvailable()
      // far-older orphan (10:00 < 11:45 - 30m, watermark only 9:00): its
      // own 1-event session, open session untouched — pre-guard this
      // merged (t - lastMs <= gap trivially true) and corrupted the count
      in.addData(ev(3, "10:00", uid = 9))
      q.processAllAvailable()
      val orphan = spark.table("sess_state_ooo")
        .select("session_start", "session_end", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
      assert(orphan.toSeq === Seq((ts("10:00"), ts("10:00"), 1L)))
      // in-batch gap closes the open session: it must show the merged
      // 11:45 start and exactly 2 events (not 3)
      in.addData(ev(4, "16:00", uid = 9))
      q.processAllAvailable()
      val all = spark.table("sess_state_ooo")
        .select("session_start", "session_end", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).sortBy(_._1.getTime)
      assert(all.toSeq === Seq((ts("10:00"), ts("10:00"), 1L), (ts("11:45"), ts("12:00"), 2L)))
      // watermark is 13:00 now — a 9:00 event is watermark-late and must
      // be dropped entirely (Spark does NOT pre-filter it for us)
      in.addData(ev(5, "09:00", uid = 9))
      q.processAllAvailable()
      assert(spark.table("sess_state_ooo").count() === 2,
        "watermark-late row produced output")
    } finally q.stop()
  }

  test("sessionizeWithTimeout: adjacent orphans gap-fold into one session, not per-event fragments") {
    import spark.implicits._
    val in = MemoryStream[Ev](14, spark, None)
    val q = StreamingOps.sessionizeWithTimeout(in.toDS(), gapMinutes = 30, watermark = "3 hours")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_orphan_fold").start()
    try {
      in.addData(ev(1, "12:00", uid = 4))
      q.processAllAvailable()
      // two out-of-order old events within gap of EACH OTHER (10:00,
      // 10:05), both past the open session's merge window (< 11:30) but
      // not watermark-late: they must fold into ONE 2-event session —
      // the round-3 advice hole emitted two 1-event fragments here
      in.addData(ev(2, "10:00", uid = 4), ev(3, "10:05", uid = 4))
      q.processAllAvailable()
      val orphans = spark.table("sess_orphan_fold")
        .select("session_start", "session_end", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
      assert(orphans.toSeq === Seq((ts("10:00"), ts("10:05"), 2L)))
      // a gap INSIDE the orphan group still splits it: 09:30+09:35 fold,
      // 10:45 is >30m later (and still < 11:30) so it closes separately
      in.addData(ev(4, "09:30", uid = 4), ev(5, "09:35", uid = 4), ev(6, "10:45", uid = 4))
      q.processAllAvailable()
      val more = spark.table("sess_orphan_fold")
        .select("session_start", "session_end", "ev").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).sortBy(_._1.getTime)
      assert(more.toSeq === Seq(
        (ts("09:30"), ts("09:35"), 2L),
        (ts("10:00"), ts("10:05"), 2L),
        (ts("10:45"), ts("10:45"), 1L)))
      // the open session was never touched: close it via an in-batch gap
      in.addData(ev(7, "16:00", uid = 4))
      q.processAllAvailable()
      val open = spark.table("sess_orphan_fold")
        .where(col("session_start") === ts("12:00")).collect()
      assert(open.length === 1 && open.head.getAs[Long]("ev") === 1L)
    } finally q.stop()
  }

  test("streaming kNN scorer: each micro-batched query gets its exact top-k, statelessly") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // small deterministic corpus; exact top-2 computable by hand
    def unit(v: Array[Double]) = { val s = math.sqrt(v.map(x => x * x).sum); v.map(_ / s) }
    val rnd = new scala.util.Random(13)
    val corpusVecs = (0L until 20L).map(i => i -> unit(Array.fill(8)(rnd.nextGaussian())))
    val corpus = corpusVecs
      .map { case (id, v) => (id, (id % 4).toString, v.map(_.toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val in = MemoryStream[QVec](15, spark, None)
    val q = StreamingOps.knnScoreStream(in.toDF(), corpus, k = 2)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("knn_stream_out").start()
    try {
      val q1 = unit(Array.fill(8)(rnd.nextGaussian()))
      val q2 = unit(Array.fill(8)(rnd.nextGaussian()))
      in.addData(QVec(100L, ts("10:00"), q1.map(_.toFloat).toSeq))
      q.processAllAvailable()
      in.addData(QVec(200L, ts("10:05"), q2.map(_.toFloat).toSeq))
      q.processAllAvailable()
      def exactTop2(qv: Array[Double]): Seq[Long] =
        corpusVecs.map { case (id, v) => (v.zip(qv).map { case (a, b) => a * b }.sum, id) }
          .sortBy { case (s, id) => (-s, id) }.take(2).map(_._2)
      val got = spark.table("knn_stream_out")
        .select("qid", "vec_id", "sim").collect()
        .groupBy(_.getLong(0)).view.mapValues(
          _.sortBy(-_.getDouble(2)).map(_.getLong(1)).toSeq).toMap
      assert(got.keySet === Set(100L, 200L))
      assert(got(100L) === exactTop2(q1), "query 100 top-2 mismatch")
      assert(got(200L) === exactTop2(q2), "query 200 top-2 mismatch")
      // stateless: exactly k rows per query, nothing accretes
      assert(spark.table("knn_stream_out").count() === 4)
    } finally q.stop()
  }

  test("streaming embed-LSH probe flags stored near-dups once per pair; tombstoned ids re-admit") {
    import spark.implicits._
    import graft.operators.VectorOps
    // small labeled unit-vector corpus, indexed once
    def unit(v: Array[Double]) = { val s = math.sqrt(v.map(x => x * x).sum); v.map(_ / s) }
    val rnd = new scala.util.Random(31)
    val corpusVecs = (0L until 20L).map(i =>
      (i, (i % 4).toString, unit(Array.fill(8)(rnd.nextGaussian())).map(_.toFloat)))
    val corpus = corpusVecs.toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("elsh_stream").toString
    VectorOps.writeEmbedLshIndex(spark, corpus, dir)
    val in = MemoryStream[LVec](16, spark, None)
    val q = StreamingOps.embedDedupProbeStream(in.toDF(), dir)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("elsh_probe_out").start()
    try {
      val (_, lbl7, emb7) = corpusVecs(7)
      in.addData(
        // exact copy of corpus vec 7 — agrees in ALL bands, so the
        // band-priority pick is what bounds emission to one row
        LVec(107L, ts("10:00"), lbl7, emb7.toSeq),
        // genuinely novel vector in the same label block
        LVec(108L, ts("10:01"), lbl7,
          unit(Array.fill(8)(rnd.nextGaussian())).map(_.toFloat).toSeq))
      q.processAllAvailable()
      val pairs = spark.table("elsh_probe_out")
        .select("batch_id", "corpus_id", "sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.length === 1 && (pairs.head._1, pairs.head._2) === ((107L, 7L)),
        s"expected exactly ONE row for the planted (107, 7) match, got ${pairs.toSeq}")
      assert(pairs.head._3 >= 0.999999)
    } finally q.stop()
    // takedown: tombstone vec 7, restart the gate — its copy passes clean
    VectorOps.deleteFromEmbedLshIndex(spark, Seq(7L).toDF("vec_id"), dir)
    val in2 = MemoryStream[LVec](17, spark, None)
    val q2 = StreamingOps.embedDedupProbeStream(in2.toDF(), dir)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("elsh_probe_out2").start()
    try {
      in2.addData(LVec(109L, ts("10:05"), corpusVecs(7)._2, corpusVecs(7)._3.toSeq))
      q2.processAllAvailable()
      assert(spark.table("elsh_probe_out2").count() === 0,
        "a copy of a DELETED corpus vector was still flagged")
    } finally q2.stop()
  }

  test("streaming embeddings -> foreachBatch ingest: dups drop across micro-batches") {
    // the continuous-ingest composition for the vector loop: each
    // micro-batch runs ingestEmbedBatch, so index appends are visible to
    // the NEXT micro-batch with no gate restarts — mirrors the image
    // loop's foreachBatch proof
    import spark.implicits._
    import graft.sources.AssetIngest
    val base = java.nio.file.Files.createTempDirectory("stream_ingest_e").toString
    def unit(seed: Long): Seq[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(10)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n).toFloat).toSeq
    }
    val mem = MemoryStream[LVec](18, spark, None)
    val reports = scala.collection.mutable.ArrayBuffer.empty[AssetIngest.IngestReport]
    val q = mem.toDF().select("vec_id", "label", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        reports += AssetIngest.ingestEmbedBatch(spark, batch, s"$base/idx", s"$base/data")
        ()
      }
      .start()
    try {
      mem.addData(LVec(1L, ts("10:00"), "a", unit(1)), LVec(2L, ts("10:00"), "a", unit(2)))
      q.processAllAvailable()
      // second micro-batch: one cross-micro-batch dup, one novel
      mem.addData(LVec(3L, ts("10:01"), "a", unit(1)), LVec(4L, ts("10:01"), "a", unit(3)))
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.map(_.admitted).toSeq === Seq(2, 1))
    assert(reports.map(_.corpusDups).toSeq === Seq(0, 1),
      s"cross-micro-batch dup not caught by the young index: $reports")
    assert(spark.read.parquet(s"$base/data/vectors").select("vec_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
  }

  test("stream-stream attribution join matches purchases to in-horizon clicks only") {
    import spark.implicits._
    val in = MemoryStream[Ev](16, spark, None)
    val df = in.toDF()
    // genuine stream-stream self-join: both sides are the SAME unbounded
    // source, filtered — Spark buffers each side's state independently
    val out = StreamingOps.attributeStream(
      df.where($"event_type" === "click"),
      df.where($"event_type" === "purchase"),
      watermark = "10 minutes", horizon = "1 hour")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib_out").start()
    try {
      in.addData(
        ev(1, "10:00", uid = 1, typ = "click"),
        ev(2, "10:30", uid = 1, typ = "purchase"), // in horizon -> match
        ev(3, "12:00", uid = 1, typ = "purchase"), // 2h after the click -> no match
        ev(4, "10:10", uid = 2, typ = "purchase")) // no click for this user
      q.processAllAvailable()
      // purchase arriving in a LATER batch still matches the buffered click
      in.addData(ev(5, "10:50", uid = 1, typ = "purchase"))
      q.processAllAvailable()
      val got = spark.table("attrib_out")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L), (1L, 5L)),
        s"attribution pairs wrong: $got")
    } finally q.stop()
  }

  test("outer attribution join null-pads unmatched clicks only after the watermark closes them") {
    import spark.implicits._
    val in = MemoryStream[Ev](17, spark, None)
    val df = in.toDF()
    val out = StreamingOps.attributeStreamOuter(
      df.where($"event_type" === "click"),
      df.where($"event_type" === "purchase"),
      watermark = "10 minutes", horizon = "1 hour")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib_outer_out").start()
    try {
      in.addData(
        ev(1, "10:00", uid = 1, typ = "click"),    // will match
        ev(2, "10:30", uid = 1, typ = "purchase"),
        ev(3, "10:05", uid = 2, typ = "click"))    // never matches
      q.processAllAvailable()
      val early = spark.table("attrib_outer_out")
        .where(col("click_id") === 3).count()
      assert(early === 0,
        "unmatched click null-padded before the watermark could rule out a late match")
      // advance event time past 10:05 + 1h horizon + 10m watermark ->
      // click 3 is provably unmatchable and must emit null-padded
      in.addData(ev(9, "11:30", uid = 9, typ = "click"))
      q.processAllAvailable()
      in.addData(ev(10, "11:45", uid = 9, typ = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer_out")
        .select("click_id", "purchase_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows.contains((1L, 2L)), s"matched pair missing: $rows")
      assert(rows.contains((3L, -1L)), s"closed unmatched click not null-padded: $rows")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user aggregates across batches") {
    import spark.implicits._
    val in = MemoryStream[Ev](5, spark, None)
    val q = StreamingOps.runningUserAggs(in.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_out").start()
    try {
      in.addData(ev(1, "10:00", uid = 7, v = 1.5), ev(2, "10:01", uid = 7, v = 2.5))
      q.processAllAvailable()
      in.addData(ev(3, "10:02", uid = 7, v = 6.0))
      q.processAllAvailable()
      val last = spark.table("state_out").where(col("user_id") === 7)
        .orderBy(col("n").desc).select("n", "total").head()
      assert(last.getLong(0) === 3L)
      assert(last.getDouble(1) === 10.0)
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks within the hour") {
    import spark.implicits._
    val in = MemoryStream[Ev](8, spark, None)
    val q = StreamingOps.clickToPurchase(in.toDF(), withinHours = 1, watermark = "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj_out").start()
    try {
      in.addData(
        ev(1, "10:00", uid = 1, typ = "click"),
        ev(2, "10:30", uid = 1, typ = "purchase", v = 9.99),
        ev(3, "12:00", uid = 1, typ = "purchase", v = 5.0), // >1h after the click
        ev(4, "10:15", uid = 2, typ = "click"))             // no purchase
      q.processAllAvailable()
      in.addData(ev(5, "15:00", uid = 9)) // advance watermark to flush
      q.processAllAvailable()
      val pairs = spark.table("ssj_out")
        .select("user_id", "click_ts", "purchase_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      assert(pairs.toSeq === Seq((1L, ts("10:00"), ts("10:30"))))
    } finally q.stop()
  }

  test("stream-static join enriches the stream without shuffling it") {
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Ev](9, spark, None)
    val q = StreamingOps.enrichWithDim(in.toDF(), dim, "user_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("enrich_out").start()
    try {
      in.addData(ev(1, "10:00", uid = 1), ev(2, "10:01", uid = 3))
      q.processAllAvailable()
      val rows = spark.table("enrich_out").select("user_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
      // matched row enriched; unmatched stream row survives (left outer)
      assert(rows.toSeq === Seq((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("exactly-once sink: a replayed micro-batch does not double-append") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/data"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    StreamingOps.idempotentBatchAppend(b0, 0, dir)
    StreamingOps.idempotentBatchAppend(Seq((3L, "c")).toDF("id", "v"), 1, dir)
    // failure replay: batch 0 runs again (same data) — must overwrite, not append
    StreamingOps.idempotentBatchAppend(b0, 0, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    assert(back.where(col("batch_id") === 0).count() === 2)
  }

  test("exactly-once sink end-to-end: streaming writes land once per batch") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sink_e2e").toString
    val in = MemoryStream[Ev](10, spark, None)
    val q = StreamingOps.exactlyOnceParquetSink(
      in.toDF(), s"$base/data", s"$base/ckpt").start()
    try {
      in.addData(ev(1, "10:00"), ev(2, "10:05"))
      q.processAllAvailable()
      in.addData(ev(3, "10:10"))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$base/data")
      assert(back.count() === 3)
      assert(back.select("batch_id").distinct().count() >= 1)
    } finally q.stop()
  }

  test("batch/stream symmetry: tumblingCounts on batch events matches q_evt_tumbling totals") {
    val batch = StreamingOps.tumblingCounts(
      Tables.events(spark, "/root/testdata/sf0.001").select("ts", "event_type", "value"))
    val viaBuckets = SparkEntry.queries("q_evt_tumbling")(spark, "/root/testdata/sf0.001")
    // same total event count partitioned two ways (1h windows vs 6h buckets)
    assert(batch.agg(sum("n")).head().getLong(0) === viaBuckets.agg(sum("n")).head().getLong(0))
  }

  test("stream RESTART recovery: a replayed uncommitted ingest batch admits nothing, re-lands nothing, and leaves the ledger unmoved") {
    // The r15 exactly-once claim covered the sketch LEDGER under an
    // in-process batch-id replay; this drives the whole crash shape: a
    // real file source + real checkpointLocation, the query KILLED
    // after foreachBatch fully ran (landing + index append + ledger)
    // but BEFORE the engine committed the batch — simulated by deleting
    // the newest commit marker, exactly the on-disk state a crash in
    // that window leaves. The restarted query replays the batch under
    // the same id; the law is that the ingest loop's self-healing retry
    // admits nothing (every doc now matches its own stored copy), lands
    // nothing twice, appends nothing to the index, and the ledger is
    // byte-unmoved — then NEW data after the restart flows normally.
    import spark.implicits._
    import graft.sources.{AssetIngest, SketchLedger}
    graft.functions.GraftFunctions.register(spark)
    val base = java.nio.file.Files.createTempDirectory("restart_law").toString
    val (src, ckpt, idx, data, led) =
      (s"$base/src", s"$base/ckpt", s"$base/idx", s"$base/data", s"$base/led")
    // the composed-text-loop fixture: 60 disjoint tokens pass the
    // quality gate; cut(i, 55) is a >= 0.5-Jaccard near-dup of mk(i)
    val mk = (i: Int) => (1 to 60).map(t => s"w${i}_$t").mkString(" ")
    def cut(i: Int, keep: Int) = (1 to keep).map(t => s"w${i}_$t").mkString(" ")
    def writeBatch(rows: (Long, String, String)*): Unit =
      rows.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("append").parquet(src)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("source", "string").add("text", "string")
    val reports =
      scala.collection.mutable.ArrayBuffer.empty[(Long, AssetIngest.IngestReport)]
    def start() = spark.readStream.schema(schema).parquet(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        reports += id -> AssetIngest.ingestTextBatch(spark, b, idx, data,
          sketches = Some(AssetIngest.SketchSink(led, s"b$id")))
        ()
      }.start()

    writeBatch((1L, "a", mk(1)), (2L, "a", mk(2)))
    val q1 = start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    assert(reports.map { case (id, r) => (id, r.admitted) }.toSeq === Seq((0L, 2L)))
    def ledgerState() = SketchLedger.distinctByKey(spark, s"$led/distinct")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ledAfterB0 = ledgerState()
    assert(ledAfterB0("a") === ((2L, 2L)), s"batch 0 accounting: $ledAfterB0")

    // the crash: drop the newest commit marker (offsets log intact) —
    // including its local-FS .crc sibling, or the replay's own commit
    // write trips over the stale checksum
    val commits = new java.io.File(s"$ckpt/commits")
    val newest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(newest.delete(), "fixture: could not delete the commit marker")
    new java.io.File(commits, s".${newest.getName}.crc").delete()

    val q2 = start()
    try {
      q2.processAllAvailable()
      val replay = reports.last
      assert(replay._1 === 0L, s"restart did not replay batch 0: $reports")
      assert(replay._2.admitted === 0L && replay._2.corpusDups === 2L,
        s"replayed batch must self-heal to zero admits: $reports")
      assert(ledgerState() === ledAfterB0, "the replay moved the ledger")
      // new data after the restart: one corpus near-dup, one novel doc
      writeBatch((3L, "a", cut(1, 55)), (4L, "a", mk(9)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(reports.last._1 === 1L && reports.last._2.admitted === 1L &&
      reports.last._2.corpusDups === 1L, s"post-restart batch: $reports")
    // landing has each admitted doc exactly once across the crash boundary
    assert(spark.read.parquet(s"$data/docs").select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
    val ledFinal = ledgerState()
    assert(ledFinal("a") === ((3L, 3L)), s"final accounting: $ledFinal")
  }

  test("imageIngestSink restart law: replayed batch lands nothing twice; the sink wires batch id into landing + ledgers") {
    // The text restart law above hand-rolls the foreachBatch wiring;
    // this drives the same crash shape through the r17 library face
    // (StreamingOps.imageIngestSink) on a SECOND modality — the sink
    // must thread the streaming batch id into BOTH the idempotent
    // landing partition and the sketch-ledger batch id, so a replay
    // under the same id moves nothing.
    import spark.implicits._
    import graft.sources.{AssetIngest, ImageCodec, SketchLedger}
    val base = java.nio.file.Files.createTempDirectory("restart_img").toString
    val (src, ckpt, idx, data, led) =
      (s"$base/src", s"$base/ckpt", s"$base/idx", s"$base/data", s"$base/led")
    def img(key: Long): Array[Byte] =
      ImageCodec.encodeGrayPng(16, 16, ImageCodec.texturedLuma(key, 16, 16))
    def writeBatch(rows: (Long, Array[Byte])*): Unit =
      rows.toDF("asset_id", "payload").coalesce(1)
        .write.mode("append").parquet(src)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("asset_id", "long").add("payload", "binary")
    val reports =
      scala.collection.mutable.ArrayBuffer.empty[(Long, AssetIngest.IngestReport)]
    def start() = StreamingOps.imageIngestSink(
      spark.readStream.schema(schema).parquet(src), idx, data, ckpt,
      ledgerDir = Some(led),
      onReport = (id, r) => { reports += id -> r; () }).start()

    writeBatch((1L, img(11L)), (2L, img(22L)))
    val q1 = start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    assert(reports.toSeq.map { case (id, r) => (id, r.admitted) } === Seq((0L, 2L)))
    // landing rode the streaming batch id, not a derived fingerprint
    assert(spark.read.parquet(s"$data/assets")
      .select(AssetIngest.LandCol).distinct().collect().map(_.getString(0)).toSeq
      === Seq("b0"))
    def ledgerState() = SketchLedger.distinctByKey(spark, s"$led/distinct")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ledAfterB0 = ledgerState()
    assert(ledAfterB0("image") === ((2L, 2L)), s"batch 0 accounting: $ledAfterB0")

    // crash between foreachBatch completion and the engine's commit
    val commits = new java.io.File(s"$ckpt/commits")
    val newest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(newest.delete(), "fixture: could not delete the commit marker")
    new java.io.File(commits, s".${newest.getName}.crc").delete()

    val q2 = start()
    try {
      q2.processAllAvailable()
      val replay = reports.last
      assert(replay._1 === 0L && replay._2.admitted === 0L &&
        replay._2.corpusDups === 2L,
        s"replayed batch must self-heal to zero admits: $reports")
      assert(ledgerState() === ledAfterB0, "the replay moved the ledger")
      writeBatch((3L, img(11L)), (4L, img(44L))) // one corpus dup, one novel
      q2.processAllAvailable()
    } finally q2.stop()
    assert(reports.last._1 === 1L && reports.last._2.admitted === 1L &&
      reports.last._2.corpusDups === 1L, s"post-restart batch: $reports")
    assert(spark.read.parquet(s"$data/assets").select("asset_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
    assert(ledgerState()("image") === ((3L, 3L)))
  }
}
