package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the r17 corpus-audit queries (q_mixture_plan,
  * q_zipf_fit, q_xsource_leakage, q_embed_centroids, q_join_bucketed).
  * The driver's DuckDB gate proves cross-engine value equality; these laws
  * prove the MATH is the intended math, on fixtures where the right answer
  * is known in closed form — a regression that changed both engines the
  * same way (e.g. a dropped sqrt) would pass the hash gate and fail here.
  */
class CorpusAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Scratch dir shaped like a testdata SF dir (only the tables a given
    * query reads need to exist). */
  private def fixtureDir(): String =
    Files.createTempDirectory("graft_audit_fixture").toString

  test("q_mixture_plan: shares and weights are distributions; epochs recompute") {
    val rows = SparkEntry.queries("q_mixture_plan")(spark, sf).collect()
    assert(rows.length > 1, "fixture defect: need multiple sources")
    val share = rows.map(_.getDouble(2)).sum
    val weight = rows.map(_.getDouble(3)).sum
    // each of ~20 addends is rounded to 1e-6
    assert(math.abs(share - 1.0) < 2e-5, s"shares sum to $share, not 1")
    assert(math.abs(weight - 1.0) < 2e-5, s"weights sum to $weight, not 1")
    rows.foreach { r =>
      val (toks, w, ep) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      val expected = w * 1000000L / toks
      assert(math.abs(ep - expected) <= expected * 0.01 + 1e-4,
        s"source ${r.getString(0)}: epochs $ep vs recomputed $expected")
      assert(ep > 0, s"source ${r.getString(0)}: non-positive epochs")
    }
    // sqrt temperature UPWEIGHTS small sources: weight/share must be
    // monotone-decreasing in token count (the whole point of t=2 mixing)
    val boost = rows.map(r => r.getLong(1) -> r.getDouble(3) / r.getDouble(2))
      .sortBy(_._1)
    assert(boost.head._2 >= boost.last._2,
      s"smallest source boosted ${boost.head._2}x < largest ${boost.last._2}x")
  }

  test("q_zipf_fit: an exact power-law source fits slope -1 with r2 ~ 1") {
    val dir = fixtureDir()
    import spark.implicits._
    // token i appears round(1000/i) times, i = 1..50: ln n = ln 1000 - ln r
    val text = (1 to 50).flatMap(i =>
      Seq.fill(math.round(1000.0 / i).toInt)(f"t$i%02d")).mkString(" ")
    Seq((1L, "powerlaw", text)).toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_zipf_fit")(spark, dir).collect()
    assert(r.length == 1)
    val (slope, r2, k) = (r(0).getDouble(1), r(0).getDouble(2), r(0).getLong(3))
    assert(k == 50, s"expected 50 ranks, got $k")
    assert(math.abs(slope + 1.0) < 0.05, s"power-law slope $slope not ~ -1")
    assert(r2 > 0.995, s"power-law r2 $r2 not ~ 1")
  }

  test("q_xsource_leakage: mirrored sources leak fully, unique source leaks zero") {
    val dir = fixtureDir()
    import spark.implicits._
    val mirrored = (1 to 30).map(i => s"m$i").mkString(" ")
    val unique = (1 to 30).map(i => s"u$i").mkString(" ")
    Seq((1L, "site_a", mirrored), (2L, "site_b", mirrored),
        (3L, "site_c", unique))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_xsource_leakage")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // 30 tokens → 23 8-grams per doc
    assert(got("site_a") == ((23L, 23L, 1.0)), s"site_a: ${got("site_a")}")
    assert(got("site_b") == ((23L, 23L, 1.0)), s"site_b: ${got("site_b")}")
    assert(got("site_c") == ((23L, 0L, 0.0)), s"site_c: ${got("site_c")}")
  }

  test("q_embed_centroids: closed-form norms for identical/opposed/orthogonal labels") {
    val dir = fixtureDir()
    import spark.implicits._
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val neg = Array(-1f, 0f, 0f, 0f)
    Seq(
      (1L, e1, 1), (2L, e1, 1), (3L, e1, 1), (4L, e1, 1), // tight cluster
      (5L, e1, 2), (6L, neg, 2),                          // cancels exactly
      (7L, e1, 3), (8L, e2, 3),                           // orthogonal pair
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_embed_centroids")(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got(1) == ((1.0, 4L)), s"identical vectors: ${got(1)}")
    assert(got(2) == ((0.0, 2L)), s"opposed vectors: ${got(2)}")
    assert(got(3) == ((0.7071, 2L)), s"orthogonal pair: ${got(3)}")
  }

  test("snapshotDiff: exact per-id classification on a four-way fixture") {
    import spark.implicits._
    import graft.operators.CurationOps
    val v1 = Seq((1L, "s", "h_a"), (2L, "s", "h_b"), (3L, "s", "h_c"))
      .toDF("doc_id", "source", "h")
    val v2 = Seq((2L, "s", "h_b"), (3L, "s", "h_c2"), (4L, "s", "h_d"))
      .toDF("doc_id", "source", "h")
    val got = CurationOps.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), s"got $got")
  }

  test("q_corpus_diff: class totals recompute from the derivation arithmetic") {
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val diff = SparkEntry.queries("q_corpus_diff")(spark, sf).collect()
    def total(i: Int) = diff.map(_.getLong(i)).sum
    assert(total(1) == ids.count(_ % 13 == 1), "added != % 13 == 1 docs")
    assert(total(2) == ids.count(_ % 7 == 0), "removed != % 7 == 0 docs")
    assert(total(3) == ids.count(i => i % 7 != 0 && i % 11 == 3),
      "changed != surviving % 11 == 3 docs")
    assert(total(1) + total(2) + total(3) + total(4) ==
      ids.length + ids.count(_ % 13 == 1), "classes don't partition the id union")
  }

  test("dupRateBySource: closed-form rate on a planted fixture") {
    import spark.implicits._
    import graft.operators.CurationOps
    val docs = Seq(
      (1L, "x", "same text"), (2L, "x", "same text"), (3L, "x", "other"),
      (4L, "y", "unique a"), (5L, "y", "unique b"),
    ).toDF("doc_id", "source", "text")
    val got = CurationOps.dupRateBySource(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("x") == ((3L, 2L, 0.333333)), s"x: ${got("x")}")
    assert(got("y") == ((2L, 2L, 0.0)), s"y: ${got("y")}")
  }

  test("q_corpus_report: equals the column-wise join of its component queries") {
    val report = SparkEntry.queries("q_corpus_report")(spark, sf).collect()
    val mix = SparkEntry.queries("q_mixture_plan")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val zipf = SparkEntry.queries("q_zipf_fit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val leak = SparkEntry.queries("q_xsource_leakage")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(report.length == mix.size, "report dropped or duplicated sources")
    report.foreach { r =>
      val s = r.getString(0)
      assert((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)) == mix(s),
        s"$s: mixture columns diverge from q_mixture_plan")
      assert((r.getDouble(6), r.getDouble(7)) == zipf(s),
        s"$s: zipf columns diverge from q_zipf_fit")
      assert(r.getDouble(8) == leak(s),
        s"$s: leak_ratio diverges from q_xsource_leakage")
      assert(r.getDouble(9) == 0.0,
        s"$s: raw corpus has no exact dups, dup_rate must be 0")
    }
  }

  test("sum ledger: exact totals, retry-proof, mixed-metric refusal, reconcile") {
    import spark.implicits._
    import graft.sources.SketchLedger
    val dir = fixtureDir() + "/sumled"
    val a = Seq(("x", 10.0), ("x", 5.0), ("y", 2.0)).toDF("source", "m")
    val b = Seq(("x", 1.0), ("y", 7.0)).toDF("source", "m")
    SketchLedger.appendSum(spark, a, Seq("source"), "m", dir, "b_a")
    SketchLedger.appendSum(spark, b, Seq("source"), "m", dir, "b_b")
    SketchLedger.appendSum(spark, a, Seq("source"), "m", dir, "b_a") // retry
    val got = SketchLedger.sumByKey(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == Map("x" -> ((16.0, 3L)), "y" -> ((9.0, 2L))),
      s"retry inflated or lost a sum: $got")
    intercept[IllegalArgumentException] {
      SketchLedger.appendSum(spark, a.withColumnRenamed("m", "other"),
        Seq("source"), "other", dir, "b_c")
    }
    // reconcile re-derives exactly the batches the ledger is missing
    val landed = a.withColumn("ingest_batch", lit("b_a"))
      .unionByName(b.withColumn("ingest_batch", lit("b_b")))
      .unionByName(Seq(("z", 4.0)).toDF("source", "m")
        .withColumn("ingest_batch", lit("b_z")))
    val fixed = SketchLedger.reconcileSum(spark, landed, Seq("source"), "m", dir)
    assert(fixed == Seq("b_z"), s"reconcile repaired $fixed, expected b_z only")
    val after = SketchLedger.sumByKey(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after == Map("x" -> 16.0, "y" -> 9.0, "z" -> 4.0), s"$after")
  }

  test("mixturePlanFromLedger equals the corpus-scan plan bit-for-bit") {
    import graft.operators.CurationOps
    import graft.sources.SketchLedger
    val dir = fixtureDir() + "/mixled"
    // land the documents table's per-doc token counts in two batches
    // split by doc_id parity — the text ingest loop's recordSketches
    // shape (keys = source, metric = n_tok)
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("double").as("n_tok"))
    SketchLedger.appendSum(spark, base.where(col("doc_id") % 2 === 0),
      Seq("source"), "n_tok", dir, "even")
    SketchLedger.appendSum(spark, base.where(col("doc_id") % 2 === 1),
      Seq("source"), "n_tok", dir, "odd")
    val fromLedger = CurationOps.mixturePlanFromLedger(spark, dir).collect()
      .map(_.toString)
    val fromScan = SparkEntry.queries("q_mixture_plan")(spark, sf).collect()
      .map(_.toString)
    assert(fromLedger.sameElements(fromScan),
      s"ledger plan diverged from scan plan:\n  ledger=${fromLedger.take(3).toSeq}\n  scan=${fromScan.take(3).toSeq}")
  }

  test("ledgerHealthReport: exact mixture tier, bounded estimate tiers") {
    import graft.operators.CurationOps
    import graft.sources.SketchLedger
    val dir = fixtureDir() + "/ledrep"
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("double").as("n_tok"))
    // the recordSketches layout: three ledgers under one sink root,
    // landed in two batches split by doc_id parity
    for ((pred, id) <- Seq((col("doc_id") % 2 === 0, "even"),
        (col("doc_id") % 2 === 1, "odd"))) {
      val b = base.where(pred)
      SketchLedger.append(spark, b, Seq("source"), "doc_id", s"$dir/distinct", id)
      SketchLedger.appendQuantile(spark, b, Seq("source"), "n_tok", s"$dir/size", id)
      SketchLedger.appendSum(spark, b, Seq("source"), "n_tok", s"$dir/sum", id)
    }
    val rep = CurationOps.ledgerHealthReport(spark, dir).collect()
    assert(rep.nonEmpty)
    // exact tier: docs/toks bit-equal the scan derivation, and the
    // mixture columns bit-equal mixturePlanOf over the scan totals
    val scan = base.groupBy("source")
      .agg(sum("n_tok").cast("bigint").as("toks"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mixScan = CurationOps.mixturePlanOf(
        base.groupBy("source").agg(sum("n_tok").cast("bigint").as("toks")))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // exact length quantile brackets for the estimate tier
    val exactQ = base.groupBy("source")
      .agg(expr("percentile(n_tok, array(0.40, 0.60, 0.95))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rep.foreach { r =>
      val src = r.getString(0)
      val (toks, docs) = scan(src)
      assert(r.getLong(1) === docs, s"$src docs")
      assert(r.getLong(2) === toks, s"$src toks")
      assert(Seq(r.get(2), r.get(3), r.get(4), r.get(5)) === mixScan(src),
        s"$src mixture columns diverged from the scan plan")
      val q = exactQ(src)
      assert(r.getDouble(6) >= q(0) && r.getDouble(6) <= q(1),
        s"$src len_p50 ${r.getDouble(6)} outside exact [p40, p60] ${q.take(2)}")
      assert(r.getDouble(7) >= q(2),
        s"$src len_p99 ${r.getDouble(7)} below exact p95 ${q(2)}")
      val est = r.getLong(8).toDouble
      assert(math.abs(est - docs) / docs < 0.05,
        s"$src distinct_ids_est $est vs docs $docs drifted past 5%")
      // a pre-digest sink reports honest absence, not a fake zero
      assert(r.isNullAt(9),
        s"$src dup_rate_est must be null when the sink has no digest ledger")
    }
  }

  test("ledger dup-rate estimate brackets the exact scan rate (HLL contract)") {
    import graft.operators.CurationOps
    import graft.sources.SketchLedger
    val dir = fixtureDir() + "/duprate"
    // the q_dup_rate_by_source planting, verbatim: low-residue sources
    // carry exact-dup rates up to ~0.46, sources >= src7 none
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val planted = docs.unionByName(
      docs.where(col("doc_id") % 7 > col("doc_id") % 20))
    val base = planted.withColumn("content_digest", xxhash64(col("text")))
    (0 until 3).foreach { r =>
      SketchLedger.append(spark, base.where(col("doc_id") % 3 === r),
        Seq("source"), "content_digest", s"$dir/digest", s"b$r")
    }
    val est = CurationOps.dupRateFromLedger(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    val exact = CurationOps.dupRateBySource(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(est.keySet === exact.keySet)
    var planted_srcs = 0
    exact.foreach { case (src, (eDocs, eRate)) =>
      val (lDocs, lRate) = est(src)
      assert(lDocs === eDocs, s"$src exact docs column diverged")
      assert(math.abs(lRate - eRate) <= 0.05,
        s"$src dup_rate_est $lRate vs exact $eRate beyond the HLL bracket")
      assert(lRate >= 0.0, s"$src estimate must be clamped at 0")
      if (eRate > 0.1) planted_srcs += 1
    }
    assert(planted_srcs > 0, "fixture lost its planted duplicates")
    // the health report surfaces the same estimate once the sink has a
    // digest tier (sum/size/distinct landed too, per recordSketches)
    val rep = fixtureDir() + "/dupratefull"
    val full = base.withColumn("size_metric",
      size(split(col("text"), " ")).cast("double"))
    (0 until 2).foreach { r =>
      val b = full.where(col("doc_id") % 2 === r)
      SketchLedger.append(spark, b, Seq("source"), "doc_id", s"$rep/distinct", s"b$r")
      SketchLedger.appendQuantile(spark, b, Seq("source"), "size_metric", s"$rep/size", s"b$r")
      SketchLedger.appendSum(spark, b, Seq("source"), "size_metric", s"$rep/sum", s"b$r")
      SketchLedger.append(spark, b, Seq("source"), "content_digest", s"$rep/digest", s"b$r")
    }
    CurationOps.ledgerHealthReport(spark, rep).collect().foreach { r =>
      val src = r.getString(0)
      assert(!r.isNullAt(9), s"$src dup_rate_est missing despite a digest ledger")
      assert(math.abs(r.getDouble(9) - exact(src)._2) <= 0.05,
        s"$src report dup_rate_est diverged from the exact rate")
    }
  }

  test("q_quality_gopher: flags recompute from the row's own metrics and discriminate") {
    val rows = SparkEntry.queries("q_quality_gopher")(spark, sf).collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val keep = r.getLong(1) >= 30 && r.getLong(1) <= 90 &&
        r.getDouble(2) >= 4.3 && r.getDouble(2) <= 4.7 &&
        r.getLong(3) >= 2 && r.getDouble(4) <= 0.08
      assert(r.getBoolean(5) === keep, s"doc ${r.getLong(0)}: keep flag diverged")
      if (keep) kept += 1
    }
    assert(kept > 0 && kept < rows.length,
      s"the gate must discriminate, not rubber-stamp (kept $kept/${rows.length})")
  }

  test("q_incremental_agg: the merged state equals the full recompute") {
    val merged = SparkEntry.queries("q_incremental_agg")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val full = Tables.lineitem(spark, sf)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("bigint")).as("t"))
      .orderBy("l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(merged.sameElements(full),
      "state-merge path diverged from the full recompute")
  }

  test("q_bigram_logprob: negative log-means over exactly n_tok - 1 pairs per doc") {
    val rows = SparkEntry.queries("q_bigram_logprob")(spark, sf).collect()
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === nTok(r.getLong(0)) - 1,
        s"doc ${r.getLong(0)}: bigram count != token count - 1")
      assert(r.getDouble(2) < 0.0)
    }
    assert(rows.length === nTok.count(_._2 >= 2))
  }

  test("q_join_bucketed: layout independence — bucketed result equals the plain shuffled join") {
    val bucketed = SparkEntry.queries("q_join_bucketed")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val plain = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(expr("l_extendedprice * (1 - l_discount)")), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(bucketed.sameElements(plain),
      s"bucketed join diverged from the plain join:\n  bucketed=${bucketed.toSeq}\n  plain=${plain.toSeq}")
  }
}
