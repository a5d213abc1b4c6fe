package graft

import graft.sources.SketchLedger
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the HLL sketch ledger (sources/SketchLedger.scala): the
  * incremental distinct-count accounting must agree with a one-shot
  * exact count within the sketch's error contract, be order-free, and
  * degrade gracefully when a batch is re-appended (retry safety — the
  * property the composed ingest loops rely on for every other table).
  */
class SketchLedgerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def tokens = Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("tok"))

  private def tmp() = java.nio.file.Files.createTempDirectory("sketch_ledger").toString

  test("incremental appends agree with the exact one-shot count within HLL error") {
    val dir = tmp()
    val t = tokens
    // three disjoint ingest batches by doc_id residue
    (0 until 3).foreach { r =>
      SketchLedger.append(spark, t.where(col("doc_id") % 3 === r),
        Seq("source"), "tok", dir, batchId = s"b$r")
    }
    val exact = t.groupBy("source").agg(countDistinct("tok").as("d"), count("tok").as("n"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val est = SketchLedger.distinctByKey(spark, dir)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, (d, n)) =>
      val (ed, en) = exact(k)
      assert(n === en, s"rows column must be EXACT: $k got $n want $en")
      assert(math.abs(d - ed).toDouble / ed <= 0.05,
        s"$k distinct estimate $d vs exact $ed beyond 5% (HLL contract ~1.6% at lgk=12)")
    }
    val totalExact = t.agg(countDistinct("tok")).head().getLong(0)
    val total = SketchLedger.distinctTotal(spark, dir)
    assert(math.abs(total - totalExact).toDouble / totalExact <= 0.05,
      s"global estimate $total vs exact $totalExact")
  }

  test("append order does not change the estimates (sketch union is commutative)") {
    val t = tokens
    val dirs = Seq(Seq(0, 1, 2), Seq(2, 0, 1)).map { order =>
      val dir = tmp()
      order.foreach { r =>
        SketchLedger.append(spark, t.where(col("doc_id") % 3 === r),
          Seq("source"), "tok", dir, batchId = s"b$r")
      }
      dir
    }
    val a = SketchLedger.distinctByKey(spark, dirs(0)).collect().toSeq
    val b = SketchLedger.distinctByKey(spark, dirs(1)).collect().toSeq
    assert(a === b, "estimates differ across append orders")
  }

  test("a re-appended (retried) batch moves NEITHER the estimate nor the exact rows") {
    val dir = tmp()
    val t = tokens
    SketchLedger.append(spark, t, Seq("source"), "tok", dir, batchId = "b0")
    val once = SketchLedger.distinctByKey(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the retry contract: same batch id -> fully absorbed on read
    SketchLedger.append(spark, t, Seq("source"), "tok", dir, batchId = "b0")
    val retried = SketchLedger.distinctByKey(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(once === retried,
      "a same-batch-id retry must be absorbed: (keys, batch_id) dedup on the read " +
        "path keeps both distinct_est AND the exact rows column unchanged")
    // a duplicate under a DIFFERENT id is caller mislabeling: the HLL
    // estimate still cannot inflate (register OR is idempotent) but the
    // exact rows bookkeeping honestly double-counts what it was told
    // were two distinct batches
    SketchLedger.append(spark, t, Seq("source"), "tok", dir, batchId = "b1")
    val relabeled = SketchLedger.distinctByKey(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(once.map(x => (x._1, x._2)) === relabeled.map(x => (x._1, x._2)),
      "duplicate data under a new batch id changed the estimate")
    assert(once.map(x => (x._1, 2 * x._3)) === relabeled.map(x => (x._1, x._3)),
      "rows must sum per declared batch")
  }

  test("interrupted first append (meta-only husk): param check binds on retry, reads refuse cleanly") {
    import spark.implicits._
    val dir = tmp()
    // simulate the only partial state meta-first ordering can leave: the
    // meta stamp landed, no sketch row did
    Seq((12, Seq("source"), "tok")).toDF("lgk", "keys", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // the stamped parameters bind immediately - a drifted retry is refused
    val e = intercept[IllegalArgumentException] {
      SketchLedger.append(spark, tokens, Seq("source"), "tok", dir,
        batchId = "b0", lgConfigK = 14)
    }
    assert(e.getMessage.contains("lgk"), s"unhelpful message: ${e.getMessage}")
    // reads on the husk refuse with a message naming the condition
    val e2 = intercept[RuntimeException] { SketchLedger.distinctByKey(spark, dir) }
    assert(e2.getMessage.contains("interrupted"), s"unhelpful message: ${e2.getMessage}")
    // a matching retry completes the append and the ledger behaves normally
    SketchLedger.append(spark, tokens, Seq("source"), "tok", dir, batchId = "b0")
    assert(SketchLedger.distinctTotal(spark, dir) > 0)
  }

  test("parameter drift across appends is refused loudly") {
    val dir = tmp()
    SketchLedger.append(spark, tokens, Seq("source"), "tok", dir, batchId = "b0")
    val e = intercept[IllegalArgumentException] {
      SketchLedger.append(spark, tokens, Seq("source"), "tok", dir,
        batchId = "b1", lgConfigK = 14)
    }
    assert(e.getMessage.contains("lgk"), s"unhelpful message: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      SketchLedger.append(spark, tokens, Seq("lang"), "tok", dir, batchId = "b2")
    }
    assert(e2.getMessage.contains("keys"), s"unhelpful message: ${e2.getMessage}")
  }

  // ------------------------------------------------------------------
  // Quantile (KLL) ledger laws. KLL compaction is RANDOMIZED, so every
  // law asserts a bound in RANK space (the space the sketch's contract
  // actually bounds: ~1.65% normalized rank error at k=200; 5% slack
  // here for compaction randomness + small-batch merges), never a hash.
  // ------------------------------------------------------------------

  private def docLens = Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"), length(col("text")).cast("double").as("len"))

  /** Exact normalized rank of `v` within a key's values — how the
    * rank-error laws score an estimated quantile against ground truth. */
  private def exactRank(rows: Seq[Double], v: Double): Double =
    rows.count(_ <= v).toDouble / rows.size

  test("quantile ledger: incremental appends hit exact quantiles within rank-error bound") {
    val dir = tmp()
    val d = docLens
    (0 until 3).foreach { r =>
      SketchLedger.appendQuantile(spark, d.where(col("doc_id") % 3 === r),
        Seq("source"), "len", dir, batchId = s"b$r")
    }
    val exact = d.collect().groupBy(_.getString(1))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2)).toSeq }
    val got = SketchLedger.quantileByKey(spark, dir, Seq(0.5, 0.99)).collect()
    assert(got.map(_.getString(0)).toSet === exact.keySet)
    got.foreach { r =>
      val (src, n, rank, est) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n === exact(src).size.toLong, s"$src rows must be EXACT")
      assert(math.abs(exactRank(exact(src), est) - rank) <= 0.05,
        s"$src p$rank estimate $est at exact rank ${exactRank(exact(src), est)} - " +
          "outside the KLL rank-error contract (merge must not cap k: shell adoption)")
    }
    val all = exact.values.flatten.toSeq
    val p50 = SketchLedger.quantileTotal(spark, dir, 0.5)
    assert(math.abs(exactRank(all, p50) - 0.5) <= 0.05,
      s"global p50 $p50 at exact rank ${exactRank(all, p50)}")
  }

  test("quantile ledger: a same-batch-id retry is absorbed (KLL weight doubling)") {
    val dir = tmp()
    val d = docLens
    SketchLedger.appendQuantile(spark, d, Seq("source"), "len", dir, batchId = "b0")
    val once = SketchLedger.quantileByKey(spark, dir, Seq(0.5)).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    SketchLedger.appendQuantile(spark, d, Seq("source"), "len", dir, batchId = "b0")
    val retried = SketchLedger.quantileByKey(spark, dir, Seq(0.5)).collect()
    assert(retried.map(r => (r.getString(0), r.getLong(1))).toSeq === once,
      "retried batch doubled the exact rows bookkeeping")
    // and the estimates still honor the bound (the dedup picked ONE of
    // the two retry sketches - either is a valid sketch of the batch;
    // without dedup the duplicate merge doubles every value's weight)
    val exact = d.collect().groupBy(_.getString(1))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2)).toSeq }
    retried.foreach { r =>
      assert(math.abs(exactRank(exact(r.getString(0)), r.getDouble(3)) - 0.5) <= 0.05)
    }
  }

  test("quantile ledger: parameter drift and sketch-kind mixing are refused loudly") {
    val dir = tmp()
    SketchLedger.appendQuantile(spark, docLens, Seq("source"), "len", dir, batchId = "b0")
    val e = intercept[IllegalArgumentException] {
      SketchLedger.appendQuantile(spark, docLens, Seq("source"), "len", dir,
        batchId = "b1", k = 400)
    }
    assert(e.getMessage.contains("k="), s"unhelpful message: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      SketchLedger.appendQuantile(spark, docLens, Seq("lang"), "len", dir, batchId = "b2")
    }
    assert(e2.getMessage.contains("keys"), s"unhelpful message: ${e2.getMessage}")
    // the two ledger kinds can never share a dir - refused in BOTH directions
    val e3 = intercept[IllegalArgumentException] {
      SketchLedger.append(spark, tokens, Seq("source"), "tok", dir, batchId = "b3")
    }
    assert(e3.getMessage.contains("lgk"), s"unhelpful message: ${e3.getMessage}")
    val hllDir = tmp()
    SketchLedger.append(spark, tokens, Seq("source"), "tok", hllDir, batchId = "b0")
    val e4 = intercept[IllegalArgumentException] {
      SketchLedger.appendQuantile(spark, docLens, Seq("source"), "len", hllDir,
        batchId = "b1")
    }
    assert(e4.getMessage.contains("quantile"), s"unhelpful message: ${e4.getMessage}")
  }

  test("quantile ledger: all-NULL values yield NULL per key and a loud global error") {
    import spark.implicits._
    val dir = tmp()
    val allNull = Seq(("s1", Option.empty[Double]), ("s2", Option.empty[Double]))
      .toDF("source", "len")
    SketchLedger.appendQuantile(spark, allNull, Seq("source"), "len", dir, batchId = "b0")
    val rows = SketchLedger.quantileByKey(spark, dir, Seq(0.5)).collect()
    assert(rows.length === 2 && rows.forall(_.isNullAt(3)),
      "empty sketches must surface as NULL value_est per key, not throw")
    val e = intercept[RuntimeException] { SketchLedger.quantileTotal(spark, dir, 0.5) }
    assert(e.getMessage.contains("empty sketches"), s"unhelpful message: ${e.getMessage}")
  }

  test("reconcile law: a batch crashed between index append and recordSketches is re-derived exactly") {
    import graft.sources.AssetIngest
    import graft.sources.AssetIngest.SketchSink
    import spark.implicits._
    // the text ingest loop at its smallest; batches carry < KLL-k values
    // so BOTH sketch kinds are exact and "estimates match the
    // never-crashed run" is an equality, not a bound
    def batch(ids: Seq[Long], src: String) = ids.map(i => (i, src,
      (1 to 60).map(t => s"k${i}_$t").mkString(" "))).toDF("doc_id", "source", "text")
    def ledgerRows(dir: String): Set[(String, Long, Long)] =
      SketchLedger.distinctByKey(spark, s"$dir/distinct").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def sizeRows(dir: String): Set[(String, Long, Double, Double)] =
      SketchLedger.quantileByKey(spark, s"$dir/size", Seq(0.5, 1.0)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    // ---- run A: never crashes ----
    val a = java.nio.file.Files.createTempDirectory("reconcile_a").toString
    AssetIngest.ingestTextBatch(spark, batch(Seq(1L, 2L), "s1"), s"$a/idx",
      s"$a/data", sketches = Some(SketchSink(s"$a/led", "b1")))
    AssetIngest.ingestTextBatch(spark, batch(Seq(3L, 4L), "s2"), s"$a/idx",
      s"$a/data", sketches = Some(SketchSink(s"$a/led", "b2")))
    // ---- run B: batch b2 dies between index append and recordSketches ----
    val b = java.nio.file.Files.createTempDirectory("reconcile_b").toString
    AssetIngest.ingestTextBatch(spark, batch(Seq(1L, 2L), "s1"), s"$b/idx",
      s"$b/data", sketches = Some(SketchSink(s"$b/led", "b1")))
    AssetIngest.failBeforeSketches = true
    intercept[IllegalStateException] {
      AssetIngest.ingestTextBatch(spark, batch(Seq(3L, 4L), "s2"), s"$b/idx",
        s"$b/data", sketches = Some(SketchSink(s"$b/led", "b2")))
    }
    // the production retry: admits nothing, ledgers nothing — the
    // undercount the verdict calls permanent is now visible...
    val rr = AssetIngest.ingestTextBatch(spark, batch(Seq(3L, 4L), "s2"),
      s"$b/idx", s"$b/data", sketches = Some(SketchSink(s"$b/led", "b2")))
    assert(rr.admitted === 0)
    assert(ledgerRows(s"$b/led") !== ledgerRows(s"$a/led"),
      "fixture defect: the crash did not undercount the ledger")
    // ...and recoverable: re-derive the missing batches from landed data
    val landed = spark.read.parquet(s"$b/data/docs")
    val (fixedD, fixedQ) = AssetIngest.reconcileSketches(spark, s"$b/led",
      landed, Seq("source"), "doc_id", col("n_tok"))
    assert(fixedD === Seq("b2") && fixedQ === Seq("b2"),
      s"reconcile must repair exactly the crashed batch, got ($fixedD, $fixedQ)")
    assert(ledgerRows(s"$b/led") === ledgerRows(s"$a/led"),
      "reconciled distinct ledger must match the never-crashed run")
    assert(sizeRows(s"$b/led") === sizeRows(s"$a/led"),
      "reconciled size ledger must match the never-crashed run")
    // idempotent: a second reconcile finds nothing missing
    val (again1, again2) = AssetIngest.reconcileSketches(spark, s"$b/led",
      landed, Seq("source"), "doc_id", col("n_tok"))
    assert(again1.isEmpty && again2.isEmpty, "reconcile must be idempotent")
  }

  // ------------------------------------------------------------------
  // Compaction laws (r17 — the v2 partitioned layout): folding batches
  // into a consolidated generation must not move any read, must shrink
  // the partition count, must respect the retry horizon, and must stay
  // read-correct in the crash window between the atomic publish and GC.
  // ------------------------------------------------------------------

  private def partitionDirs(dir: String): Seq[String] = {
    val p = new java.io.File(s"$dir/sketches")
    if (!p.exists) Nil
    else p.listFiles.filter(_.isDirectory).map(_.getName).toSeq.sorted
  }

  test("sum-ledger compaction: totals bit-equal, partitions shrink, horizon retained") {
    val dir = tmp()
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("double").as("n_tok"))
    (0 until 4).foreach { r =>
      SketchLedger.appendSum(spark, base.where(col("doc_id") % 4 === r),
        Seq("source"), "n_tok", dir, s"b$r")
    }
    val before = SketchLedger.sumByKey(spark, dir).collect().map(_.toString).toSeq
    assert(partitionDirs(dir).length === 4)
    // fold everything except the newest batch (the retry horizon)
    val folded = SketchLedger.compactSum(spark, dir, retain = _ == "b3")
    assert(folded === Seq("b0", "b1", "b2"))
    val dirsAfter = partitionDirs(dir)
    assert(dirsAfter === Seq("bpart=_c1", "bpart=bb3"),
      s"expected one consolidated + one retained partition, got $dirsAfter")
    val after = SketchLedger.sumByKey(spark, dir).collect().map(_.toString).toSeq
    assert(after === before, "compaction moved the exact totals")
    // second compaction folds the horizon remnant into generation 2
    assert(SketchLedger.compactSum(spark, dir) === Seq("b3"))
    assert(partitionDirs(dir) === Seq("bpart=_c2"))
    assert(SketchLedger.sumByKey(spark, dir).collect().map(_.toString).toSeq === before)
    // idempotent once everything is folded
    assert(SketchLedger.compactSum(spark, dir).isEmpty)
  }

  test("distinct-ledger compaction: estimates and exact rows unchanged") {
    val dir = tmp()
    val t = tokens
    (0 until 3).foreach { r =>
      SketchLedger.append(spark, t.where(col("doc_id") % 3 === r),
        Seq("source"), "tok", dir, s"b$r")
    }
    val before = SketchLedger.distinctByKey(spark, dir).collect().map(_.toString).toSeq
    val beforeTotal = SketchLedger.distinctTotal(spark, dir)
    assert(SketchLedger.compactDistinct(spark, dir).length === 3)
    assert(partitionDirs(dir) === Seq("bpart=_c1"))
    assert(SketchLedger.distinctByKey(spark, dir).collect().map(_.toString).toSeq === before,
      "HLL union is associative - the consolidated read must be identical")
    assert(SketchLedger.distinctTotal(spark, dir) === beforeTotal)
  }

  test("quantile-ledger compaction: rows exact, estimates within the rank-error bound") {
    val dir = tmp()
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("double").as("n_tok"))
    (0 until 3).foreach { r =>
      SketchLedger.appendQuantile(spark, base.where(col("doc_id") % 3 === r),
        Seq("source"), "n_tok", dir, s"b$r")
    }
    val exactP50 = base.groupBy("source")
      .agg(expr("percentile(n_tok, array(0.40, 0.60))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(SketchLedger.compactQuantile(spark, dir).length === 3)
    SketchLedger.quantileByKey(spark, dir, Seq(0.5)).collect().foreach { r =>
      val q = exactP50(r.getString(0))
      assert(r.getDouble(3) >= q(0) && r.getDouble(3) <= q(1),
        s"${r.getString(0)} compacted p50 ${r.getDouble(3)} outside exact [p40, p60] $q")
    }
  }

  test("compaction crash window: after publish, before GC - reads stay correct; heal finishes") {
    val dir = tmp()
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("double").as("n_tok"))
    (0 until 3).foreach { r =>
      SketchLedger.appendSum(spark, base.where(col("doc_id") % 3 === r),
        Seq("source"), "n_tok", dir, s"b$r")
    }
    val before = SketchLedger.sumByKey(spark, dir).collect().map(_.toString).toSeq
    SketchLedger.compactSum(spark, dir)
    // simulate the crash: resurrect a folded original ALONGSIDE the
    // consolidated partition (exactly the pre-GC overlap state, and also
    // what a contract-breaking late retry of a folded batch produces)
    SketchLedger.appendSum(spark, base.where(col("doc_id") % 3 === 0),
      Seq("source"), "n_tok", dir, "b0")
    assert(partitionDirs(dir).contains("bpart=bb0"))
    assert(SketchLedger.sumByKey(spark, dir).collect().map(_.toString).toSeq === before,
      "the manifest must exclude a folded batch even while its partition exists")
    // the next compaction GCs the overlap without changing reads
    assert(SketchLedger.compactSum(spark, dir).isEmpty)
    assert(partitionDirs(dir) === Seq("bpart=_c1"))
    assert(SketchLedger.sumByKey(spark, dir).collect().map(_.toString).toSeq === before)
  }

  test("reconcile treats folded batches as present (no re-derivation after compaction)") {
    val dir = tmp()
    val landed = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("double").as("n_tok"),
        (col("doc_id") % 3).cast("string").as("ingest_batch"))
    (0 until 3).foreach { r =>
      SketchLedger.appendSum(spark, landed.where(col("ingest_batch") === r.toString),
        Seq("source"), "n_tok", dir, r.toString)
    }
    SketchLedger.compactSum(spark, dir)
    assert(SketchLedger.reconcileSum(spark, landed, Seq("source"), "n_tok", dir).isEmpty,
      "a folded batch is accounted for - reconcile must not re-append it")
  }

  test("a batch id colliding with the consolidated-generation prefix is refused") {
    val dir = tmp()
    val t = tokens
    Seq(
      () => SketchLedger.append(spark, t, Seq("source"), "tok", dir, "_c1"),
      () => SketchLedger.appendQuantile(spark,
        t.withColumn("l", length(col("tok")).cast("double")),
        Seq("source"), "l", tmp(), "_c7"),
      () => SketchLedger.appendSum(spark,
        t.withColumn("l", length(col("tok")).cast("double")),
        Seq("source"), "l", tmp(), "_c0")
    ).foreach { f =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("reserved consolidated-generation prefix"))
    }
  }

  test("a v1 flat-layout ledger reads as-is and is migrated by the first v2 mutation") {
    val dir = tmp()
    val t = tokens
    val b0 = t.where(col("doc_id") % 2 === 0)
    val b1 = t.where(col("doc_id") % 2 === 1)
    // construct the LEGACY (pre-r17) physical layout: append normally,
    // then rewrite the sketches table as flat part files without the
    // `folded` column — exactly what a pre-r17 ledger dir holds
    SketchLedger.append(spark, b0, Seq("source"), "tok", dir, "b0")
    val legacyRows = spark.read.parquet(s"$dir/sketches")
      .drop("folded").drop("bpart").collect().toIndexedSeq
    val legacySchema = spark.read.parquet(s"$dir/sketches")
      .drop("folded").drop("bpart").schema
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/sketches"), true)
    spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(legacyRows: _*)), legacySchema)
      .coalesce(1).write.parquet(s"$dir/sketches")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/sketches"))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
      "fixture must be a genuine flat v1 layout")
    // pure READS of the untouched v1 dir work without migration
    val v1Read = SketchLedger.distinctByKey(spark, dir)
      .collect().map(_.toString).toSeq
    // first v2 mutation migrates in place, then lands its own partition
    SketchLedger.append(spark, b1, Seq("source"), "tok", dir, "b1")
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/sketches"))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
      "migration must leave no flat part files behind")
    // the migrated ledger equals a never-legacy ledger with the same appends
    val fresh = tmp()
    SketchLedger.append(spark, b0, Seq("source"), "tok", fresh, "b0")
    SketchLedger.append(spark, b1, Seq("source"), "tok", fresh, "b1")
    assert(SketchLedger.distinctByKey(spark, dir).collect().map(_.toString).toSeq ===
      SketchLedger.distinctByKey(spark, fresh).collect().map(_.toString).toSeq)
    // and the pre-migration read agrees with the b0-only fresh ledger
    val freshB0 = tmp()
    SketchLedger.append(spark, b0, Seq("source"), "tok", freshB0, "b0")
    assert(v1Read ===
      SketchLedger.distinctByKey(spark, freshB0).collect().map(_.toString).toSeq)
    // compaction over the migrated dir behaves normally
    assert(SketchLedger.compactDistinct(spark, dir) === Seq("b0", "b1"))
    assert(SketchLedger.distinctByKey(spark, dir).collect().map(_.toString).toSeq ===
      SketchLedger.distinctByKey(spark, fresh).collect().map(_.toString).toSeq)
  }
}
