package graft.operators

import graft.{Q, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: Unicode normalization (the precondition for
  * every hash/shingle step), stride chunking (RAG / long-context
  * windowing), and the deterministic global shuffle that fixes training
  * order. All three are exactly oracle-able — normalization matches
  * DuckDB's `nfc_normalize`, and the shuffle key is md5, which both
  * engines implement identically.
  */
object CurationOps {

  /** THE text-quality score — the one definition every quality-aware
    * stage shares: the curation gate (CurationPipeline.curate and its
    * streaming twin), the text ingest loop's admission gate
    * (AssetIngest.ingestTextBatch), per-source calibration
    * (q_quality_calibrate), the quality report (q_text_quality) and the
    * token-budget cut (q_token_budget_select / budgetCut). They must all
    * agree on what "quality" means — six verbatim copies used to enforce
    * that by convention; one shared column program enforces it by
    * construction. Requires `toks` (string array) and `n_tok` (its
    * size) columns; adds `stop_ratio` and `score`. The arithmetic's
    * association order is load-bearing: the DuckDB oracles repeat it
    * term-for-term so both engines produce bit-identical doubles. */
  def withQualityScore(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("stop_ratio",
        expr("size(filter(toks, t -> array_contains(array('a','the','of'), t)))").cast("double") /
          col("n_tok"))
      .withColumn("score",
        col("stop_ratio") * 0.3 + least(col("n_tok"), lit(100)).cast("double") / 100.0 * 0.7)

  /** Quality-ranked token-budget cut — keep the best-first prefix of
    * `scored` (needs `doc_id`, `n_tok`, `score`; other columns pass
    * through) whose cumulative token count fits `budget`, with the
    * global offset added as `cum_tok`. The global ordered prefix sum is
    * the packTwoLevel two-level scan transposed to SCORE order: rows
    * range-bucket into score-descending chunks off one broadcast
    * (min, max) row (bucketing is monotone in score, so chunk-ascending
    * concatenation IS the global score order), each chunk cumulates
    * locally in parallel, and a broadcast exclusive prefix over the
    * `chunks`-row totals shifts every row to its global offset — no
    * task ever holds the whole corpus (the trap a bare
    * Window.orderBy(score) walks into at 100 TB). Chunk totals harvest
    * as max(cum_local) — valid because n_tok is non-negative (SURVEY
    * §7.3 G24). Backs `q_token_budget_select` and
    * CurationPipeline.pretrainingLayout's tokenBudget option. */
  def budgetCut(scored: org.apache.spark.sql.DataFrame, budget: Long,
      chunks: Int = 16): org.apache.spark.sql.DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(chunks >= 1, s"chunks must be >= 1, got $chunks")
    // score-DESCENDING range bucket (higher score → lower chunk), with
    // the hi == lo guard a one-value score domain needs; the scan itself
    // is the shared TwoLevel.prefix engine (signed = false: token counts
    // are non-negative)
    TwoLevel.prefix(scored, boundCol = "score",
        chunkExpr =
          s"CAST(CASE WHEN __hi = __lo THEN 0 ELSE least($chunks - 1, " +
            s"CAST(floor((__hi - score) / (__hi - __lo) * $chunks) AS BIGINT)) END AS INT)",
        groupCols = Seq.empty, orderCols = Seq(col("score").desc, col("doc_id").asc),
        valueCol = "n_tok", signed = false)
      .withColumnRenamed("cum", "cum_tok")
      .where(col("cum_tok") <= budget)
      .drop("chunk", "cum_local")
  }

  /** Per-source exact-duplicate rate over any documents frame (needs
    * `source` and `text`). The md5 collapses full-text comparison to a
    * 32-hex-char key before the distinct, so the shuffle carries digests,
    * never document bodies — the same reason q_dedup_exact hashes before
    * grouping. The rate is the curation-review number ("which source is
    * mostly mirrors"); keep/drop decisions stay with the dedup family. */
  def dupRateBySource(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        countDistinct(md5(col("text"))).as("uniq"))
      .select(col("source"), col("docs"), col("uniq"),
        round(lit(1.0) - col("uniq").cast("double") / col("docs"), 6).as("dup_rate"))

  /** Snapshot diff: classify every doc id across two corpus versions as
    * added / removed / changed / unchanged by CONTENT HASH. Both inputs
    * need (`idCol`, `srcCol`, `hashCol`) — hash upstream (md5/sha2) so
    * the full-outer join shuffles ids + digests, never document bodies;
    * at 100 TB this is one equi-shuffle per side on the id, the plan a
    * between-crawl-snapshots audit wants. Added rows take their source
    * from v2, removed from v1 (coalesce). */
  def snapshotDiff(v1: org.apache.spark.sql.DataFrame, v2: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", srcCol: String = "source",
      hashCol: String = "h"): org.apache.spark.sql.DataFrame = {
    val a = v1.select(col(idCol).as("id1"), col(srcCol).as("src1"), col(hashCol).as("h1"))
    val b = v2.select(col(idCol).as("id2"), col(srcCol).as("src2"), col(hashCol).as("h2"))
    a.join(b, col("id1") === col("id2"), "full_outer")
      .select(
        coalesce(col("src1"), col("src2")).as("source"),
        coalesce(col("id1"), col("id2")).as("doc_id"),
        when(col("id1").isNull, "added")
          .when(col("id2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged").as("cls"))
  }

  /** The mixture arithmetic shared by q_mixture_plan (computed from a
    * corpus scan) and [[mixturePlanFromLedger]] (computed from the sum
    * ledger): `tokc` carries one (source, toks BIGINT) row per source;
    * the output is share / sqrt-temperature weight / epochs at the
    * token `budget`. One shared column program, so the scan path and
    * the ledger path agree bit-for-bit by construction. */
  def mixturePlanOf(tokc: org.apache.spark.sql.DataFrame,
      budget: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val allToks = tokc.agg(sum("toks").as("all_toks"))
    val w = tokc.crossJoin(broadcast(allToks))
      .withColumn("rawW", sqrt(col("toks").cast("double") / col("all_toks")))
    val sumW = w.agg(sum("rawW").as("sum_w"))
    w.crossJoin(broadcast(sumW))
      .select(
        col("source"), col("toks"),
        round(col("toks").cast("double") / col("all_toks"), 6).as("share"),
        round(col("rawW") / col("sum_w"), 6).as("weight"),
        round(col("rawW") / col("sum_w") * lit(budget) / col("toks"), 4)
          .as("epochs"))
      .orderBy("source")
  }

  /** The mixture plan WITHOUT a corpus scan: per-source token totals
    * come from the ingest loops' exact sum ledger
    * (SketchLedger.appendSum — kilobytes per source × batch), so at
    * 100 TB this is a metadata read where q_mixture_plan is a full
    * pass. Requires a ledger keyed on `source` whose metric is the
    * per-doc token count (the text loop's recordSketches shape); sums
    * of integer metrics are exact through 2^53, so the BIGINT cast
    * recovers the scan-path total bit-for-bit (law in
    * CorpusAuditSpec: ledger plan == scan plan). */
  def mixturePlanFromLedger(s: org.apache.spark.sql.SparkSession,
      sumLedgerDir: String, budget: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val tokc = graft.sources.SketchLedger.sumByKey(s, sumLedgerDir)
      .select(col("source"), col("sum_val").cast("bigint").as("toks"))
    mixturePlanOf(tokc, budget)
  }

  /** The one-call corpus health report a curation review starts from:
    * per-source mixture arithmetic (q_mixture_plan), Zipf fit
    * (q_zipf_fit), cross-source leakage (q_xsource_leakage) and the RAW
    * exact-dup rate, joined on the source key. Each component keeps its
    * own at-scale shape; the joins are source-cardinality rows (tens),
    * so they broadcast. Declared as q_corpus_report. */
  def corpusHealthReport(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val mix = queries("q_mixture_plan")(s, d)
    val zipf = TextOps.queries("q_zipf_fit")(s, d)
      .select("source", "zipf_slope", "zipf_r2")
    val leak = TextOps.queries("q_xsource_leakage")(s, d)
      .select("source", "leak_ratio")
    val dup = dupRateBySource(Tables.documents(s, d))
      .select("source", "docs", "dup_rate")
    mix.join(zipf, "source").join(leak, "source").join(dup, "source")
      .select("source", "docs", "toks", "share", "weight", "epochs",
        "zipf_slope", "zipf_r2", "leak_ratio", "dup_rate")
      .orderBy("source")
  }

  /** The health report WITHOUT a corpus scan — the metadata twin of
    * [[corpusHealthReport]], read entirely from an ingest sink's three
    * ledgers (SketchLedger's `distinct`/`size`/`sum` tiers, the
    * recordSketches layout): kilobytes per source × batch where the
    * scan report is several full corpus passes, so at 100 TB this is
    * the report a curation dashboard refreshes per ingest batch.
    *
    * Honest accuracy tiers per column: `docs`/`toks` and the mixture
    * arithmetic (share/weight/epochs) are EXACT — the sum ledger keeps
    * exact per-(source, batch) totals and [[mixturePlanOf]] is the same
    * column program the scan path runs. `len_p50`/`len_p99` carry KLL
    * rank error (~1.65% at the default k = 200) and `distinct_ids_est`
    * HLL relative error (~1.6%) — `distinct_ids_est` ≈ `docs` doubles
    * as a cross-batch id-collision check (a re-used doc_id drags the
    * ratio below 1). What the scan report has that NO ledger can:
    * zipf_slope/leak_ratio/dup_rate are corpus-CONTENT computations —
    * refreshing those still costs the scan, by design. */
  def ledgerHealthReport(s: org.apache.spark.sql.SparkSession,
      sketchDir: String, budget: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val sums = graft.sources.SketchLedger.sumByKey(s, s"$sketchDir/sum")
      .select(col("source"), col("sum_val").cast("bigint").as("toks"),
        col("rows").as("docs"))
    val mix = mixturePlanOf(sums.select("source", "toks"), budget)
    val lens = graft.sources.SketchLedger
      .quantileByKey(s, s"$sketchDir/size", Seq(0.5, 0.99))
      .groupBy("source")
      .agg(round(max(when(col("rank") === 0.5, col("value_est"))), 2).as("len_p50"),
        round(max(when(col("rank") === 0.99, col("value_est"))), 2).as("len_p99"))
    val dist = graft.sources.SketchLedger
      .distinctByKey(s, s"$sketchDir/distinct")
      .select(col("source"), col("distinct_est").as("distinct_ids_est"))
    val base = mix.join(broadcast(sums.select("source", "docs")), "source")
      .join(broadcast(lens), "source")
      .join(broadcast(dist), "source")
    // dup-rate ESTIMATE from the digest tier (r18) when the sink carries
    // one; a pre-digest sink keeps the column with nulls (stable schema,
    // honest absence) — the scan-only columns that remain scan-only are
    // zipf_slope/leak_ratio (corpus-content computations by design)
    val digestDir = s"$sketchDir/digest"
    val hasDigest = new org.apache.hadoop.fs.Path(digestDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(digestDir))
    val withDup =
      if (hasDigest)
        base.join(broadcast(dupRateFromLedger(s, sketchDir)
          .select(col("source"), col("dup_rate_est"))), Seq("source"), "left")
      else base.withColumn("dup_rate_est", lit(null).cast("double"))
    withDup
      .select("source", "docs", "toks", "share", "weight", "epochs",
        "len_p50", "len_p99", "distinct_ids_est", "dup_rate_est")
      .orderBy("source")
  }

  /** Per-key dup-rate ESTIMATE from an ingest sink's digest ledger —
    * the sketch-tier answer to [[dupRateBySource]]'s scan: exact
    * processed rows vs HLL-estimated distinct content digests, read
    * from kilobytes of sketch bytes instead of a corpus pass. Error
    * contract: the distinct estimate carries standard HLL relative
    * error (~1.6% at the default lgConfigK = 12), so
    * `dup_rate_est = 1 - distinct_est/rows` is within ~(uniq/rows)·1.6%
    * of the exact rate (CorpusAuditSpec bracket law vs the exact
    * q_dup_rate_by_source arithmetic); the estimate is clamped at 0
    * where HLL slightly overshoots a dup-free key. Over an ingest sink
    * this measures residual duplication among LANDED rows (the loops
    * near-dedup upstream); ledgering raw batches measures the raw
    * rate. */
  def dupRateFromLedger(s: org.apache.spark.sql.SparkSession,
      sketchDir: String): org.apache.spark.sql.DataFrame = {
    val d = graft.sources.SketchLedger.distinctByKey(s, s"$sketchDir/digest")
    val keys = d.columns.filterNot(Set("distinct_est", "rows").contains)
    d.select(keys.map(col) ++ Seq(col("rows").as("docs"),
      col("distinct_est").as("uniq_est"),
      round(greatest(lit(0.0),
        lit(1.0) - col("distinct_est").cast("double") / col("rows")), 6)
        .as("dup_rate_est")): _*)
  }

  val queries: Map[String, Q] = Map(
    // Unicode NFC normalization via the native graft_nfc expression
    // (functions/NfcNormalize.scala). The corpus text is ASCII, so the
    // query PLANTS denormalized input: even doc_ids get a decomposed
    // "Cafe" + U+0301 suffix (NFC composes it to U+00E9 "e-acute"), odd doc_ids
    // the already-composed U+00E9 form (NFC is identity). `changed`
    // must flip exactly on parity and `ascii_identity` must hold
    // corpus-wide — both checked byte-exactly against nfc_normalize.
    "q_text_normalize" -> ((s, d) => {
      GraftFunctions.register(s)
      Tables.documents(s, d)
        .withColumn("raw",
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(substring(col("text"), 1, 32), lit(" Cafe\u0301")))
            .otherwise(concat(substring(col("text"), 1, 32), lit(" Caf\u00e9"))))
        .select(col("doc_id"),
          expr("graft_nfc(raw)").as("norm"),
          (expr("graft_nfc(raw)") =!= col("raw")).as("changed"),
          (expr("graft_nfc(text)") === col("text")).as("ascii_identity"))
        .orderBy("doc_id")
    }),

    // Stride chunking: 64-token windows every 48 tokens (16-token
    // overlap carries context across cuts) — the standard long-document
    // splitter for embedding/RAG pipelines. One generate-and-explode
    // per document, no shuffle until the final presentation sort;
    // chunk count is ceil(n_tok / 48) so output is ~1.33x input tokens.
    "q_chunk_docs" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .where(size(col("toks")) > 0)
        .select(col("doc_id"), col("source"), col("toks"),
          posexplode(expr("sequence(1, size(toks), 48)")).as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("source"),
          col("chunk_idx").cast("bigint").as("chunk_idx"),
          expr("array_join(slice(toks, start, 64), ' ')").as("chunk"),
          expr("CAST(size(slice(toks, start, 64)) AS BIGINT)").as("n_tok"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // Per-source quality calibration: a global quality threshold is the
    // classic curation mistake — a "0.3" means different things in web
    // text vs books — so production filters set PERCENTILE thresholds
    // per source. percent_rank over (source, score-order) converts the
    // q_text_quality score to its within-source quantile; `keep` drops
    // each source's bottom fifth. Same 100 TB shape as every window op
    // here: parallelism = #sources x nothing-else, one shuffle, and the
    // rank order is totalized by doc_id so the oracle is exact.
    "q_quality_calibrate" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy(col("score").asc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")))
        .transform(withQualityScore)
        .withColumn("pr", percent_rank().over(w))
        .withColumn("keep", col("pr") >= 0.2)
        .select("source", "doc_id", "score", "pr", "keep")
        .orderBy("source", "doc_id")
    }),

    // Weighted mixture sampling: per-source up/down-sampling rates —
    // the "mix web at 0.5x, books at 2x" step that fixes a training
    // corpus' source proportions. Rates here derive from the source
    // number (0.5 + (num % 4) * 0.5 ∈ {0.5, 1.0, 1.5, 2.0}) so the
    // query exercises drop, keep, and multi-epoch duplication in one
    // pass. Integer copies come from floor(rate); the fractional half
    // is a Bernoulli gate on one md5 nibble (hex < '8' ⇔ p = 1/2) —
    // deterministic, engine-portable, and ZERO shuffles before the
    // presentation sort: every row decides its own fate from its hash,
    // which is exactly what survives 100 TB (no per-source rank, no
    // window, no count pass — the scale trap sequence packing had).
    // rate2 = 2*rate stays in pure integer arithmetic throughout.
    "q_sample_weighted" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit("#"), col("source"))))
        .withColumn("rate2",
          (lit(1) + pmod(substring(col("source"), 4, 10).cast("bigint"), lit(4))))
        .withColumn("copies", expr(
          "CAST(rate2 div 2 AS BIGINT) + " +
            "CASE WHEN rate2 % 2 = 1 AND substring(h, 1, 1) < '8' THEN 1 ELSE 0 END"))
        .where(col("copies") >= 1)
        .select(col("doc_id"), col("source"),
          explode(expr("sequence(CAST(1 AS BIGINT), copies)")).as("epoch"))
        .orderBy("doc_id", "epoch")
    }),

    // Token-budget corpus selection: rank every document by the quality
    // score (q_quality_calibrate's arithmetic, verbatim — the two
    // curation steps must agree on what "quality" means) and keep the
    // best-first prefix whose cumulative token count fits the budget —
    // the "give me the best 10B tokens" cut every mixture plan ends in.
    // The global ordered prefix sum is the packTwoLevel two-level scan
    // (TextOps.scala:432) transposed to SCORE order: docs range-bucket
    // into score-descending chunks off one broadcast (min, max) row
    // (bucketing is monotone in score, so chunk-ascending concatenation
    // IS the global score order), each chunk cumulates locally in
    // parallel, and a broadcast exclusive prefix over the per-chunk
    // totals (a `chunks`-row window) shifts every row to its global
    // offset — no task ever holds the whole corpus, which is what the
    // naive Window.orderBy(score) single-partition scan gets wrong at
    // 100 TB. Budget filter and presentation sort are then per-row.
    "q_token_budget_select" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")))
        .transform(withQualityScore)
        .select("doc_id", "n_tok", "score")
      budgetCut(scored, budget = 5000L,
        // scale-adaptive chunk count (r21) — see q_evt_concurrency
        chunks = math.max(16, s.sparkContext.defaultParallelism))
        .select(col("doc_id"), col("n_tok").cast("bigint").as("n_tok"), col("cum_tok"))
        .orderBy(col("cum_tok").asc, col("doc_id").asc)
    }),

    // Deterministic global shuffle: the reproducible random order a
    // training run needs. Key = md5(doc_id:source) — uniform, engine-
    // portable, seedable by changing the salt; shard = first hex nibble
    // mod 8; pos = rank of the key within the shard. At scale this is
    // the canonical one-shuffle layout: hash-partition into O(#output
    // files) shards, sort each shard by the key (hash order IS random
    // order), write shards in parallel. Shard count is the parallelism
    // knob — 8 here, thousands at 100 TB.
    "q_shuffle_deterministic" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))).as("h"))
        .withColumn("shard",
          expr("CAST((locate(substring(h, 1, 1), '0123456789abcdef') - 1) % 8 AS BIGINT)"))
        .withColumn("pos",
          row_number().over(Window.partitionBy("shard").orderBy("h")).cast("bigint"))
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy("shard", "pos")
    }),

    // Mixture plan — the arithmetic every multi-source training run
    // starts from: per-source token totals → temperature-scaled sampling
    // weights (sqrt share, the standard t=2 rebalancing that upweights
    // small sources without letting any source dominate) → epochs over
    // each source at a fixed token budget (epochs > 1 = the source
    // repeats; the over-repetition warning a curation review reads).
    // Shape at any scale: ONE map-side-combined aggregate keyed on the
    // 20-key source column; the two corpus totals (sum of tokens, sum of
    // raw weights) ride as 1-row broadcasts. The weight stays UNROUNDED
    // through the epochs arithmetic and both engines evaluate the same
    // left-to-right expression, so the rounded outputs agree exactly.
    // Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1
    // adapted to this corpus's token ranges): per-doc token count,
    // mean word length, distinct-"stopword" presence and top-token
    // repetition fraction, each thresholded, composed into one `keep`
    // flag. Every metric is derived from exact integer counts (one
    // (doc, token) partial count absorbs in-doc repetition map-side —
    // the q_unigram_logprob skew note's mitigation, applied), so the
    // booleans are deterministic at any scale; the only doubles are
    // 4dp-rounded ratios compared AFTER rounding on both sides. One
    // scan, two keyed shuffles (doc×token, then doc), no joins.
    "q_quality_gopher" -> ((s, d) => {
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      tc.groupBy("doc_id")
        .agg(sum("c").as("n_tok"),
          round(sum(col("c") * length(col("t"))).cast("double") / sum("c"), 4)
            .as("mean_wlen"),
          countDistinct(when(col("t").isin("the", "data", "value", "key"),
            col("t"))).as("stop_distinct"),
          round(max("c").cast("double") / sum("c"), 4).as("max_tok_frac"))
        .select(col("doc_id"), col("n_tok"), col("mean_wlen"),
          col("stop_distinct"), col("max_tok_frac"),
          (col("n_tok").between(30, 90) &&
            col("mean_wlen").between(4.3, 4.7) &&
            col("stop_distinct") >= 2 &&
            col("max_tok_frac") <= 0.08).as("keep"))
        .orderBy("doc_id")
    }),

    // C4-style LINE-LEVEL quality gate (Raffel et al. 2020, the public
    // C4 cleaning rules) — the complement of the DOC-level families
    // (Gopher thresholds, CCNet perplexity proxy): real crawl pages die
    // line by line, not page by page. The corpus has no newlines, so
    // the query SYNTHESIZES a deterministic multi-line page per doc
    // (the q_dup_rate_by_source planting discipline — fixed in the
    // query so the oracle replays it): 10-word lines, terminal '.'
    // planted on (doc_id+ln) % 3 != 0, a boilerplate line planted on
    // (doc_id*7+ln) % 11 == 0. C4's rules then apply EXACTLY: keep a
    // line iff it ends in terminal punctuation AND has >= 5 words AND
    // does not mention javascript; keep the doc iff >= 3 lines
    // survive. All integer/string predicates — deterministic at any
    // scale. Shape: one scan, explode to lines (bounded 10x row fan-out
    // of word data already read), one doc-keyed partial-agg shuffle.
    "q_quality_c4" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("source"), col("w"),
          expr("explode(sequence(0, cast((size(w) + 9) / 10 as int) - 1))").as("ln"))
        .select(col("doc_id"), col("source"), col("ln"),
          expr("slice(w, ln * 10 + 1, 10)").as("lw"))
        .withColumn("line",
          when((col("doc_id") * 7 + col("ln")) % 11 === 0,
            lit("please enable javascript and cookies to continue."))
            .when((col("doc_id") + col("ln")) % 3 =!= 0,
              concat(concat_ws(" ", col("lw")), lit(".")))
            .otherwise(concat_ws(" ", col("lw"))))
        .withColumn("kept",
          col("line").endsWith(".") &&
            size(split(col("line"), " ")) >= 5 &&
            !col("line").contains("javascript"))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_lines"),
          count(when(col("kept"), 1)).as("kept_lines"))
        .withColumn("keep", col("kept_lines") >= 3)
        .orderBy("doc_id")
    }),

    // C4-style CROSS-DOCUMENT line dedup (the other half of C4's
    // cleaning: "we deduplicated three-sentence spans" — repeated
    // boilerplate lines are removed corpus-wide, keeping the FIRST
    // occurrence in (doc_id, line) order). Same planted-page
    // discipline as q_quality_c4, with TWO boilerplate families
    // planted so the dedup has corpus-wide work (~20% of lines).
    // Scale shape — deliberately NOT a window over the line key: a
    // row_number over partitionBy(line) serializes the hot boilerplate
    // key through one reducer with ALL its rows; instead the keeper is
    // a groupBy(line).min aggregate (partial map-side combine collapses
    // the hot key to one row per map partition) joined back on the
    // line key — the shuffle carries line instances once, and the hot
    // key's join side stays 1 keeper row (AQE skew-split applies to
    // the instance side if ever needed). Keeper identity is pure
    // integer arithmetic (doc_id*1000 + ln; ln < 1000 by the 10-word
    // line construction), exact in both engines.
    "q_dedup_lines" -> ((s, d) => {
      val l = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("source"), col("w"),
          expr("explode(sequence(0, cast((size(w) + 9) / 10 as int) - 1))").as("ln"))
        .withColumn("line",
          when((col("doc_id") * 7 + col("ln")) % 11 === 0,
            lit("please enable javascript and cookies to continue"))
            .when((col("doc_id") + col("ln")) % 9 === 4,
              lit("subscribe to our newsletter for updates today"))
            .otherwise(concat_ws(" ", expr("slice(w, ln * 10 + 1, 10)"))))
        .select("doc_id", "source", "ln", "line")
      val keepers = l.groupBy("line")
        .agg(min(col("doc_id") * 1000 + col("ln")).as("keeper"))
      l.join(keepers, "line")
        .withColumn("kept", col("doc_id") * 1000 + col("ln") === col("keeper"))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_lines"),
          count(when(col("kept"), 1)).as("kept_lines"),
          count(when(!col("kept"), 1)).as("removed_lines"))
        .orderBy("doc_id")
    }),

    // The ledger's whole read/compact arithmetic under the driver's
    // hash gate (the q_prune_zorder recipe applied to the accounting
    // tier): append the corpus's per-source token sums as THREE batch
    // partitions, fold them through compactSum (atomic manifest
    // publish + GC), and emit sumByKey — the oracle is the plain
    // corpus aggregate, so a merge bug, a retry-dedup slip, or a
    // manifest-exclusion bug in the compacted read hash-fails instead
    // of drifting a dashboard silently. Idempotent within a JVM run:
    // re-appended ids are absorbed by the (keys, batch_id) dedup and a
    // re-fold of folded ids is a no-op (both spec-pinned).
    "q_ledger_compact" -> ((s, d) => {
      import graft.sources.SketchLedger
      val dir = graft.plans.Scale.scratch(s, "ledcompact", d) + "/sum"
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("double").as("n_tok"))
      (0 until 3).foreach { r =>
        SketchLedger.appendSum(s, base.where(col("doc_id") % 3 === r),
          Seq("source"), "n_tok", dir, s"b$r")
      }
      SketchLedger.compactSum(s, dir)
      SketchLedger.sumByKey(s, dir)
        .select(col("source"), col("sum_val").cast("bigint").as("toks"),
          col("rows").as("docs"))
        .orderBy("source")
    }),

    "q_mixture_plan" -> ((s, d) => {
      val tokc = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("bigint").as("t"))
        .groupBy("source").agg(sum("t").as("toks"))
      mixturePlanOf(tokc)
    }),

    // Snapshot diff between two corpus versions, rolled up per source —
    // the between-crawls audit ("what did this refresh actually change").
    // v2 is derived deterministically in-query (removals % 7, content
    // edits % 11, additions % 13 re-id'd +10M) so both engines diff the
    // same pair. Scale shape: both sides reduce to (id, source, digest)
    // at the scan, the full-outer join shuffles ONLY those three columns
    // keyed on the id, and the rollup is source-cardinality rows. The
    // hash never crosses engines — only the class counts do — so md5
    // here is a within-engine equality witness, not an oracle surface.
    "q_corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val v1 = docs.select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      val v2 = docs.where(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 11 === 3, md5(concat(col("text"), lit(" rev2"))))
            .otherwise(md5(col("text"))).as("h"))
        .unionByName(docs.where(col("doc_id") % 13 === 1)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("source"),
            md5(concat(col("text"), lit(" new"))).as("h")))
      snapshotDiff(v1, v2)
        .groupBy("source")
        .agg(
          count(when(col("cls") === "added", 1)).as("n_added"),
          count(when(col("cls") === "removed", 1)).as("n_removed"),
          count(when(col("cls") === "changed", 1)).as("n_changed"),
          count(when(col("cls") === "unchanged", 1)).as("n_unchanged"))
        .orderBy("source")
    }),

    // Per-source exact-dup rate on a corpus with planted source-skewed
    // duplicates (doc_id % 7 > doc_id % 20 replants a copy, so low-index
    // sources carry rates up to ~0.46 and sources >= src7 carry none —
    // the "which source is mostly mirrors" distribution a real crawl
    // shows). The library face (dupRateBySource) takes any frame; the
    // declared query fixes the planting so the oracle can replay it.
    "q_dup_rate_by_source" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "source", "text")
      val planted = docs.unionByName(
        docs.where(col("doc_id") % 7 > col("doc_id") % 20))
      dupRateBySource(planted).orderBy("source")
    }),

    // The composed per-source health report (corpusHealthReport) under
    // the driver gate: mixture + Zipf + leakage + raw dup rate in one
    // frame. The dup_rate column is genuinely 0.0 on this corpus (every
    // text is unique) — the gate proves the JOIN and column plumbing,
    // the component queries prove the signals.
    "q_corpus_report" -> ((s, d) => corpusHealthReport(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_text_normalize" ->
      """WITH r AS (SELECT doc_id, text,
        |        CASE WHEN doc_id % 2 = 0 THEN substr(text, 1, 32) || ' Cafe' || chr(769)
        |             ELSE substr(text, 1, 32) || ' Caf' || chr(233) END AS raw
        |      FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm,
        |       nfc_normalize(raw) <> raw AS changed,
        |       nfc_normalize(text) = text AS ascii_identity
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |e AS (SELECT doc_id, source, toks,
        |        unnest(generate_series(1, len(toks), 48)) AS start
        |      FROM t WHERE len(toks) >= 1)
        |SELECT doc_id, source, (start - 1) // 48 AS chunk_idx,
        |       array_to_string(toks[start : start + 63], ' ') AS chunk,
        |       len(toks[start : start + 63]) AS n_tok
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_quality_calibrate" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |q AS (SELECT doc_id, source,
        |        CAST(len(list_filter(toks, t -> list_contains(['a','the','of'], t))) AS DOUBLE)
        |          / len(toks) AS stop_ratio,
        |        CAST(len(toks) AS INTEGER) AS nt
        |      FROM t),
        |sc AS (SELECT doc_id, source,
        |        stop_ratio * 0.3 + CAST(least(nt, 100) AS DOUBLE) / 100.0 * 0.7 AS score
        |      FROM q)
        |SELECT source, doc_id, score,
        |       percent_rank() OVER (PARTITION BY source ORDER BY score, doc_id) AS pr,
        |       percent_rank() OVER (PARTITION BY source ORDER BY score, doc_id) >= 0.2 AS keep
        |FROM sc ORDER BY source, doc_id""".stripMargin,

    // Score arithmetic written in the SAME association order as the
    // Spark column expression (the q_quality_calibrate discipline) so
    // both engines order by bit-identical doubles; the oracle's plain
    // global window and the engine's two-level scan agree exactly
    // because the chunked decomposition preserves the total order.
    "q_token_budget_select" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |q AS (SELECT doc_id,
        |        CAST(len(list_filter(toks, t -> list_contains(['a','the','of'], t))) AS DOUBLE)
        |          / len(toks) AS stop_ratio,
        |        CAST(len(toks) AS INTEGER) AS nt
        |      FROM t),
        |sc AS (SELECT doc_id, nt,
        |        stop_ratio * 0.3 + CAST(least(nt, 100) AS DOUBLE) / 100.0 * 0.7 AS score
        |      FROM q),
        |cum AS (SELECT doc_id, nt, score,
        |        CAST(sum(nt) OVER (ORDER BY score DESC, doc_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        |      FROM sc)
        |SELECT doc_id, CAST(nt AS BIGINT) AS n_tok, cum_tok
        |FROM cum WHERE cum_tok <= 5000
        |ORDER BY cum_tok ASC, doc_id ASC""".stripMargin,

    "q_sample_weighted" ->
      """WITH r AS (SELECT doc_id, source,
        |        md5(doc_id::VARCHAR || '#' || source) AS h,
        |        1 + substr(source, 4)::BIGINT % 4 AS rate2
        |      FROM documents),
        |c AS (SELECT doc_id, source,
        |        rate2 // 2 + CASE WHEN rate2 % 2 = 1 AND substr(h, 1, 1) < '8'
        |                     THEN 1 ELSE 0 END AS copies
        |      FROM r)
        |SELECT doc_id, source, unnest(generate_series(1, copies)) AS epoch
        |FROM c WHERE copies >= 1
        |ORDER BY doc_id, epoch""".stripMargin,
    "q_shuffle_deterministic" ->
      """WITH h AS (SELECT doc_id, md5(doc_id::VARCHAR || ':' || source) AS h FROM documents),
        |s AS (SELECT doc_id, h,
        |        (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 8 AS shard FROM h)
        |SELECT shard, row_number() OVER (PARTITION BY shard ORDER BY h) AS pos, doc_id
        |FROM s ORDER BY shard, pos""".stripMargin,

    // The compacted ledger must equal the plain corpus aggregate.
    "q_ledger_compact" ->
      """SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
        |  count(*) AS docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_quality_gopher" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
        |m AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |        round(CAST(sum(c * len(t)) AS DOUBLE) / sum(c), 4) AS mean_wlen,
        |        count(DISTINCT CASE WHEN t IN ('the','data','value','key')
        |                            THEN t END) AS stop_distinct,
        |        round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS max_tok_frac
        |      FROM tc GROUP BY doc_id)
        |SELECT doc_id, n_tok, mean_wlen, stop_distinct, max_tok_frac,
        |  (n_tok BETWEEN 30 AND 90 AND mean_wlen BETWEEN 4.3 AND 4.7
        |   AND stop_distinct >= 2 AND max_tok_frac <= 0.08) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_mixture_plan" ->
      """WITH tokc AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, toks,
        |    sqrt(CAST(toks AS DOUBLE) / (SELECT sum(toks) FROM tokc)) AS rawW
        |  FROM tokc)
        |SELECT source, toks,
        |  round(CAST(toks AS DOUBLE) / (SELECT sum(toks) FROM tokc), 6) AS share,
        |  round(rawW / (SELECT sum(rawW) FROM w), 6) AS weight,
        |  round(rawW / (SELECT sum(rawW) FROM w) * 1000000 / toks, 4) AS epochs
        |FROM w ORDER BY source""".stripMargin,

    "q_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |v2 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 11 = 3 THEN md5(text || ' rev2') ELSE md5(text) END AS h
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, source, md5(text || ' new')
        |  FROM documents WHERE doc_id % 13 = 1),
        |d AS (
        |  SELECT coalesce(v1.source, v2.source) AS source,
        |    CASE WHEN v1.doc_id IS NULL THEN 'added'
        |         WHEN v2.doc_id IS NULL THEN 'removed'
        |         WHEN v1.h <> v2.h THEN 'changed' ELSE 'unchanged' END AS cls
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT source,
        |  count(*) FILTER (WHERE cls = 'added') AS n_added,
        |  count(*) FILTER (WHERE cls = 'removed') AS n_removed,
        |  count(*) FILTER (WHERE cls = 'changed') AS n_changed,
        |  count(*) FILTER (WHERE cls = 'unchanged') AS n_unchanged
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    // Same planted pages (two boilerplate families), keeper = integer
    // min per line; counts stay BIGINT via count(*) FILTER.
    "q_dedup_lines" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |           FROM documents),
        |l0 AS (SELECT doc_id, source,
        |         unnest(generate_series(0, CAST(floor((len(w)+9)/10) AS INT) - 1)) AS ln, w
        |       FROM w),
        |l AS (SELECT doc_id, source, ln,
        |        CASE WHEN (doc_id*7 + ln) % 11 = 0
        |             THEN 'please enable javascript and cookies to continue'
        |             WHEN (doc_id + ln) % 9 = 4
        |             THEN 'subscribe to our newsletter for updates today'
        |             ELSE array_to_string(w[ln*10+1 : ln*10+10], ' ') END AS line
        |      FROM l0),
        |k AS (SELECT line, min(doc_id*1000 + ln) AS keeper FROM l GROUP BY line),
        |d AS (SELECT l.doc_id, l.source,
        |        (l.doc_id*1000 + l.ln = k.keeper) AS kept
        |      FROM l JOIN k ON l.line = k.line)
        |SELECT doc_id, source, count(*) AS n_lines,
        |  count(*) FILTER (WHERE kept) AS kept_lines,
        |  count(*) FILTER (WHERE NOT kept) AS removed_lines
        |FROM d GROUP BY doc_id, source ORDER BY doc_id""".stripMargin,

    // Same planted page construction, C4 rules verbatim; counts stay
    // BIGINT via count(*) FILTER (a sum over booleans would go HUGEINT
    // in DuckDB and hash-mismatch on type).
    "q_quality_c4" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |           FROM documents),
        |l0 AS (SELECT doc_id, source,
        |         unnest(generate_series(0, CAST(floor((len(w)+9)/10) AS INT) - 1)) AS ln, w
        |       FROM w),
        |l AS (SELECT doc_id, source, ln,
        |        CASE WHEN (doc_id*7 + ln) % 11 = 0
        |             THEN 'please enable javascript and cookies to continue.'
        |             WHEN (doc_id + ln) % 3 <> 0
        |             THEN array_to_string(w[ln*10+1 : ln*10+10], ' ') || '.'
        |             ELSE array_to_string(w[ln*10+1 : ln*10+10], ' ') END AS line
        |      FROM l0),
        |r AS (SELECT doc_id, source, line,
        |        line LIKE '%.' AND len(string_split(line, ' ')) >= 5
        |          AND line NOT LIKE '%javascript%' AS kept
        |      FROM l)
        |SELECT doc_id, source, count(*) AS n_lines,
        |  count(*) FILTER (WHERE kept) AS kept_lines,
        |  count(*) FILTER (WHERE kept) >= 3 AS keep
        |FROM r GROUP BY doc_id, source ORDER BY doc_id""".stripMargin,

    "q_dup_rate_by_source" ->
      """WITH c AS (
        |  SELECT source, md5(text) AS h FROM documents
        |  UNION ALL
        |  SELECT source, md5(text) AS h FROM documents WHERE doc_id % 7 > doc_id % 20)
        |SELECT source, count(*) AS docs, count(DISTINCT h) AS uniq,
        |  round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q_corpus_report" ->
      """WITH tokc AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, toks,
        |    sqrt(CAST(toks AS DOUBLE) / (SELECT sum(toks) FROM tokc)) AS rawW
        |  FROM tokc),
        |mix AS (
        |  SELECT source, toks,
        |    round(CAST(toks AS DOUBLE) / (SELECT sum(toks) FROM tokc), 6) AS share,
        |    round(rawW / (SELECT sum(rawW) FROM w), 6) AS weight,
        |    round(rawW / (SELECT sum(rawW) FROM w) * 1000000 / toks, 4) AS epochs
        |  FROM w),
        |tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT source, tok, count(*) AS n FROM tok GROUP BY 1, 2),
        |rk AS (SELECT source, n,
        |         row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS r
        |       FROM cnt),
        |zipf AS (
        |  SELECT source,
        |    round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4) AS zipf_slope,
        |    round(regr_r2(ln(CAST(n AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4) AS zipf_r2
        |  FROM rk WHERE r <= 50 GROUP BY source),
        |t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT DISTINCT source, array_to_string(toks[i : i + 7], ' ') AS g
        |      FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)),
        |m AS (SELECT source, count(*) OVER (PARTITION BY g) AS ns FROM g),
        |leak AS (
        |  SELECT source,
        |    round(CAST(count(*) FILTER (WHERE ns > 1) AS DOUBLE) / count(*), 6) AS leak_ratio
        |  FROM m GROUP BY source),
        |dup AS (
        |  SELECT source, count(*) AS docs,
        |    round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6) AS dup_rate
        |  FROM documents GROUP BY source)
        |SELECT mix.source, docs, toks, share, weight, epochs,
        |       zipf_slope, zipf_r2, leak_ratio, dup_rate
        |FROM mix JOIN zipf ON mix.source = zipf.source
        |         JOIN leak ON mix.source = leak.source
        |         JOIN dup ON mix.source = dup.source
        |ORDER BY mix.source""".stripMargin,
  )
}
