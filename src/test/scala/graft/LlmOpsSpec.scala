package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the oracle-less LLM-pipeline operators: the DuckDB
  * gate cannot cover engine-specific hashing (xxhash64, HLL), so recall /
  * accuracy properties are asserted here instead.
  */
class LlmOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds every planted near-duplicate pair") {
    // The derived corpus plants doc_id ↔ doc_id+1_000_000 near-dups with
    // shingle Jaccard ≥ 0.5; banding (4 bands × 4 rows) must surface
    // essentially all of them, and every emitted pair is jaccard-verified.
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = Tables.documents(spark, sf).count()
    val planted = pairs.count { case (a, b) => b == a + 1000000 }
    assert(planted >= (nDocs * 0.8).toLong,
      s"LSH recall too low: $planted of $nDocs planted pairs found")
  }

  test("minhash banding dial: 8x2 banding recalls at least as much as the declared 4x4") {
    import graft.operators.DedupOps
    // 1-(1-j^r)^b is pointwise higher for more, narrower bands; the
    // candidate volume is the price. Both runs share hashes (k=16), so
    // the comparison isolates banding.
    val nDocs = Tables.documents(spark, sf).count()
    def plantedRecall(bands: Int): Double = {
      val pairs = DedupOps.minhashPairs(spark, sf, k = 16, bands = bands)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      pairs.count { case (a, b) => b == a + 1000000 }.toDouble / nDocs
    }
    val r4 = plantedRecall(4)
    val r8 = plantedRecall(8)
    assert(r8 >= r4, s"narrower bands lost recall: 4x4=$r4, 8x2=$r8")
    assert(r8 >= 0.8, s"8x2 planted recall too low: $r8")
  }

  test("simhash near-dups include planted pairs, modest false-positive rate") {
    val rows = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = rows.count { case (a, b) => b == a + 1000000 }
    assert(planted > 0, "simhash found none of the planted near-dups")
    assert(rows.length < 10 * planted + 100,
      s"simhash too loose: ${rows.length} pairs for $planted planted")
  }

  test("contamination flags every benchmark excerpt's source; repetition matches driver recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // q_contamination: every %20 doc whose first-10-token excerpt has a
    // 5-gram must flag ITSELF (the excerpt came from it), and the
    // smallest implicated benchmark id can be at most itself
    val got = SparkEntry.queries("q_contamination")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val benchSources = docs.keys.filter(id =>
      id % 20 == 0 && docs(id).split(" ", -1).take(10).length >= 5)
    assert(benchSources.nonEmpty, "fixture defect: no benchmark excerpts exist")
    benchSources.foreach { id =>
      assert(got.contains(id), s"benchmark source $id not flagged as contaminated")
      assert(got(id) <= id, s"doc $id: first_bench_id ${got(id)} > itself")
    }
    // q_text_repetition: exact driver-side recompute of both fractions
    def frac(i: Long, u: Long): Option[Double] =
      if (u == 0) None else Some(((i * 20000 + u) / (2 * u)).toDouble / 10000.0)
    val rep = SparkEntry.queries("q_text_repetition")(spark, sf)
      .collect().map(r => r.getLong(0) -> (
        r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rep.keySet === docs.keySet)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val g3 = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
      val want = (toks.length.toLong,
        frac(toks.length.toLong - toks.distinct.length, toks.length.toLong),
        frac(g3.length.toLong - g3.distinct.length, g3.length.toLong))
      assert(rep(id) === want, s"doc $id repetition stats diverged")
    }
  }

  test("exact-substring dedup recovers every planted copy's full span length") {
    // the derived corpus pairs each doc with its first-(n-3)-tokens copy:
    // the maximal cross-doc repeated span for that pair is EXACTLY the
    // whole copy (n-3 tokens) — the operator must find it, never more
    // (the copy has no more tokens) and never fragmented
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length).toMap
    val got = SparkEntry.queries("q_dedup_substring")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    var checked = 0
    docs.foreach { case (id, n) =>
      val span = n - 3
      if (span >= 12) {
        val key = (id, id + 1000000L)
        assert(got.contains(key), s"planted copy pair $key (span $span) not found")
        assert(got(key) === span.toLong,
          s"pair $key: max_span ${got(key)} != planted span $span")
        checked += 1
      }
    }
    assert(checked > 0, "fixture defect: no doc long enough to plant a span")
  }

  test("persisted IVF index: stored search == in-memory search, postings pruned by cell") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    VectorOps.writeIvfIndex(e, cells = 8, dir = dir)
    val (cb, postings) = VectorOps.readIvfIndex(spark, dir)
    val stored = VectorOps.ivfSearch(cb, postings, queryId = 0, nprobe = 2, k = 10)
    // the same trained codebook is deterministic, so the in-memory path
    // must agree row for row
    val mem = VectorOps.knnIvfOn(e, nprobe = 2, k = 10,
      codebook = Some(VectorOps.trainCodebook(e, 8, 2)))
    val a = stored.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val b = mem.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(a === b, s"stored-index search diverged from in-memory: $a vs $b")
    // cell-partitioned layout: the probed cells arrive at runtime (from
    // the query's codebook ranking), so the pruning must be DYNAMIC —
    // Spark's dynamic partition pruning turns the cell equi-join into a
    // runtime partition filter on the postings scan, and only the probed
    // cells' files are read (what makes the stored index cheaper than a
    // full scan)
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "postings scan shows no dynamic partition pruning:\n" + plan.take(2000))
  }

  test("MMR at lambda=1 is exactly plain top-k; diversified picks break up a planted dup block") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // fixture: query q at vec_id 0; three near-identical top hits
    // (1, 2, 3) just off q; two moderately similar but mutually distant
    // vectors (4, 5); far tail (6, 7)
    def unit(v: Array[Double]) = { val s = math.sqrt(v.map(x => x * x).sum); v.map(_ / s).map(_.toFloat) }
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val rows = Seq(
      0L -> unit(e1),
      1L -> unit(Array(1.0, 0.09, 0.0, 0.0)),
      2L -> unit(Array(1.0, 0.10, 0.0, 0.0)),
      3L -> unit(Array(1.0, 0.11, 0.0, 0.0)),
      4L -> unit(Array(1.0, -0.5, 0.5, 0.0)),
      5L -> unit(Array(1.0, 0.5, -0.5, 0.0)),
      6L -> unit(Array(0.0, 0.0, 1.0, 0.0)),
      7L -> unit(Array(0.0, 0.0, 0.0, 1.0)))
    val df = rows.map { case (id, v) => (id, (id % 2).toInt, v) }
      .toDF("vec_id", "label", "embedding")
    def picks(lambda: Double): Seq[Long] =
      VectorOps.knnMmr(df, queryId = 0, candidates = 7, k = 4, lambda = lambda)
        .collect().map(_.getLong(1)).toSeq
    // exact top-4 computed in-test from the same vectors
    val qv = rows.head._2.map(_.toDouble)
    val exact = rows.tail
      .map { case (id, v) => (id, v.map(_.toDouble).zip(qv).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1)
    assert(picks(1.0) === exact, "lambda=1 must reduce MMR to plain top-k")
    assert(exact.take(3) === Seq(1L, 2L, 3L),
      "fixture broken: the planted near-dup block should fill the exact top-3")
    val div = picks(0.5)
    assert(div.head === exact.head, "MMR must open with the most relevant hit")
    assert(div(1) != 2L && div(1) != 3L,
      s"diversified second pick stayed inside the near-dup block: $div")
    assert(div.toSet != exact.toSet,
      "lambda=0.5 selection should differ from pure relevance on this fixture")
  }

  test("dedup clusters: fixpoint label propagation equals exact union-find components") {
    // Rebuild the SAME candidate edge set and compute components exactly
    // with union-find (roots merged min-ward, so each root IS the
    // component min); any divergence — non-convergence, asymmetric edges,
    // a premature fixpoint — fails here before the oracle sees it.
    val rows = SparkEntry.queries("q_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t = Tables.documents(spark, sf).where(col("doc_id") < 200)
      .select(col("doc_id"), col("source"), array_distinct(split(col("text"), " ")).as("toks"))
    val a = t.select(col("doc_id").as("da"), col("source"), col("toks").as("ta"))
    val b = t.select(col("doc_id").as("db"), col("source").as("source_b"), col("toks").as("tb"))
    val edges = a.join(b, col("source") === col("source_b") && col("da") < col("db"))
      .withColumn("jac", round(size(array_intersect(col("ta"), col("tb"))).cast("double") /
        size(array_union(col("ta"), col("tb"))), 4))
      .where(col("jac") >= 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    rows.foreach { case (node, comp, _) =>
      assert(comp == find(node), s"node $node: declared comp $comp != exact ${find(node)}")
    }
    val sizes = rows.groupBy(_._2).map { case (c, rs) => c -> rs.length.toLong }
    rows.foreach { case (_, comp, members) =>
      assert(members == sizes(comp), s"comp $comp: members col $members != ${sizes(comp)}")
    }
    assert(rows.exists(_._3 > 1), "fixture has no multi-member clusters to exercise merging")
  }

  test("dedup clusters: planted diameter-12 chain collapses to ONE component") {
    // The round-5 implementation ran a FIXED 8 rounds of one-hop
    // propagation and silently split any component of diameter > 8. This
    // corpus is a 13-document chain: doc i = "w{i} w{i+1} w{i+2}", so
    // consecutive docs share 2 of 4 distinct tokens (Jaccard exactly 0.5,
    // on-threshold edge) while docs two apart share 1 of 5 (0.2 — no
    // edge). The edge set is a pure path of diameter 12; pointer-doubling
    // fixpoint must collapse it to a single component labeled 0.
    import graft.operators.DedupOps
    import spark.implicits._
    val docs = (0 to 12)
      .map(i => (i.toLong, "chain", s"w$i w${i + 1} w${i + 2}"))
      .toDF("doc_id", "source", "text")
    val rows = DedupOps.dedupClusters(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 13)
    rows.foreach { case (node, comp, members) =>
      assert(comp == 0L, s"chain split: node $node landed in comp $comp")
      assert(members == 13L, s"node $node reports $members members, expected 13")
    }
  }

  test("persisted MinHash index: new batch dedups against corpus; appended docs participate") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.DataFrame
    // the incremental lifecycle: build the index once over the corpus,
    // then each snapshot probes batch-vs-index (never corpus-vs-corpus)
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val nDocs = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("mh_idx").toString
    DedupOps.writeMinhashIndex(spark, docs, dir)
    // batch = every corpus doc re-id'd +1M with the last 3 tokens cut —
    // the same near-dup planting recipe q_dedup_minhash's recall is
    // pinned on (shingle Jaccard >= 0.5 vs the source)
    def cut(df: DataFrame, shift: Long): DataFrame =
      df.select((col("doc_id") + shift).as("doc_id"), col("source"),
        expr("array_join(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 3, 1)), ' ')")
          .as("text"))
    val batch = cut(docs, 1000000L)
    val flagged = DedupOps.dedupAgainstIndex(spark, batch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = flagged.count { case (b, c) => b == c + 1000000L }
    assert(planted >= (nDocs * 0.8).toLong,
      s"incremental dedup found $planted of $nDocs planted near-dups")
    // append the batch; copies OF THE BATCH must now flag against the
    // appended ids — proof appended rows are band-compatible and probed
    DedupOps.appendToMinhashIndex(spark, batch, dir)
    val flagged2 = DedupOps.dedupAgainstIndex(spark, cut(batch, 1000000L), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vsAppended = flagged2.count { case (b, c) => b == c + 1000000L && c >= 1000000L }
    assert(vsAppended >= (nDocs * 0.8).toLong,
      s"only $vsAppended of $nDocs batch-2 docs matched their appended sources")
  }

  test("simhash pigeonhole banding is lossless: banded pairs == brute-force all-pairs") {
    import graft.operators.DedupOps
    // brute force straight from the SAME signatures the query bands
    val sigs = DedupOps.simhashSigs(spark, sf)
    val a = sigs.select(col("doc_id").as("da"), col("source"), col("sig").as("siga"))
    val b = sigs.select(col("doc_id").as("db"), col("source").as("source_b"),
      col("sig").as("sigb"))
    // same low-32 mask as the query: the signature's bit 31 rides in as
    // -2^31, so the long's high 32 bits are sign-extension noise
    val brute = a.join(b, col("source") === col("source_b") && col("da") < col("db"))
      .withColumn("hamming", expr("bit_count((siga ^ sigb) & 4294967295)"))
      .where(col("hamming") <= 2)
      .select("da", "db", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute,
      s"pigeonhole banding lost/invented pairs: only-brute=${(brute -- banded).take(5)} " +
        s"only-banded=${(banded -- brute).take(5)}")
    assert(banded.nonEmpty)
  }

  test("ngram-jaccard prefix filtering is exact: prefix-candidate pairs == brute-force all-pairs") {
    val brute = {
      // the pre-rewrite blocked all-pairs shape, inlined as the oracle here
      val base = Tables.documents(spark, sf).withColumn("toks", split(col("text"), " "))
      def sh(drop: Int) = {
        val last = s"size(toks) - ${2 + drop}"
        expr(s"CASE WHEN $last >= 1 THEN array_distinct(transform(sequence(1, $last), " +
          "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))) " +
          "ELSE array() END")
      }
      val u = base.select(col("doc_id"), col("source"), sh(0).as("sh"))
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"), col("source"), sh(3).as("sh")))
      val a = u.select(col("doc_id").as("da"), col("source"), col("sh").as("sha"))
      val b = u.select(col("doc_id").as("db"), col("source").as("source_b"), col("sh").as("shb"))
      a.join(b, col("source") === col("source_b") && col("da") < col("db"))
        .select(col("da"), col("db"),
          round(size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))), 4).as("jac"))
        .where(col("jac") >= 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val filtered = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(filtered === brute,
      s"prefix filtering lost/invented pairs: only-brute=${(brute -- filtered).take(5)} " +
        s"only-filtered=${(filtered -- brute).take(5)}")
    assert(filtered.nonEmpty)
  }

  test("containment prefix filter is exact: pair set equals brute-force, planted variants found") {
    // brute force all ordered same-source pairs (|A| <= |B|, da != db)
    // with the same integer-exact containment; the one-sided prefix
    // filter must lose and invent NOTHING
    val base = Tables.documents(spark, sf).withColumn("toks", split(col("text"), " "))
    def sh(drop: Int) = {
      val last = s"size(toks) - ${2 + drop}"
      expr(s"CASE WHEN $last >= 1 THEN array_distinct(transform(sequence(1, $last), " +
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))) " +
        "ELSE array() END")
    }
    val u = base.select(col("doc_id"), col("source"), sh(0).as("sh"))
      .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"), col("source"), sh(3).as("sh")))
      .where(size(col("sh")) > 0)
    val a = u.select(col("doc_id").as("da"), col("source"), col("sh").as("sha"))
    val b = u.select(col("doc_id").as("db"), col("source").as("source_b"), col("sh").as("shb"))
    val brute = a.join(b, col("source") === col("source_b") && col("da") =!= col("db") &&
        size(col("sha")) <= size(col("shb")))
      .select(col("da"), col("db"),
        expr("CAST((CAST(size(array_intersect(sha, shb)) AS BIGINT) * 20000" +
          " + size(sha)) div (2 * CAST(size(sha) AS BIGINT)) AS DOUBLE) / 10000.0").as("cont"))
      .where(col("cont") >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = SparkEntry.queries("q_dedup_containment")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered === brute,
      s"containment prefix filter lost/invented pairs: only-brute=${(brute -- filtered).take(5)} " +
        s"only-filtered=${(filtered -- brute).take(5)}")
    // every truncated variant's shingle set is a SUBSET of its original's
    // (3-grams of a token prefix), so containment variant->orig is exactly
    // 1.0 — all planted pairs must be present
    val planted = u.where(col("doc_id") >= 1000000).count()
    val found = filtered.count { case (da, db) => da == db + 1000000 }
    assert(found === planted, s"planted containment pairs missing: $found of $planted")
    // asymmetry: containment finds pairs whose Jaccard sits below the
    // near-dup threshold would be ideal to show on a richer fixture; at
    // minimum the emitted direction is always small-into-big
    val sizes = u.select(col("doc_id"), size(col("sh")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(filtered.forall { case (da, db) => sizes(da) <= sizes(db) })
  }

  test("IVF multi-probe: recall monotone in nprobe, exact at nprobe=|cells|") {
    import graft.operators.VectorOps
    // The driver's embeddings are ISOTROPIC-RANDOM — labels carry no
    // geometric signal (measured: mean same-label cos -0.012 vs
    // cross-label -0.002; the exact top-10 sims are ~0.27-0.33 spread
    // over all 10 labels), so NO partition scheme can beat ~nprobe/cells
    // recall here. What IS provable on this fixture: growing the probe
    // set can only improve recall (a true top-10 member in the candidate
    // pool can only be displaced by higher-sim vectors, of which there
    // are at most 9), and probing every cell degenerates to exact brute
    // force. The >= 0.9 recall claim is pinned on clustered data below.
    val exact = SparkEntry.queries("q_knn_cosine")(spark, sf)
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    def recallAt(np: Int): Double = {
      val got = VectorOps.knnIvf(spark, sf, nprobe = np)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2); val r10 = recallAt(10)
    assert(r1 <= r2 && r2 <= r10, s"recall not monotone in nprobe: $r1, $r2, $r10")
    assert(r10 === 1.0, s"nprobe=|cells| must equal exact brute force, got $r10")
    // the declared query IS knnIvf at nprobe=1 — pin that equivalence so
    // the multi-probe refactor can never drift the oracle-checked output
    val declared = SparkEntry.queries("q_knn_ivf")(spark, sf)
      .select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val p1 = VectorOps.knnIvf(spark, sf, nprobe = 1)
      .select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(p1 === declared, "nprobe=1 drifted from the declared q_knn_ivf output")
  }

  /** Deterministic clustered corpus — the data shape IVF is FOR: 8
    * near-orthogonal centers in 16 dims, members = normalize(center +
    * 0.8 * unit-noise) (cos ~0.78 to own center), label = cluster id so
    * the per-label codebook is the true structure. Returns the DataFrame
    * and the driver-side vectors for exact brute-force oracles. */
  private def clusteredCorpus(perCluster: Int = 40)
      : (org.apache.spark.sql.DataFrame, Map[Long, Array[Double]]) = {
    import spark.implicits._
    val dim = 16; val nClusters = 8
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = i % nClusters
      val noise = unit(Array.fill(dim)(rnd.nextGaussian()))
      val v = unit(centers(c).zip(noise).map { case (a, b) => a + 0.8 * b })
      (i.toLong, c.toString, v.map(_.toFloat))
    }
    (rows.toDF("vec_id", "label", "embedding"),
      rows.map(r => r._1 -> r._3.map(_.toDouble)).toMap)
  }

  /** Exact top-k neighbor ids of `qid`, driver brute force. */
  private def exactTopK(vecs: Map[Long, Array[Double]], qid: Long, k: Int,
      among: Long => Boolean = _ => true): Seq[Long] = {
    val q = vecs(qid)
    vecs.toSeq.filter { case (id, _) => id != qid && among(id) }
      .map { case (id, v) => (v.zip(q).map { case (a, b) => a * b }.sum, id) }
      .sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)
  }

  test("IVF multi-probe: recall@10 >= 0.9 at nprobe=2 when cells track real cluster structure") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    val (e, vecs) = clusteredCorpus()
    val exact = exactTopK(vecs, 0L, 10).toSet
    def recallAt(np: Int): Double = {
      val got = VectorOps.knnIvfOn(e, nprobe = np)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2)
    assert(r2 >= 0.9, s"recall@10 at nprobe=2 was $r2 on clustered data")
    assert(r2 >= r1, s"nprobe=2 recall $r2 below nprobe=1 recall $r1")
  }

  test("ivfSearchBatch: per-query equals ivfSearch; batch recall >= 0.9; one DPP-pruned scan") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    val (e, vecs) = clusteredCorpus()
    val dir = java.nio.file.Files.createTempDirectory("ivf_batch").toString
    VectorOps.writeIvfIndex(e, cells = 8, dir = dir)
    val (cb, postings) = VectorOps.readIvfIndex(spark, dir)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    // query table read from storage (the realistic shape — and what lets
    // the DPP heuristic see a selective filtered scan on the query side)
    val queries = postings.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding"))
    val batch = VectorOps.ivfSearchBatch(cb, postings, queries, nprobe = 2, k = 10)
    val rows = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
    // per-query result set equals the single-query path's, row for row
    qids.foreach { q =>
      val fromBatch = rows.filter(_._1 == q).sortBy(_._4).map(r => (r._2, r._3)).toSeq
      val single = VectorOps.ivfSearch(cb, postings, queryId = q, nprobe = 2, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(fromBatch === single, s"batch result for qid=$q diverged from ivfSearch")
    }
    // recall vs exact brute force, averaged over the batch
    val recalls = qids.map { q =>
      val exact = exactTopK(vecs, q, 10).toSet
      val got = rows.filter(_._1 == q).map(_._2).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"batch recall@10 at nprobe=2 was $mean ($recalls)")
    // the whole batch is served by ONE DPP-pruned postings scan
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "batch postings scan shows no dynamic partition pruning:\n" + plan.take(2000))
    // and the declared query returns k rows per query at sf
    val declared = SparkEntry.queries("q_knn_ivf_batch")(spark, sf).collect()
    assert(declared.nonEmpty)
    val perQ = declared.groupBy(_.getLong(0)).map(_._2.length).toSet
    assert(perQ === Set(5), s"declared q_knn_ivf_batch per-query row counts: $perQ")
  }

  test("trained IVF codebook: clustered-corpus recall >= per-label codebook at equal nprobe") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    // The unsupervised quantizer must rediscover what the labels hand the
    // supervised codebook for free. Deterministic end to end: hash-picked
    // seeds, 6dp-rounded normalized centroids.
    val (e, vecs) = clusteredCorpus()
    val exact = exactTopK(vecs, 0L, 10).toSet
    def recall(cb: Option[org.apache.spark.sql.DataFrame]): Double = {
      val got = VectorOps.knnIvfOn(e, nprobe = 2, codebook = cb)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val perLabel = recall(None)
    val trained = recall(Some(VectorOps.trainCodebook(e, k = 8)))
    assert(trained >= perLabel,
      s"trained codebook recall $trained below per-label $perLabel at nprobe=2")
    assert(trained >= 0.9, s"trained codebook recall too low: $trained")
  }

  test("ANN similarity join: recall >= 0.9 vs exact same-label top-3 on clustered corpus") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    val (e, vecs) = clusteredCorpus()
    // exact same-label top-3 pairs, driver brute force (320 x ~40 dots)
    val label = (id: Long) => (id % 8).toString
    val exact = vecs.keys.toSeq.flatMap { va =>
      exactTopK(vecs, va, 3, among = id => label(id) == label(va)).map(vb => (va, vb))
    }.toSet
    val got = VectorOps.simJoinTopkAnn(e, cells = 8, nprobe = 2, k = 3)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN sim-join recall vs exact top-3 was $recall")
  }

  test("PQ/ADC kNN: recall >= 0.9 on clustered data, monotone in the rerank dial") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    // 16 dims -> m=4 subspaces x 4 dims, ks=8 cells each: 3-bit codes.
    // ADC ranks by table lookups only; the exact rerank recovers the
    // true order among the top-R candidates, so recall is monotone in R
    // (candidates(R1) is a prefix of candidates(R2) under the same ADC
    // ordering) and high once R comfortably covers the query's cluster.
    val (e, vecs) = clusteredCorpus()
    val exact = exactTopK(vecs, 0L, 10).toSet
    def recallAt(r: Int): Double = {
      val got = VectorOps.knnPqOn(e, m = 4, ks = 8, k = 10, rerank = r)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r10 = recallAt(10); val r50 = recallAt(50)
    assert(r50 >= r10, s"recall not monotone in rerank: R=10 -> $r10, R=50 -> $r50")
    assert(r50 >= 0.9, s"PQ recall@10 with rerank=50 was $r50 on clustered data")
  }

  test("PQ index persists: parquet round trip searches identically to the in-memory index") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    // train-once/search-many: the stored index must carry everything the
    // search needs (self-describing subvector length via size(centroid))
    // and reproduce the in-memory search bit-for-bit — same codebooks,
    // same codes, same ADC tables.
    val (e, _) = clusteredCorpus()
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val (cb, codes) = VectorOps.pqIndex(e, m = 4, ks = 8)
    val direct = VectorOps.pqSearch(cb, codes, e, k = 10, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    VectorOps.writePqIndex(e, m = 4, ks = 8, dir)
    val (cb2, codes2) = VectorOps.readPqIndex(spark, dir)
    val stored = VectorOps.pqSearch(cb2, codes2, e, k = 10, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(stored === direct,
      "search over the persisted index drifted from the in-memory index")
    assert(stored.nonEmpty)
  }

  test("IVFADC: recall >= 0.9 at nprobe=2/rerank=100 on clustered data; stored == in-memory") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    // The composed index must keep the recall of its parts: coarse probe
    // bounds the scan, residual-PQ ADC bounds the bytes, the exact rerank
    // recovers true order among the survivors. 16 dims -> m=4 x 4-dim
    // subspaces, ks=8 residual cells, 8 coarse cells (true structure).
    val (e0, vecs) = clusteredCorpus()
    // the corpus rides as parquet: a LocalRelation fixture would constant-
    // fold the query's vec_id filter away and DPP (asserted below) never
    // sees a selective predicate — parquet is also the deployment shape
    val corpusDir = java.nio.file.Files.createTempDirectory("ivfpq_corpus").toString
    e0.write.mode("overwrite").parquet(corpusDir)
    val e = spark.read.parquet(corpusDir)
    val exact = exactTopK(vecs, 0L, 10).toSet
    val (coarse, pqcb, codes) = VectorOps.ivfPqIndex(e, cells = 8, m = 4, ks = 8)
    val direct = VectorOps.ivfPqSearch(coarse, pqcb, codes, e,
        nprobe = 2, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val recall = exact.intersect(direct.map(_._1).toSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVFADC recall@10 at nprobe=2/rerank=100 was $recall")
    // train-once/search-many: the persisted index (re-trained
    // deterministically by writeIvfPqIndex) must search bit-identically
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    VectorOps.writeIvfPqIndex(e, cells = 8, m = 4, ks = 8, dir = dir)
    val (c2, p2, k2) = VectorOps.readIvfPqIndex(spark, dir)
    val stored = VectorOps.ivfPqSearch(c2, p2, k2, e, nprobe = 2, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(stored === direct,
      "search over the persisted IVFADC index drifted from the in-memory index")
    // the probe must still prune the cell-partitioned codes store
    val plan = VectorOps.ivfPqSearch(c2, p2, k2, e, nprobe = 2, k = 10, rerank = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "IVFADC codes scan shows no dynamic partition pruning:\n" + plan.take(2000))
  }

  test("incremental append: frozen-codebook append == from-scratch encode of the full corpus") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    val (e, _) = clusteredCorpus()
    val base = e.where(col("vec_id") < 200)
    val batch = e.where(col("vec_id") >= 200)
    // IVF: build on the base, append the batch assign-only
    val ivfDir = java.nio.file.Files.createTempDirectory("ivf_app").toString
    VectorOps.writeIvfIndex(base, cells = 8, dir = ivfDir)
    VectorOps.appendToIvfIndex(spark, batch, ivfDir)
    val (cb, postings) = VectorOps.readIvfIndex(spark, ivfDir)
    assert(postings.count() === e.count(), "appended postings lost rows")
    val appended = VectorOps.ivfSearch(cb, postings, queryId = 0, nprobe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // from-scratch oracle: knnIvfOn assigns the FULL corpus against the
    // SAME frozen codebook in one pass — exactly what a from-scratch
    // build with that codebook would serve
    val fromScratch = VectorOps.knnIvfOn(e, nprobe = 2, k = 10, codebook = Some(cb))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(appended === fromScratch,
      s"append path diverged from from-scratch encode: $appended vs $fromScratch")
    assert(appended.nonEmpty)
    // PQ: same contract — append the batch to the base index, then
    // encode the whole corpus against the same frozen codebooks into a
    // fresh store and compare searches
    val pqDir = java.nio.file.Files.createTempDirectory("pq_app").toString
    VectorOps.writePqIndex(base, m = 4, ks = 8, dir = pqDir)
    VectorOps.appendToPqIndex(spark, batch, pqDir)
    val (pcb, codes) = VectorOps.readPqIndex(spark, pqDir)
    assert(codes.count() === e.count(), "appended codes lost rows")
    val viaAppend = VectorOps.pqSearch(pcb, codes, e, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val pqDir2 = java.nio.file.Files.createTempDirectory("pq_scratch").toString
    spark.read.parquet(s"$pqDir/codebooks").write.parquet(s"$pqDir2/codebooks")
    VectorOps.appendToPqIndex(spark, e, pqDir2) // full corpus, one encode pass
    val (pcb2, codes2) = VectorOps.readPqIndex(spark, pqDir2)
    val scratch = VectorOps.pqSearch(pcb2, codes2, e, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(viaAppend === scratch,
      "PQ append path diverged from a one-pass encode with the same codebooks")
    assert(viaAppend.nonEmpty)
    // IVFADC: same contract for the composed index — base + appended
    // batch must search identically to a one-pass encode of the full
    // corpus against the same frozen coarse + residual codebooks
    val adcDir = java.nio.file.Files.createTempDirectory("ivfpq_app").toString
    VectorOps.writeIvfPqIndex(base, cells = 8, m = 4, ks = 8, dir = adcDir)
    VectorOps.appendToIvfPqIndex(spark, batch, adcDir)
    val (ac, ap, ak) = VectorOps.readIvfPqIndex(spark, adcDir)
    assert(ak.count() === e.count(), "appended IVFADC codes lost rows")
    val adcAppend = VectorOps.ivfPqSearch(ac, ap, ak, e, nprobe = 2, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val adcDir2 = java.nio.file.Files.createTempDirectory("ivfpq_scratch").toString
    spark.read.parquet(s"$adcDir/coarse").write.parquet(s"$adcDir2/coarse")
    spark.read.parquet(s"$adcDir/pq_codebooks").write.parquet(s"$adcDir2/pq_codebooks")
    VectorOps.appendToIvfPqIndex(spark, e, adcDir2) // full corpus, one encode pass
    val (sc2, sp2, sk2) = VectorOps.readIvfPqIndex(spark, adcDir2)
    val adcScratch = VectorOps.ivfPqSearch(sc2, sp2, sk2, e, nprobe = 2, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(adcAppend === adcScratch,
      "IVFADC append path diverged from a one-pass encode with the same codebooks")
    assert(adcAppend.nonEmpty)
  }

  test("Ledger-driven index build resumes: only missing batches append, second pass is a no-op") {
    import graft.operators.VectorOps
    import graft.sources.Ledger
    graft.functions.GraftFunctions.register(spark)
    val (e, _) = clusteredCorpus()
    val base = e.where(col("vec_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("ivf_ledger").toString
    val ledgerPath = s"$dir/ledger"
    VectorOps.writeIvfIndex(base, cells = 8, dir = dir)
    Ledger.record(base.select("vec_id"), ledgerPath, "base")
    val target = e.select("vec_id")
    // resume step: the anti-join finds exactly the un-indexed vectors,
    // they are appended assign-only, and the ledger records them
    val n1 = Ledger.step(spark, target, Seq("vec_id"), ledgerPath, "b1") { todo =>
      VectorOps.appendToIvfIndex(spark, e.join(todo, "vec_id"), dir)
      todo
    }
    assert(n1 === e.count() - base.count(), s"resume step appended $n1 keys")
    // idempotence: a second step finds nothing missing and must not run
    val n2 = Ledger.step(spark, target, Seq("vec_id"), ledgerPath, "b2") { todo =>
      VectorOps.appendToIvfIndex(spark, e.join(todo, "vec_id"), dir)
      todo
    }
    assert(n2 === 0L, s"second resume step re-appended $n2 keys")
    val (_, postings) = VectorOps.readIvfIndex(spark, dir)
    assert(postings.count() === e.count(), "resumed index incomplete or duplicated")
  }

  test("PQ codes on the driver fixture: 20 results, positive overlap with exact top-20") {
    // Isotropic driver embeddings (no partition scheme helps here — see
    // the IVF note above): assert the contract shape and that the ADC
    // ordering carries real signal (nonzero overlap with exact), not a
    // recall bound the geometry cannot support. Deterministic: fixed
    // hash seeds and fixture.
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q_knn_cosine")(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = SparkEntry.queries("q_knn_pq")(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pq.size === 20)
    assert(exact.intersect(pq).nonEmpty, "PQ top-20 shares nothing with exact top-20")
  }

  test("SQ8 two-phase kNN: rerank recall >= 0.9 vs exact top-20") {
    // 500 vectors at sf0.01 vs a 100-candidate quantized pass: the int8
    // scan must rank the true top-20 inside its top-100 for the exact
    // rerank to recover them.
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q_knn_cosine")(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sq8 = SparkEntry.queries("q_knn_sq8")(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(sq8).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 rerank recall vs exact top-20 was $recall")
  }

  test("q_dedup_embed equals exact all-pairs, and the fixture invariant it rests on holds") {
    // Demoted-oracle guard (round 4): the LSH+refine output is compared
    // against an exact all-pairs join computed HERE, and the fixture
    // invariant (every cos>=0.99 pair is a bit-identical planted copy)
    // is asserted explicitly — if a fixture refresh ever plants a
    // genuine non-identical near-dup, this fails with a clear message
    // instead of a silent driver hash mismatch.
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val u = e.select(col("label"), col("vec_id"), col("embedding"))
      .unionByName(e.select(col("label"), (col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    val a = u.select(col("label"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = u.select(col("label").as("label_b"), col("vec_id").as("vb"), col("embedding").as("eb"))
    val exactPairs = a.join(b, col("label") === col("label_b") && col("va") < col("vb"))
      .withColumn("sim", round(expr("graft_dot(ea, eb)"), 6))
      .where(col("sim") >= 0.99)
    val nonIdentical = exactPairs.where(!(col("ea") === col("eb"))).count()
    assert(nonIdentical === 0,
      "fixture invariant BROKEN: a cos>=0.99 pair with non-identical embeddings exists; " +
        "LSH equality with the exact join is no longer guaranteed — review q_dedup_embed's tier")
    val exact = exactPairs.select("va", "vb", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = SparkEntry.queries("q_dedup_embed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exact,
      s"LSH+refine drifted from exact: only-exact=${(exact -- got).take(5)} " +
        s"only-got=${(got -- exact).take(5)}")
    assert(got.nonEmpty)
  }

  test("q_embed_dedup_clusters equals union-find over q_dedup_embed's pair graph") {
    graft.functions.GraftFunctions.register(spark)
    val rows = SparkEntry.queries("q_embed_dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = SparkEntry.queries("q_dedup_embed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && edges.nonEmpty)
    // union-find with min-root union: each component's root is its least
    // member — the cluster-id convention the view promises
    val parent = scala.collection.mutable.Map.empty[Long, Long] ++ rows.map(r => r._1 -> r._1)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = rows.map(r => r._1 -> find(r._1)).toMap
    val sizes = roots.values.toSeq.groupBy(identity).map { case (k, v) => k -> v.length }
    rows.foreach { case (id, cluster, members) =>
      assert(cluster === roots(id), s"vec $id in cluster $cluster, union-find says ${roots(id)}")
      assert(members === sizes(roots(id)).toLong)
    }
    // the planted +1e6 copies must land in their original's cluster, and
    // every corpus vector (original + copy) must appear exactly once
    assert(rows.exists(r => r._1 >= 1000000L && r._2 < 1000000L),
      "no planted copy clustered with its original")
    assert(rows.length === 2 * Tables.embeddings(spark, sf).count())
  }

  test("IVF top-10 has positive recall against exact brute-force top-10") {
    val exact = SparkEntry.queries("q_knn_cosine")(spark, sf)
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("q_knn_ivf")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.nonEmpty)
    // nprobe=1 over a 10-cell codebook: expect some but not necessarily
    // full overlap with the exact result.
    assert((exact & ivf).nonEmpty, s"IVF recall 0: exact=$exact ivf=$ivf")
  }

  test("approx_percentile within 5% of exact per group") {
    val sf01 = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q_agg_approx_percentile")(spark, sf01)
      .collect().map(r => r.getString(0) ->
        r.getString(1).split(",").map(_.toDouble)).toMap
    val exact = Tables.lineitem(spark, sf01)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, a) <- approx; (av, ev) <- a.zip(exact(k)))
      assert(math.abs(av - ev) / ev <= 0.05,
        s"group $k: approx $av vs exact $ev off by more than 5%")
  }

  test("approx_count_distinct within 15% of exact") {
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.15).toLong),
        s"$k: approx $a vs exact $e")
    }
  }

  test("dedup is idempotent: re-deduping the keepers changes nothing") {
    val once = SparkEntry.queries("q_dedup_exact")(spark, sf)
    assert(once.count() === once.select("h").distinct().count())
  }

  test("jaccard is bounded and symmetric by construction") {
    val j = SparkEntry.queries("q_jaccard_pairs")(spark, sf)
      .select("jac").collect().map(_.getDouble(0))
    assert(j.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("q_chunk_docs: exact cover — stride-prefix concatenation reconstructs every document") {
    // chunk i spans tokens [48i+1, min(n, 48i+64)]: taking the first 48
    // tokens of every chunk but ALL of the last one must rebuild the doc
    // verbatim — proves no token lost, none duplicated outside the
    // declared 16-token overlap, and chunk_idx dense from 0
    val chunks = SparkEntry.queries("q_chunk_docs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val ordered = cs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === (0L until ordered.length).toSeq,
        s"doc $id: chunk_idx not dense")
      assert(ordered.forall(_._4 <= 64), s"doc $id: chunk over budget")
      // a non-last chunk always has another start 48 ahead inside the
      // doc, so it carries at least 49 tokens (full 64 only when the
      // doc extends past its window)
      assert(ordered.init.forall(_._4 >= 49),
        s"doc $id: non-last chunk shorter than stride+1")
      val rebuilt = (ordered.init.map(_._3.split(" ").take(48).mkString(" ")) :+
        ordered.last._3).mkString(" ")
      assert(rebuilt === docs(id), s"doc $id: stride reconstruction diverged")
    }
  }

  test("q_sample_weighted: rates realized — integer copies exact, Bernoulli half within bounds") {
    val rows = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perDoc = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // epochs dense from 1 for every emitted doc
    perDoc.foreach { case ((id, src), epochs) =>
      assert(epochs === (1L to epochs.length).toSeq, s"doc $id/$src: epochs not dense")
    }
    val nPerSource = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate2(src: String) = 1 + src.drop(3).toLong % 4
    perDoc.foreach { case ((id, src), epochs) =>
      val base = rate2(src) / 2
      assert(epochs.length == base || epochs.length == base + 1,
        s"doc $id/$src: ${epochs.length} copies at rate2=${rate2(src)}")
    }
    // whole-rate sources are EXACT: every doc present with exactly
    // rate2/2 copies; fractional sources land within 4-sigma Bernoulli
    nPerSource.foreach { case (src, n) =>
      val emitted = rows.count(_._2 == src)
      val r2 = rate2(src)
      if (r2 % 2 == 0) assert(emitted === n * r2 / 2, s"$src: exact rate missed")
      else {
        val mean = n * r2 / 2.0
        val tol = 4 * math.sqrt(n * 0.25)
        assert(math.abs(emitted - mean) <= tol, s"$src: $emitted vs $mean outside 4σ")
      }
    }
    // deterministic across runs
    val again = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("q_shuffle_deterministic: a reproducible permutation with dense per-shard positions") {
    val once = SparkEntry.queries("q_shuffle_deterministic")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val again = SparkEntry.queries("q_shuffle_deterministic")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(once.toSeq === again.toSeq, "shuffle order must be run-stable")
    // permutation: every doc exactly once
    val allDocs = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(once.map(_._3).toSet === allDocs && once.length === allDocs.size)
    // positions dense 1..count within each shard
    once.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard: positions not dense")
    }
    // the order is hash-random, not id-order: adjacent positions in some
    // shard must not be adjacent doc_ids throughout
    val idOrdered = once.groupBy(_._1).values.forall { rows =>
      val ids = rows.sortBy(_._2).map(_._3)
      ids.zip(ids.drop(1)).forall { case (a, b) => a < b }
    }
    assert(!idOrdered, "hash order degenerated to doc_id order")
  }

  test("knnBruteForce: simd scan retrieves the scalar top-k up to 1e-5 near-ties") {
    import graft.operators.VectorOps
    val e = Tables.embeddings(spark, sf)
    val k = 20
    val scalar = VectorOps.knnBruteForce(e, queryId = 0, k = k).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val simd = VectorOps.knnBruteForce(e, queryId = 0, k = k, simd = true).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(scalar.length === k && simd.length === k)
    // membership may differ ONLY where the reassociated sum reorders a
    // near-tie: every id in the symmetric difference must score within
    // 1e-5 of the scalar boundary (k-th) score
    val boundary = scalar.last._2
    val scalarIds = scalar.map(_._1).toSet
    val simdIds = simd.map(_._1).toSet
    val diff = (scalarIds diff simdIds) union (simdIds diff scalarIds)
    if (diff.nonEmpty) {
      val sims = e.where(col("vec_id").isin(diff.toSeq: _*))
        .crossJoin(broadcast(e.where(col("vec_id") === 0).select(col("embedding").as("qv"))))
        .selectExpr("vec_id", "graft_dot(embedding, qv) AS s").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
      diff.foreach { id =>
        assert(math.abs(sims(id) - boundary) < 1e-5,
          s"vec $id left/entered top-$k but is ${math.abs(sims(id) - boundary)} from the boundary")
      }
    }
    // scores for shared members agree to the reassociation bound
    val simdById = simd.toMap
    scalar.filter(p => simdIds(p._1)).foreach { case (id, s) =>
      assert(math.abs(s - simdById(id)) <= 1e-5, s"vec $id score drift")
    }
  }

  test("ivfSearch simd: same single-pass contract as knnBruteForce, DPP preserved") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivf_simd").toString
    VectorOps.writeIvfIndex(e, cells = 8, dir = dir)
    val (cb, postings) = VectorOps.readIvfIndex(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val k = 10
    val exact = rows(VectorOps.ivfSearch(cb, postings, queryId = 0, nprobe = 2, k = k))
    // single-pass simd scoring (exact-rerank shapes measured SLOWER than
    // the plain exact scan and rejected — BASELINE r11): membership may
    // differ only at near-ties within the reassociation bound, the same
    // law knnBruteForce pins
    val viaSimd = rows(VectorOps.ivfSearch(cb, postings, queryId = 0, nprobe = 2,
      k = k, simd = true))
    assert(exact.length === k && viaSimd.length === k)
    val boundary = exact.last._2
    val diff = (exact.map(_._1).toSet diff viaSimd.map(_._1).toSet) union
      (viaSimd.map(_._1).toSet diff exact.map(_._1).toSet)
    val exactAll = rows(VectorOps.ivfSearch(cb, postings, queryId = 0, nprobe = 2,
      k = 1000)).toMap
    diff.foreach { id =>
      assert(math.abs(exactAll(id) - boundary) <= 1e-5,
        s"vec $id left/entered the simd top-$k but is ${math.abs(exactAll(id) - boundary)} " +
          "from the boundary — beyond the reassociation near-tie bound")
    }
    // the probed-cell pruning survives the simd expression swap
    val plan = VectorOps.ivfSearch(cb, postings, queryId = 0, nprobe = 2,
      k = k, simd = true).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "simd postings scan lost dynamic partition pruning:\n" + plan.take(2000))
  }

  // ------------------------------------------------------------------
  // Index-backed hybrid retrieval (r18): the indexed composition must
  // reproduce the scan-path q_hybrid_rrf exactly (full-probe dense leg
  // + TextIndex lexical leg + shared rrfFuse arithmetic), and the batch
  // fuse must equal the single-query fuse per qid.
  // ------------------------------------------------------------------

  // ------------------------------------------------------------------
  // IVF codebook drift monitor (r18): frozen-codebook appends degrade
  // recall silently under distribution shift; the build-time distortion
  // snapshot + ivfDriftStats must trip on a planted shift and stay
  // quiet on an in-distribution append.
  // ------------------------------------------------------------------

  test("ivfDriftStats: planted distribution shift trips the flag; in-distribution append does not") {
    import graft.operators.VectorOps
    import graft.sources.OpenProbe
    import spark.implicits._
    val dim = 16
    // deterministic clustered corpus: 4 clusters around axes e0..e3,
    // small jitter in dims 4..7, L2-normalized
    def clustered(id: Long): (Long, String, Array[Float]) = {
      val c = (id % 4).toInt
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v(4 + ((id / 4) % 4).toInt) = 0.15f * (1 + (id % 3)).toFloat / 3f
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      (id, s"c$c", v.map(_ / n))
    }
    // shifted batch: mass on axes e8..e11 — far from every trained cell
    def shifted(id: Long): (Long, String, Array[Float]) = {
      val v = new Array[Float](dim)
      v(8 + (id % 4).toInt) = 1.0f
      (id, "drift", v)
    }
    val base = (0L until 200L).map(clustered).toDF("vec_id", "label", "embedding")

    val inDist = java.nio.file.Files.createTempDirectory("ivfdrift_in").toString
    VectorOps.writeIvfIndex(base, cells = 4, dir = inDist)
    val d0 = VectorOps.ivfDriftStats(spark, inDist).get
    assert(!d0.retrainRecommended, s"fresh index must not recommend retrain: $d0")
    VectorOps.appendToIvfIndex(spark,
      (1000L until 1100L).map(clustered).toDF("vec_id", "label", "embedding"), inDist)
    val d1 = VectorOps.ivfDriftStats(spark, inDist).get
    assert(d1.nNow === 300L)
    assert(!d1.retrainRecommended,
      s"in-distribution append tripped the drift flag: $d1")

    val drifted = java.nio.file.Files.createTempDirectory("ivfdrift_out").toString
    VectorOps.writeIvfIndex(base, cells = 4, dir = drifted)
    VectorOps.appendToIvfIndex(spark,
      (2000L until 2100L).map(shifted).toDF("vec_id", "label", "embedding"), drifted)
    val d2 = VectorOps.ivfDriftStats(spark, drifted).get
    assert(d2.retrainRecommended,
      s"planted distribution shift did not trip the drift flag: $d2")
    assert(d2.meanNow > d2.meanBuild, s"shifted mean must rise: $d2")

    // the OpenProbe face: fence + drift in one status
    val o = OpenProbe.openIvf(spark, drifted)
    assert(o.rebuildComplete && o.retrainRecommended)
    val oIn = OpenProbe.openIvf(spark, inDist)
    assert(oIn.rebuildComplete && !oIn.retrainRecommended)
    // a broken fence reports no drift instead of noise
    graft.sources.GenStamp.beginRebuild(spark, drifted)
    val oBroken = OpenProbe.openIvf(spark, drifted)
    assert(!oBroken.rebuildComplete && oBroken.drift.isEmpty)
  }

  test("q_hybrid_rrf_indexed equals the scan-path q_hybrid_rrf exactly") {
    import graft.operators.VectorOps
    val scan = VectorOps.queries("q_hybrid_rrf")(spark, sf).collect().toSeq
    val idx = VectorOps.queries("q_hybrid_rrf_indexed")(spark, sf).collect().toSeq
    assert(idx === scan,
      "indexed hybrid retrieval diverged from the scan path")
    assert(idx.length === 10)
    // the two queries share one oracle by construction
    assert(VectorOps.oracle("q_hybrid_rrf_indexed") === VectorOps.oracle("q_hybrid_rrf"))
  }

  test("rrfFuseBatch equals rrfFuse qid by qid, including one-leg-only docs") {
    import graft.operators.VectorOps
    import spark.implicits._
    val denseB = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 10L, 2))
      .toDF("qid", "id", "vrank")
    val lexB = Seq((1L, 11L, 1), (1L, 12L, 2), (2L, 21L, 1))
      .toDF("qid", "id", "lrank")
    val batch = VectorOps.rrfFuseBatch(denseB, lexB, 10).collect()
      .groupBy(_.getLong(0))
    for (qid <- Seq(1L, 2L)) {
      val single = VectorOps.rrfFuse(
        denseB.where(col("qid") === qid).select("id", "vrank"),
        lexB.where(col("qid") === qid).select("id", "lrank"), 10)
        .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq
      val got = batch(qid).map(r => (r.get(1), r.get(2), r.get(3), r.get(4))).toSeq
      assert(got === single, s"qid $qid batch fuse diverged from single fuse")
    }
  }

  // ------------------------------------------------------------------
  // IVF retrain executor (r19): ivfDriftStats only FLAGS decay;
  // retrainIvfIndex must act on it — flag clears, shifted queries'
  // recall recovers, tombstones fold, and the monitor face is a no-op
  // when nothing drifted.
  // ------------------------------------------------------------------

  test("retrainIvfIndex heals planted drift: flag clears, shifted recall recovers, tombstones fold") {
    import graft.operators.VectorOps
    import spark.implicits._
    val dim = 16
    def clustered(id: Long): (Long, String, Array[Float]) = {
      val c = (id % 4).toInt
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v(4 + ((id / 4) % 4).toInt) = 0.15f * (1 + (id % 3)).toFloat / 3f
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      (id, s"c$c", v.map(_ / n))
    }
    // drifted family: dominant similarity axis 8+g (the GROUP), small
    // scatter on axis id%4 (which is where the OLD centroids live, so
    // pre-retrain cell assignment follows the scatter, splitting each
    // group across cells), per-member magnitude variation so no two
    // vectors are identical. 3 members per (group, scatter) cell-mate
    // set -> nprobe=1 finds at most the 2 same-scatter mates of the 4
    // same-group true neighbors before retrain.
    def shifted(id: Long): (Long, String, Array[Float]) = {
      val g = ((id / 4) % 4).toInt
      val s = (id % 4).toInt
      val m = 0.2f + 0.1f * ((id / 16) % 3).toFloat
      val v = new Array[Float](dim)
      v(8 + g) = 1.0f
      v(s) = m
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      (id, s"d$g", v.map(_ / n))
    }
    val base = (0L until 200L).map(clustered).toDF("vec_id", "label", "embedding")
    val drift = (2000L until 2048L).map(shifted)
    val dir = java.nio.file.Files.createTempDirectory("ivfretrain").toString
    VectorOps.writeIvfIndex(base, cells = 4, dir = dir)
    VectorOps.appendToIvfIndex(spark,
      drift.toDF("vec_id", "label", "embedding"), dir)
    // a few base rows tombstoned: the retrain must fold them
    VectorOps.deleteFromIvfIndex(spark, Seq(0L, 1L, 2L).toDF("vec_id"), dir)
    assert(VectorOps.ivfDriftStats(spark, dir).get.retrainRecommended,
      "planted shift must trip the monitor before the retrain")

    // recall@4 of nprobe=1 probes vs exact kNN over the LIVE postings,
    // averaged over 8 shifted queries
    def recallAt4(queries: Seq[Long]): Double = {
      val (cb, postings) = VectorOps.readIvfIndex(spark, dir)
      val all = postings.localCheckpoint(true)
      queries.map { q =>
        val approx = VectorOps.ivfSearch(cb, all, queryId = q, nprobe = 1, k = 4)
          .collect().map(_.getLong(0)).toSet
        val qv = all.where(col("vec_id") === q).select("embedding")
        val exact = all.where(col("vec_id") =!= q)
          .crossJoin(broadcast(qv.select(col("embedding").as("qv"))))
          .withColumn("sim", round(expr("graft_dot(embedding, qv)"), 6))
          .orderBy(col("sim").desc, col("vec_id").asc).limit(4)
          .collect().map(_.getLong(0)).toSet
        (approx intersect exact).size.toDouble / 4.0
      }.sum / queries.size
    }
    val qids = Seq(2000L, 2005L, 2010L, 2015L, 2021L, 2026L, 2031L, 2036L)
    val recallPre = recallAt4(qids)

    val k = VectorOps.retrainIvfIndex(spark, dir, cells = Some(16), iters = 5)
    assert(k === 16)
    val d = VectorOps.ivfDriftStats(spark, dir).get
    assert(!d.retrainRecommended,
      s"retrain must clear the drift flag (snapshot refreshed): $d")
    assert(d.nNow === 200L + 48L - 3L, "retrain must fold the tombstones")
    assert(!graft.sources.Tombstones.exists(spark, dir),
      "retrain must clear the folded tombstone table")
    val (_, postings) = VectorOps.readIvfIndex(spark, dir)
    assert(postings.where(col("vec_id").isin(0L, 1L, 2L)).count() === 0L)

    val recallPost = recallAt4(qids)
    assert(recallPost > recallPre,
      s"retrain did not recover shifted-query recall: pre=$recallPre post=$recallPost")
    assert(recallPost >= 0.9,
      s"post-retrain nprobe=1 recall on the shifted family too low: $recallPost (pre=$recallPre)")

    // the one-call monitor face: nothing drifted now, so it must not churn
    assert(!VectorOps.retrainIvfIndexIfDrifted(spark, dir))
  }

  // Staged retrain crash windows (r19 verdict, next-round #1): an
  // unattended retrainOnDrift loop must never brick the index. Window 1
  // (stage + manifest committed, marker down) leaves the SERVING index
  // untouched; window 2 (marker up, swap not run) heals forward from
  // the complete stage at the next mutator's head.
  test("staged retrain: pre-marker crash leaves the index serving, debris discarded; post-marker heals forward") {
    import graft.operators.VectorOps
    import spark.implicits._
    val dim = 8
    def vec(id: Long): (Long, String, Array[Float]) = {
      val v = new Array[Float](dim)
      v((id % 4).toInt) = 1.0f
      v(4 + ((id / 4) % 4).toInt) = 0.2f * (1 + (id % 3)).toFloat / 3f
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      (id, s"g${id % 4}", v.map(_ / n))
    }
    val rows = (0L until 96L).map(vec).toDF("vec_id", "label", "embedding")
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)

    // ---- window 1: marker never rose ----
    val d1 = java.nio.file.Files.createTempDirectory("ivfretrain_w1").toString
    VectorOps.writeIvfIndex(rows, cells = 4, dir = d1)
    VectorOps.deleteFromIvfIndex(spark, Seq(5L).toDF("vec_id"), d1)
    val served = VectorOps.readIvfIndex(spark, d1)._2
      .select("vec_id").collect().map(_.getLong(0)).toSet
    VectorOps.failDuringRetrain = 1
    intercept[IllegalStateException](VectorOps.retrainIvfIndex(spark, d1))
    // the serving index never stopped serving: same live rows, victim
    // still tombstone-hidden, monitor still readable
    assert(VectorOps.readIvfIndex(spark, d1)._2
      .select("vec_id").collect().map(_.getLong(0)).toSet === served,
      "window-1 crash must not affect the serving index")
    assert(VectorOps.ivfDriftStats(spark, d1).isDefined)
    assert(fs.exists(p(s"$d1/_retrain_stage")) && fs.exists(p(s"$d1/_retrain_manifest")),
      "window-1 fixture must actually leave stage debris")
    // the next mutator's head-heal discards the debris (marker down)
    VectorOps.deleteFromIvfIndex(spark, Seq(6L).toDF("vec_id"), d1)
    assert(!fs.exists(p(s"$d1/_retrain_stage")) && !fs.exists(p(s"$d1/_retrain_manifest")),
      "window-1 debris must be discarded, not published")
    // and a re-run retrain completes normally, folding BOTH tombstones
    VectorOps.retrainIvfIndex(spark, d1)
    val live1 = VectorOps.readIvfIndex(spark, d1)._2
    assert(live1.where(col("vec_id").isin(5L, 6L)).count() === 0L)
    assert(live1.count() === 94L)
    assert(!graft.sources.Tombstones.exists(spark, d1))

    // ---- window 2: marker up, swap not started ----
    val d2 = java.nio.file.Files.createTempDirectory("ivfretrain_w2").toString
    VectorOps.writeIvfIndex(rows, cells = 4, dir = d2)
    VectorOps.deleteFromIvfIndex(spark, Seq(7L).toDF("vec_id"), d2)
    VectorOps.failDuringRetrain = 2
    intercept[IllegalStateException](VectorOps.retrainIvfIndex(spark, d2))
    // readers fail LOUDLY (never a silent wrong answer)...
    val e = intercept[IllegalArgumentException](VectorOps.readIvfIndex(spark, d2))
    assert(e.getMessage.contains("writeIvfIndex"))
    // ...and the unattended loop's next drift consult heals forward
    // instead of wedging (false: freshly retrained, nothing drifted)
    assert(!VectorOps.retrainIvfIndexIfDrifted(spark, d2))
    val (cb2, live2) = VectorOps.readIvfIndex(spark, d2)
    assert(live2.where(col("vec_id") === 7L).count() === 0L,
      "healed swap must publish the stage with the tombstone folded")
    assert(live2.count() === 95L)
    assert(!graft.sources.Tombstones.exists(spark, d2),
      "healed swap must clear the folded tombstones")
    assert(!fs.exists(p(s"$d2/_retrain_stage")) && !fs.exists(p(s"$d2/_retrain_manifest")))
    // drift snapshot consistent with what readers see
    val bs2 = spark.read.parquet(s"$d2/buildstats").head()
    assert(bs2.getLong(0) === 95L,
      s"buildstats must describe the published postings, got ${bs2.getLong(0)}")
    // Lloyd's may drop an empty cell, so the retrained codebook is
    // bounded by, not equal to, the requested count — what the heal
    // must preserve is a READABLE codebook matching the postings
    val cells2 = cb2.select("cell").collect().map(_.getString(0)).toSet
    val postCells2 = live2.select("cell").distinct()
      .collect().map(_.getString(0)).toSet
    assert(cells2.nonEmpty && postCells2.subsetOf(cells2),
      s"healed postings reference cells missing from the codebook: " +
        s"${postCells2 -- cells2}")

    // resurrection race closed: a tombstone issued OVER a window-2 crash
    // must survive the heal (deleteFromIvfIndex heals first, so the
    // stage's fold can never clear an unfolded tombstone)
    val d3 = java.nio.file.Files.createTempDirectory("ivfretrain_w3").toString
    VectorOps.writeIvfIndex(rows, cells = 4, dir = d3)
    VectorOps.failDuringRetrain = 2
    intercept[IllegalStateException](VectorOps.retrainIvfIndex(spark, d3))
    VectorOps.deleteFromIvfIndex(spark, Seq(9L).toDF("vec_id"), d3)
    val live3 = VectorOps.readIvfIndex(spark, d3)._2
    assert(live3.where(col("vec_id") === 9L).count() === 0L,
      "a delete issued over a crashed retrain must not be resurrected by the heal")
    assert(live3.count() === 95L)
  }

  // ------------------------------------------------------------------
  // Filtered INDEXED retrieval (r19): the predicate lands inside the
  // probed cells BEFORE top-k — k results are k post-filter survivors.
  // ------------------------------------------------------------------

  test("q_knn_filtered_indexed equals the scan-path q_knn_filtered exactly") {
    import graft.operators.VectorOps
    val scan = VectorOps.queries("q_knn_filtered")(spark, sf).collect().toSeq
    val idx = VectorOps.queries("q_knn_filtered_indexed")(spark, sf).collect().toSeq
    assert(idx === scan, "filtered indexed retrieval diverged from the scan path")
    assert(idx.length === 10)
    assert(VectorOps.oracle("q_knn_filtered_indexed") === VectorOps.oracle("q_knn_filtered"))
  }

  test("filtered probes return k post-filter survivors; batch + hybrid filters compose") {
    import graft.operators.VectorOps
    import graft.sources.TextIndex
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("fidx").toString
    VectorOps.writeIvfIndex(e, cells = 4, dir = s"$base/ivf")
    val (cb, postings) = VectorOps.readIvfIndex(spark, s"$base/ivf")
    // reduced probe, selective predicate: every result satisfies it and
    // there are still k of them (no silent under-fill from post-filtering)
    val qLabel = e.where(col("vec_id") === 0).select("label").head().getInt(0)
    val r = VectorOps.ivfSearch(cb, postings, queryId = 0, nprobe = 2, k = 10,
      filter = Some(col("label") =!= lit(qLabel))).collect()
    assert(r.length === 10, s"pre-filtering must keep the k contract, got ${r.length}")
    assert(r.forall(_.getInt(1) != qLabel))
    // the filtered probe equals the unfiltered probe over pre-filtered
    // postings (query row retained for the cell ranking)
    val pre = postings.where(col("label") =!= lit(qLabel) || col("vec_id") === 0)
    val twin = VectorOps.ivfSearch(cb, pre, queryId = 0, nprobe = 2, k = 10).collect()
    assert(r.toSeq === twin.toSeq)

    // lexical leg: filtered == unfiltered ranking restricted, re-cut at k
    // (df/N/avgdl stay corpus-wide — the Lucene filter-query convention)
    val docs = Tables.documents(spark, sf)
    TextIndex.build(spark, s"$base/tidx", docs)
    val qs = Seq((1L, "query"), (1L, "join"), (2L, "spark")).toDF("qid", "term")
    val allowed = docs.where(col("doc_id") % 2 === 0).select("doc_id")
    val filtered = TextIndex.searchBatchBm25(spark, s"$base/tidx", qs, 5,
      allowedIds = Some(allowed)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val full = TextIndex.searchBatchBm25(spark, s"$base/tidx", qs, 100000).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .filter(t => t._2 % 2 == 0)
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((q, id, sc), i) => (q, i + 1, id, sc) }
      }.sortBy(t => (t._1, t._2))
    assert(filtered === full,
      "filtered batch BM25 != unfiltered ranking restricted to allowed ids")

    // hybrid: both legs filtered, fusion unchanged — every fused id is allowed
    val denseQ = e.where(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding"))
    val lexQ = Seq((0L, "query"), (0L, "join")).toDF("qid", "term")
    val allowedV = e.where(col("vec_id") % 2 === 0).select("vec_id")
    val hy = VectorOps.hybridSearchBatch(spark, s"$base/tidx", s"$base/ivf",
      denseQ, lexQ, k = 10, nprobe = 64, docIds = Some(allowedV)).collect()
    assert(hy.nonEmpty)
    assert(hy.forall(_.getLong(1) % 2 == 0),
      "hybrid docIds filter leaked a disallowed id through a leg")
  }
}
