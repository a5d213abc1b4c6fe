package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws over random inputs (SURVEY §5.4) — the offline stand-in
  * for a SQL-logic-test corpus. Each law is one that distribution must
  * preserve: partial+final aggregation, repartition-invariance,
  * sessionization monotonicity, ledger set algebra, dot symmetry.
  * (Raw scalacheck runner — the scalatest bridge artifact is not in the
  * offline cache.)
  */
class PropertiesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(prop: Prop, tests: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  test("sum/count survive any repartitioning (partial+final agg law)") {
    import spark.implicits._
    val rows = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(-100.0, 100.0)))
    check(Prop.forAll(rows, Gen.chooseNum(1, 9)) { (data, parts) =>
      val df = data.toDF("k", "v")
      def agg(d: org.apache.spark.sql.DataFrame) =
        d.groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 6).as("s"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      agg(df) == agg(df.repartition(math.max(parts, 1)))
    })
  }

  test("sessionize: session count is monotone non-increasing in the gap") {
    import spark.implicits._
    val times = Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L))
    check(Prop.forAll(times) { ts =>
      val df = ts.distinct.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
        .toDF("user_id", "event_id", "ts_us")
      def sessions(gapUs: Long): Long = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        df.withColumn("new_s",
            when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1).otherwise(0))
          .agg(sum("new_s")).head().getLong(0) + 1
      }
      sessions(10000L) <= sessions(100L)
    }, tests = 5)
  }

  test("ledger set algebra: missing ∩ computed = ∅ and missing ∪ computed ⊇ target") {
    import spark.implicits._
    val keys = Gen.listOf(Gen.chooseNum(0, 50))
    check(Prop.forAll(keys, keys) { (target, computed) =>
      val t = target.distinct.toDF("k")
      val c = computed.distinct.toDF("k")
      val m = graft.sources.Ledger.missing(t, c, Seq("k"))
        .collect().map(_.getInt(0)).toSet
      val cs = computed.toSet
      m.intersect(cs).isEmpty && (m ++ cs) == (target.toSet ++ cs)
    })
  }

  test("simhash is invariant under token permutation (multiset law)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // the signature is a function of the token MULTISET: any ordering of
    // the same tokens (with duplicates) must produce the same bits
    val toks = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "cc", "ddd", "e1", "the", "of", "q"))
    check(Prop.forAll(toks, Gen.chooseNum(0L, 1000L)) { (ts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ts)
      val r = Seq((ts.toArray, shuffled.toArray)).toDF("a", "b")
        .select(expr("graft_simhash(a)").as("sa"), expr("graft_simhash(b)").as("sb")).head()
      r.getLong(0) == r.getLong(1)
    })
  }

  test("prefix-filter theorem: every pair with jaccard >= 0.5 shares a prefix shingle") {
    // the exact set-similarity bound q_dedup_ngram_jaccard's candidate
    // join relies on, checked against random shingle sets: under the
    // (doc-frequency, shingle) total order, two sets with jac >= 0.5 MUST
    // intersect within their first floor(|sh|/2)+1 shingles
    val docGen = Gen.listOfN(8, Gen.nonEmptyListOf(Gen.chooseNum(0, 25)).map(_.distinct))
    check(Prop.forAll(docGen) { docs0 =>
      val docs = docs0.filter(_.nonEmpty)
      val df = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def prefix(sh: List[Int]): Set[Int] =
        sh.sortBy(g => (df(g), g)).take(sh.size / 2 + 1).toSet
      docs.zipWithIndex.forall { case (a, ia) =>
        docs.zipWithIndex.forall { case (b, ib) =>
          ia >= ib || {
            val sa = a.toSet; val sb = b.toSet
            val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
            jac < 0.5 || prefix(a).intersect(prefix(b)).nonEmpty
          }
        }
      }
    }, tests = 30)
  }

  test("SQ8 law: per-component dequantization error is bounded by scale/2") {
    import spark.implicits._
    // symmetric int8 quantization (the q_embed_quantize / q_knn_sq8
    // recipe): q = floor(x/scale + 0.5) with scale = max|x|/127 rounds to
    // nearest, so |q*scale - x| <= scale/2 for every component — the
    // invariant the SQ8 candidate scan's error analysis rests on
    val vecs = Gen.nonEmptyListOf(Gen.chooseNum(-10.0f, 10.0f)).suchThat(_.exists(_ != 0f))
    check(Prop.forAll(vecs) { v =>
      val df = Seq(Tuple1(v)).toDF("embedding")
        .withColumn("scale",
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
            "(m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))) / 127.0"))
        .where(col("scale") > 0)
        .withColumn("err", expr(
          "aggregate(transform(embedding, x -> " +
            "abs(CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS TINYINT) * scale - CAST(x AS DOUBLE))), " +
            "CAST(0.0 AS DOUBLE), (m, e) -> greatest(m, e))"))
      df.select(col("err") <= col("scale") / 2 + lit(1e-9)).collect()
        .forall(_.getBoolean(0))
    })
  }

  test("z-order law: SQL interleave matches the reference bit-weave and orders by box") {
    import spark.implicits._
    // reference Morton interleave in plain Scala — the SQL HOF expression
    // (Scale.zValueExpr) must agree bit-for-bit on the whole domain...
    def zRef(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    val bits = 10
    val keys = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, (1L << bits) - 1), Gen.chooseNum(0L, (1L << bits) - 1)))
    check(Prop.forAll(keys) { ks0 =>
      // clamp inside the body: shrunk args can fall below Gen bounds
      val ks = ks0.map { case (a, b) =>
        (math.max(0L, math.min(a, (1L << bits) - 1)),
          math.max(0L, math.min(b, (1L << bits) - 1)))
      }
      val got = ks.toDF("a", "b")
        .withColumn("z", expr(graft.plans.Scale.zValueExpr("a", "b", bits)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.forall { case (a, b, z) => z == zRef(a, b, bits) } &&
        // ...and the interleave is a bijection into disjoint quadrants:
        // the top bit pair of z IS the (a, b) half-space pair, so a sort
        // on z clusters whole quadrants contiguously (the box property
        // the 2-D zone map rests on)
        got.forall { case (a, b, z) =>
          ((z >> (2 * bits - 2)) & 3L) ==
            (((b >> (bits - 1)) & 1L) << 1 | ((a >> (bits - 1)) & 1L))
        }
    }, tests = 20)
  }

  test("salted join equals the plain join for any salt count (rewrite soundness law)") {
    import spark.implicits._
    val facts = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 6L), Gen.chooseNum(-50.0, 50.0)))
    val dims = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 8L), Gen.alphaStr.map(_.take(4))))
    check(Prop.forAll(facts, dims, Gen.chooseNum(1, 12)) { (fs, ds, salts) =>
      val fact = fs.toDF("fk", "v")
      val dim = ds.distinctBy(_._1).toDF("dk", "name")
      def norm(d: org.apache.spark.sql.DataFrame) =
        d.groupBy("dk").agg(count(lit(1)).as("n"), round(sum("v"), 6).as("s"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val plain = norm(fact.join(dim, col("fk") === col("dk")))
      val salted = norm(graft.plans.Scale.saltedEquiJoin(fact, dim, "fk", "dk", salts))
      plain == salted
    })
  }

  test("entropy law: q_evt_entropy's identity is in [0, ln(n_types)], 0 iff one type") {
    import spark.implicits._
    // random per-type counts; H = ln T - (sum c ln c)/T must satisfy the
    // entropy bounds, hitting 0 exactly for a single type
    val counts = Gen.nonEmptyListOf(Gen.chooseNum(1L, 50L)).map(_.take(6))
    check(Prop.forAll(counts) { cs =>
      val df = cs.zipWithIndex.map { case (c, i) => (s"t$i", c) }.toDF("typ", "cnt")
      val h = df.agg(
        (log(sum("cnt")) - sum(col("cnt") * log(col("cnt"))) / sum("cnt")).as("h"))
        .head().getDouble(0)
      val upper = math.log(cs.length.toDouble) + 1e-9
      h >= -1e-9 && h <= upper && (cs.length > 1 || math.abs(h) < 1e-9)
    })
  }

  test("connectedComponents fixpoint converges to union-find components on random graphs") {
    import spark.implicits._
    // random sparse graph on <= 30 nodes; the pointer-doubling fixpoint
    // (the q_dedup_clusters engine) must agree with exact union-find for
    // ANY diameter — no edge cap, unlike the pre-round-6 fixed-8-round
    // recipe this replaced, which needed distance-to-min <= 8
    val edgesGen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 29L), Gen.chooseNum(0L, 29L)))
      .map(_.filter { case (a, b) => a != b }.take(25))
    check(Prop.forAll(edgesGen) { es =>
      val nodes = (es.flatMap { case (a, b) => Seq(a, b) } :+ 0L).distinct
      val nodesDf = nodes.toDF("node")
      val edges = es.toDF("da", "db")
      val got = graft.operators.DedupOps.connectedComponents(nodesDf, edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      nodes.forall(n => got(n) == find(n))
    }, tests = 8)
  }

  test("TopK sketch guarantees survive arbitrary partitionings and merge orders") {
    import graft.functions.TopKBuffer
    // pure-JVM law (no Spark): split a random stream into random chunks,
    // build a SpaceSaving buffer per chunk, merge in a shuffled order —
    // the mergeability contract says the guarantees hold for ANY merge
    // tree, which is exactly what Spark's partial aggregation relies on
    val stream = Gen.nonEmptyListOf(Gen.chooseNum(0, 30).map {
      case n if n < 3 => "hot" + n // skewed head
      case n          => "t" + n
    })
    check(Prop.forAll(stream, Gen.chooseNum(1, 6), Gen.chooseNum(0L, 999L)) {
      (items, nChunks, seed) =>
        val cap = 8
        val rnd = new scala.util.Random(seed)
        val chunks = items.grouped(math.max(1, items.size / nChunks)).toSeq
        val bufs = chunks.map { c =>
          val b = new TopKBuffer(cap); c.foreach(b.add); b
        }
        val merged = rnd.shuffle(bufs).reduce { (a, b) => a.mergeIn(b); a }
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val entries = merged.sorted
        val monitored = entries.map(_._1).toSet
        val heavyOk = truth.forall { case (k, t) =>
          t <= merged.total / cap || monitored.contains(k)
        }
        val boundsOk = entries.forall { case (k, cnt, err) =>
          cnt >= truth(k) && cnt - err <= truth(k)
        }
        merged.total == items.size && heavyOk && boundsOk
    }, tests = 30)
  }

  test("TopK sketch bounds hold under EVERY merge permutation, not just a sampled order") {
    import graft.functions.TopKBuffer
    // The sampled-order test above could in principle miss an order-
    // dependent merge bug; with <= 4 chunks the permutation space is
    // <= 24, so EXHAUSTIVELY merging in every order and asserting the
    // SpaceSaving guarantees each time pins true commutativity — the
    // property Spark's partial aggregation assumes when executors merge
    // partial buffers in whatever order tasks happen to finish.
    val stream = Gen.nonEmptyListOf(Gen.chooseNum(0, 30).map {
      case n if n < 3 => "hot" + n
      case n          => "t" + n
    })
    check(Prop.forAll(stream, Gen.chooseNum(2, 4)) { (items, nChunks) =>
      val cap = 8
      val chunks = items.grouped(math.max(1, items.size / nChunks)).toList
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      chunks.permutations.forall { perm =>
        // fresh buffers per permutation: mergeIn mutates the accumulator
        val merged = perm.map { c =>
          val b = new TopKBuffer(cap); c.foreach(b.add); b
        }.reduce { (a, b) => a.mergeIn(b); a }
        val entries = merged.sorted
        val monitored = entries.map(_._1).toSet
        val heavyOk = truth.forall { case (k, t) =>
          t <= merged.total / cap || monitored.contains(k)
        }
        val boundsOk = entries.forall { case (k, cnt, err) =>
          cnt >= truth(k) && cnt - err <= truth(k)
        }
        merged.total == items.size && heavyOk && boundsOk
      }
    }, tests = 20)
  }

  test("two-level sequence packing equals the single-scan reference for any chunk count") {
    import spark.implicits._
    // the distributed-scan law behind q_pack_sequences: range-chunked
    // local packing + broadcast exclusive prefix shift must reproduce the
    // per-source sequential running sum EXACTLY for every chunk count —
    // K = 1 degenerates to one chunk per source (the old single-window
    // recipe), K > 1 is the scale shape. Equality with the sequential
    // reference also pins budget-respect (offset = o mod budget < budget)
    // and the exact-cover property (offsets are the running prefix sums).
    val docsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("s1", "s2", "s3"), Gen.chooseNum(1L, 500L)))
      .map(_.distinctBy(_._1))
    check(Prop.forAll(docsGen, Gen.oneOf(1, 2, 7)) { (docs, k) =>
      val df = docs.toDF("doc_id", "source", "n_tok")
      val got = graft.operators.TextOps.packTwoLevel(df, budget = 100, chunks = k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val want = docs.groupBy(_._2).flatMap { case (src, ds) =>
        val sorted = ds.sortBy(_._1)
        sorted.scanLeft(0L)(_ + _._3).zip(sorted).map { case (o, (id, _, n)) =>
          (src, id, n, o / 100, o % 100)
        }
      }.toSet
      got == want
    }, tests = 12)
  }

  test("scd2 law: incremental merge == from-scratch build for any events and any time split") {
    import graft.operators.Reshape
    import spark.implicits._
    // random per-customer event streams over a small day grid (dense
    // collisions in both status and date exercise the collapse + the
    // tie-break), split at a random day boundary
    val events = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1L, 4L),     // customer
      Gen.chooseNum(1L, 500L),   // orderkey (may collide across custs — fine)
      Gen.oneOf("O", "F", "P"),  // status
      Gen.chooseNum(1, 20)))     // day
    check(Prop.forAll(events, Gen.chooseNum(0, 20)) { (evs, splitDay) =>
      // de-dupe the total-order key (cust, day, orderkey) — two events on
      // the same key would make the transition order itself ambiguous
      val uniq = evs.groupBy(e => (e._1, e._4, e._2)).map(_._2.head).toSeq
      val df = uniq.map { case (c, k, st, d) =>
        (c, k, st, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"))
      }.toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
      val t0 = df.where(expr(s"day(o_orderdate) <= $splitDay"))
      val batch = df.where(expr(s"day(o_orderdate) > $splitDay"))
      val full = Reshape.scd2Build(df)
        .orderBy("o_custkey", "eff_from", "o_orderkey").collect().toSeq
      if (t0.isEmpty || batch.isEmpty) {
        // degenerate splits: merge of an empty side must still hold
        val dim = Reshape.scd2Build(t0)
        val merged = Reshape.scd2Apply(dim, batch)
          .orderBy("o_custkey", "eff_from", "o_orderkey").collect().toSeq
        merged == full
      } else {
        val merged = Reshape.scd2Apply(Reshape.scd2Build(t0), batch)
          .orderBy("o_custkey", "eff_from", "o_orderkey").collect().toSeq
        merged == full
      }
    }, tests = 12)
  }

  test("interval-join law: bucketed rewrite == brute force for any intervals and grain") {
    import graft.operators.Joins
    import spark.implicits._
    // spans deliberately straddle the grain in both directions (0 to 3x)
    // so intervals touch 1..4 buckets — the multi-bucket sequence path
    // and the unique-emission rule are both exercised
    val ivs = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1L, 3L),     // key
      Gen.chooseNum(0L, 60L),    // start
      Gen.chooseNum(0L, 21L)))   // span
    check(Prop.forAll(ivs, Gen.oneOf(1L, 5L, 7L, 13L)) { (raw, grain) =>
      val rows = raw.zipWithIndex.map { case ((k, s, span), i) =>
        (k, i.toLong, s, s + span)
      }
      val df = rows.toDF("k", "id", "s", "e")
      val got = Joins.intervalOverlapJoin(df, grain)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val brute = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
      } yield (a._1, a._2, b._2,
        math.min(a._4, b._4) - math.max(a._3, b._3) + 1)).toSet
      got == brute
    }, tests = 15)
  }

  test("zone-map law: pruned range scan == full filter for any data, layout, and range") {
    import graft.plans.Scale
    import spark.implicits._
    val data = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
    check(Prop.forAll(data, Gen.chooseNum(1, 6), Gen.chooseNum(-1200L, 1200L),
      Gen.chooseNum(0L, 800L)) { (vs, parts, from, width) =>
      val dir = java.nio.file.Files.createTempDirectory("zm_prop").toString + "/t"
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      Scale.writeRangeSorted(df, dir, "v", parts)
      val to = from + width
      val (pruned, kept, total) = Scale.pruneByStats(spark, dir, "v", from, to)
      val got = pruned.select("id").collect().map(_.getLong(0)).sorted.toSeq
      val want = vs.zipWithIndex.collect {
        case (v, i) if v >= from && v <= to => i.toLong
      }.sorted
      kept <= total && got == want
    }, tests = 5)
  }

  test("dot product is symmetric on random float vectors") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val vecs = Gen.nonEmptyListOf(Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f)))
    check(Prop.forAll(vecs) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }.toDF("id", "v")
      df.as("a").crossJoin(df.as("b"))
        .select(expr("graft_dot(a.v, b.v)").as("ab"), expr("graft_dot(b.v, a.v)").as("ba"))
        .where(col("ab") =!= col("ba")).count() == 0
    }, tests = 5)
  }

  // --- codec laws (no Spark needed: the codecs are pure JVM functions,
  // and distribution-invariance follows from determinism + mapPartitions) ---

  test("PNG codec law: encode then decode is the identity on any luma plane") {
    import graft.sources.ImageCodec
    val dims = Gen.zip(Gen.chooseNum(1, 40), Gen.chooseNum(1, 40))
    check(Prop.forAll(dims, Gen.long) { case ((w, h), seed) =>
      val luma = Array.tabulate(w * h) { i =>
        (scala.util.hashing.MurmurHash3.mix(seed.toInt, i) & 0xff)
      }
      val d = ImageCodec.decodeLuma(ImageCodec.encodeGrayPng(w, h, luma)).get
      d.width == w && d.height == h && d.channels == 1 && d.luma.toSeq == luma.toSeq
    }, tests = 20)
  }

  test("WAV codec law: encode then decode is the identity on any PCM16 signal") {
    import graft.sources.AudioCodec
    val sig = Gen.nonEmptyListOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    check(Prop.forAll(sig) { ss =>
      val samples = ss.toArray
      val d = AudioCodec.decodeWav(AudioCodec.encodeWavPcm16(samples)).get
      d.sampleRate == AudioCodec.SampleRate && d.channels == 1 &&
        d.samples.toSeq == samples.toSeq
    }, tests = 20)
  }

  test("video container law: encode/decode round-trips any frame list; truncation keeps a prefix") {
    import graft.sources.VideoCodec
    val frames = Gen.listOf(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    check(Prop.forAll(frames, Gen.chooseNum(0, 64)) { (fs, cut) =>
      val enc = VideoCodec.encodeContainer(fs)
      val full = VideoCodec.decodeContainer(enc).map(_.toSeq) == fs.map(_.toSeq)
      // chopping ANY suffix yields a prefix of the frame list, never a throw
      val chopped = VideoCodec.decodeContainer(enc.dropRight(cut)).map(_.toSeq)
      full && fs.map(_.toSeq).startsWith(chopped)
    }, tests = 20)
  }

  test("envelope hash law: invariant under exact volume doubling (no clipping)") {
    import graft.sources.AudioCodec
    // <= 256 samples: every window holds 0 or 1 samples, so cells carry
    // no per-window floor and doubling is EXACTLY invariant. (Longer
    // signals floor window means, so scaling can drift threshold-margin
    // bits — that regime is covered by the bounded-drift law below.)
    val sig = Gen.chooseNum(1, 256).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-16384, 16383)))
    check(Prop.forAll(sig) { ss =>
      val quiet = ss.map(_.toShort).toArray
      val loud = ss.map(v => (v * 2).toShort).toArray
      AudioCodec.envelopeHash256(quiet).toSeq == AudioCodec.envelopeHash256(loud).toSeq
    }, tests = 20)
  }

  test("envelope hash law: long-signal re-levels drift only a few threshold-margin bits") {
    import graft.sources.{AudioCodec, HashBanding}
    // beyond 256 samples the per-window floor makes scaling approximate;
    // the banded dedup threshold must absorb the drift
    val sig = Gen.chooseNum(257, 2048).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-16384, 16383)))
    check(Prop.forAll(sig) { ss =>
      val quiet = ss.map(_.toShort).toArray
      val loud = ss.map(v => (v * 2).toShort).toArray
      HashBanding.hamming(AudioCodec.envelopeHash256(quiet),
        AudioCodec.envelopeHash256(loud)) <= HashBanding.DefaultMaxHamming
    }, tests = 20)
  }

  test("ingest law: two sequential ingests == one combined ingest; a full retry admits zero") {
    import graft.sources.{AssetIngest, ImageCodec}
    import spark.implicits._
    // For random batches of textured images (with planted in-batch and
    // cross-batch dup keys) and any split point: ingesting batch A then
    // batch B must leave the SAME admitted landing set and the SAME
    // index state as design guarantees demand — a batch-B asset is
    // admitted iff novel vs (corpus ∪ admitted(A)) — and re-ingesting
    // the full batch afterwards must admit nothing (self-healing retry).
    val gen = Gen.zip(Gen.chooseNum(2L, 30L), Gen.chooseNum(0, 12), Gen.long)
    check(Prop.forAll(gen) { case (n, splitRaw, seed) =>
      // clamp inside the body — shrinking ignores chooseNum bounds
      val nn = math.max(2, n.toInt)
      val rnd = new scala.util.Random(seed)
      // keys drawn from a small pool so duplicates actually occur
      val keys = Array.fill(nn)(rnd.nextInt(8).toLong + 1000 * (seed % 7))
      val rows = keys.zipWithIndex.map { case (k, i) =>
        (i.toLong, ImageCodec.encodeGrayPng(20, 20, ImageCodec.texturedLuma(k, 20, 20)))
      }.toSeq
      // both sub-batches nonempty (an all-empty batch writes no parquet
      // part files, which is a read-side artifact, not the law's subject)
      val split = math.max(1, math.min(splitRaw, rows.length - 1))
      val base = java.nio.file.Files.createTempDirectory("ingest_law").toString
      def landed(dataDir: String): Set[Long] = {
        val p = new java.io.File(s"$dataDir/assets")
        if (!p.exists()) Set.empty
        else spark.read.parquet(s"$dataDir/assets").select("asset_id")
          .as[Long].collect().toSet
      }
      def indexed(indexDir: String): Set[Long] =
        spark.read.parquet(s"$indexDir/hashes").select("asset_id").as[Long].collect().toSet
      // sequential: A then B
      val r1 = AssetIngest.ingestImageBatch(spark,
        rows.take(split).toDF("asset_id", "payload"), s"$base/seq/idx", s"$base/seq/data")
      val r2 = AssetIngest.ingestImageBatch(spark,
        rows.drop(split).toDF("asset_id", "payload"), s"$base/seq/idx", s"$base/seq/data")
      // combined in one call
      val rc = AssetIngest.ingestImageBatch(spark,
        rows.toDF("asset_id", "payload"), s"$base/one/idx", s"$base/one/data")
      val seqLanded = landed(s"$base/seq/data")
      val oneLanded = landed(s"$base/one/data")
      // the min-id keeper makes admitted sets equal, not just equal-sized:
      // each key's least id wins in both layouts
      val admittedEqual = seqLanded == oneLanded && seqLanded == indexed(s"$base/seq/idx") &&
        oneLanded == indexed(s"$base/one/idx")
      val countsAdd = r1.admitted + r2.admitted == rc.admitted
      // full-batch retry: everything now a corpus dup, nothing admitted
      val rr = AssetIngest.ingestImageBatch(spark,
        rows.toDF("asset_id", "payload"), s"$base/one/idx", s"$base/one/data")
      admittedEqual && countsAdd && rr.admitted == 0 &&
        rr.corpusDups + rr.inBatchDups == rows.length
    }, tests = 6)
  }

  test("ingest law holds for the embedding loop: sequential == combined, retry admits zero") {
    import graft.sources.AssetIngest
    import spark.implicits._
    // same law as the image loop, over the codec-free vector member:
    // duplicate keys produce IDENTICAL embeddings (sim 1.0 near-dups),
    // so the min-id keeper must leave the same landed + indexed sets for
    // any split point, and a full retry self-heals to zero admits
    val gen = Gen.zip(Gen.chooseNum(2L, 24L), Gen.chooseNum(0, 10), Gen.long)
    check(Prop.forAll(gen) { case (n, splitRaw, seed) =>
      // clamp inside the body: shrinking ignores chooseNum bounds, and a
      // shrunk n < 2 would crash Array.fill/landed() and mask the real
      // counterexample (the repo-wide clamp convention)
      val nn = math.max(2, n.toInt)
      val rnd = new scala.util.Random(seed)
      val keys = Array.fill(nn)(rnd.nextInt(6).toLong)
      def unitOf(key: Long): Array[Float] = {
        val r2 = new scala.util.Random(key * 7919 + 13)
        val v = Array.fill(12)(r2.nextGaussian())
        val nm = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / nm).toFloat)
      }
      val rows = keys.zipWithIndex.map { case (k, i) =>
        (i.toLong, (k % 3).toString, unitOf(k))
      }.toSeq
      val split = math.max(1, math.min(splitRaw, rows.length - 1))
      val base = java.nio.file.Files.createTempDirectory("ingest_law_e").toString
      def landed(dataDir: String): Set[Long] = {
        val p = new java.io.File(s"$dataDir/vectors")
        if (!p.exists()) Set.empty
        else spark.read.parquet(s"$dataDir/vectors").select("vec_id")
          .as[Long].collect().toSet
      }
      def indexed(indexDir: String): Set[Long] =
        spark.read.parquet(s"$indexDir/embeddings").select("vec_id")
          .as[Long].collect().toSet
      def df(rs: Seq[(Long, String, Array[Float])]) =
        rs.toDF("vec_id", "label", "embedding")
      val r1 = AssetIngest.ingestEmbedBatch(spark, df(rows.take(split)),
        s"$base/seq/idx", s"$base/seq/data")
      val r2 = AssetIngest.ingestEmbedBatch(spark, df(rows.drop(split)),
        s"$base/seq/idx", s"$base/seq/data")
      val rc = AssetIngest.ingestEmbedBatch(spark, df(rows),
        s"$base/one/idx", s"$base/one/data")
      val seqLanded = landed(s"$base/seq/data")
      val oneLanded = landed(s"$base/one/data")
      val admittedEqual = seqLanded == oneLanded &&
        seqLanded == indexed(s"$base/seq/idx") &&
        oneLanded == indexed(s"$base/one/idx")
      val countsAdd = r1.admitted + r2.admitted == rc.admitted
      val rr = AssetIngest.ingestEmbedBatch(spark, df(rows),
        s"$base/one/idx", s"$base/one/data")
      admittedEqual && countsAdd && rr.admitted == 0 &&
        rr.corpusDups + rr.inBatchDups == rows.length
    }, tests = 5)
  }

  test("ingest law holds for the text loop: sequential == combined, retry admits zero") {
    import graft.sources.AssetIngest
    import spark.implicits._
    // the text member: duplicate keys produce identical documents
    // (Jaccard 1.0); same sequential/combined/retry law
    val gen = Gen.zip(Gen.chooseNum(2L, 12L), Gen.chooseNum(0, 6), Gen.long)
    check(Prop.forAll(gen) { case (n, splitRaw, seed) =>
      // clamp inside the body — same shrink hazard as the embedding loop
      val nn = math.max(2, n.toInt)
      val rnd = new scala.util.Random(seed)
      val keys = Array.fill(nn)(rnd.nextInt(5).toLong)
      // 60 tokens → quality score 0.42, safely above the 0.3 gate (40
      // tokens would score 0.28 and silently gate the whole batch — the
      // shrunk counterexample that caught this law's first draft)
      val rows = keys.zipWithIndex.map { case (k, i) =>
        (i.toLong, "s", (1 to 60).map(t => s"k${k}_$t").mkString(" "))
      }.toSeq
      val split = math.max(1, math.min(splitRaw, rows.length - 1))
      val base = java.nio.file.Files.createTempDirectory("ingest_law_t").toString
      def landed(dataDir: String): Set[Long] = {
        val p = new java.io.File(s"$dataDir/docs")
        if (!p.exists()) Set.empty
        else spark.read.parquet(s"$dataDir/docs").select("doc_id")
          .as[Long].collect().toSet
      }
      def df(rs: Seq[(Long, String, String)]) = rs.toDF("doc_id", "source", "text")
      val r1 = AssetIngest.ingestTextBatch(spark, df(rows.take(split)),
        s"$base/seq/idx", s"$base/seq/data")
      val r2 = AssetIngest.ingestTextBatch(spark, df(rows.drop(split)),
        s"$base/seq/idx", s"$base/seq/data")
      val rc = AssetIngest.ingestTextBatch(spark, df(rows),
        s"$base/one/idx", s"$base/one/data")
      val admittedEqual = landed(s"$base/seq/data") == landed(s"$base/one/data")
      val countsAdd = r1.admitted + r2.admitted == rc.admitted
      val rr = AssetIngest.ingestTextBatch(spark, df(rows),
        s"$base/one/idx", s"$base/one/data")
      admittedEqual && countsAdd && rr.admitted == 0 &&
        rr.corpusDups + rr.inBatchDups == rows.length
    }, tests = 3)
  }

  test("winsorize law: Approx(acc >= n) clips within 1 row per side of Exact; clipping preserves rows") {
    import graft.operators.Extended
    import spark.implicits._
    // For random per-group data with DISTINCT values and accuracy >= the
    // group size, approx_percentile's GK sketch is rank-exact; the only
    // residual difference vs exact `percentile` is interpolation (exact
    // interpolates BETWEEN data values, approx returns a data value), so
    // the per-group clipped-row drift is at most 1 per side. This is the
    // law that makes Approx the honest 100 TB default for the library
    // face: same clipping semantics to within interpolation, bounded
    // memory per group.
    val gen = Gen.zip(Gen.chooseNum(20, 120), Gen.chooseNum(2, 4), Gen.long)
    check(Prop.forAll(gen) { case (nRaw, gRaw, seed) =>
      // clamp inside the body — shrinking ignores chooseNum bounds
      val n = math.max(20, nRaw); val g = math.max(2, gRaw)
      val rnd = new scala.util.Random(seed)
      // distinct values by construction: index-spread base + tiny jitter
      val rows = (0 until n).map(i =>
        ((i % g).toString, i * 1000.0 + rnd.nextDouble()))
      val df = rows.toDF("grp", "v")
      def clippedPerGroup(b: Extended.Bounds): Map[String, Long] =
        Extended.winsorize(df, Seq("grp"), "v", 0.1, 0.9, b)
          .where(col("v") < col("lo") || col("v") > col("hi"))
          .groupBy("grp").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = clippedPerGroup(Extended.Exact)
      val approx = clippedPerGroup(Extended.Approx(accuracy = n + 1))
      val groups = rows.map(_._1).distinct
      val driftOk = groups.forall { k =>
        math.abs(exact.getOrElse(k, 0L) - approx.getOrElse(k, 0L)) <= 2
      }
      // row preservation + in-band clipping, both modes
      val w = Extended.winsorize(df, Seq("grp"), "v", 0.1, 0.9, Extended.Approx())
      val kept = w.count() == n
      val inBand = w.where(col("v_winsorized") < col("lo") ||
        col("v_winsorized") > col("hi")).count() == 0L
      driftOk && kept && inBand
    }, tests = 6)
  }

  test("resize law: output pixel (x,y) is exactly the integer-NN source sample") {
    import graft.sources.ImageCodec
    import spark.implicits._
    val gen = Gen.zip(Gen.chooseNum(1, 24), Gen.chooseNum(1, 24),
      Gen.chooseNum(1, 24), Gen.chooseNum(1, 24), Gen.long)
    check(Prop.forAll(gen) { case (w, h, ow, oh, seed) =>
      val src = ImageCodec.texturedLuma(seed, w, h)
      val assets = Seq((1L, "image", ImageCodec.encodeGrayPng(w, h, src)))
        .toDF("asset_id", "modality", "payload")
        .withColumn("meta", struct(lit("image/png").as("mime"),
          lit(w).as("width"), lit(h).as("height"),
          octet_length(col("payload")).cast("long").as("n_bytes")))
      val out = ImageCodec.resizeImages(assets, ow, oh).collect().head
      val d = ImageCodec.decodeLuma(out.getAs[Array[Byte]]("payload")).get
      d.width == ow && d.height == oh && (0 until ow * oh).forall { i =>
        val x = i % ow; val y = i / ow
        d.luma(i) == src((y * h / oh) * w + x * w / ow)
      }
    }, tests = 10)
  }

  test("simd dot: reassociation error bounded, symmetric, deterministic on random vectors") {
    import graft.simd.SimdBridge
    // values in [-1, 1], lengths spanning every lane regime including the
    // 2x-unroll boundary; the error bound is the standard sequential-vs-
    // pairwise f32 summation bound scaled by the sum of |a_i * b_i|
    val vec = for {
      n <- Gen.chooseNum(0, 300)
      xs <- Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 1000.0f))
    } yield xs.toArray
    check(Prop.forAll(vec, vec) { (a, b) =>
      val n = math.min(a.length, b.length)
      val seq = SimdBridge.scalarDot(a, b)
      val simd = SimdBridge.dot(a, b)
      val magnitude = (0 until n).map(i => math.abs(a(i).toDouble * b(i))).sum
      // ~n/8 fma roundings per lane, each bounded by eps_f32 * magnitude;
      // 1e-7 * n absorbs the lane count with slack (eps_f32 ≈ 6e-8)
      val bound = 1e-7 * (n + 1) * (1.0 + magnitude)
      math.abs(seq - simd) <= bound &&
        // pinned species → same-host determinism
        simd == SimdBridge.dot(a, b) &&
        // dot is symmetric for both kernels
        simd == SimdBridge.dot(b, a) && seq == SimdBridge.scalarDot(b, a)
    }, tests = 50)
  }

  test("sum-ledger compaction law: any batch split, any retain boundary - reads bit-equal") {
    import spark.implicits._
    import graft.sources.SketchLedger
    // random rows over a handful of keys, split into a random number of
    // batches at random, then compacted at a random retain boundary —
    // the folded read must equal the never-compacted read exactly, and
    // a second fold of everything must too (generation chaining)
    val rows = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(1L, 500L)))
    check(Prop.forAll(rows, Gen.chooseNum(2, 5), Gen.chooseNum(0, 5)) {
      (data, nBatches, keepFrom) =>
        val dir = java.nio.file.Files.createTempDirectory("prop_ledcomp").toString
        val df = data.zipWithIndex
          .map { case ((k, v), i) => (k, v.toDouble, i % nBatches) }
          .toDF("k", "v", "b")
        (0 until nBatches).foreach { b =>
          val part = df.where(col("b") === b)
          if (part.limit(1).count() > 0)
            SketchLedger.appendSum(spark, part, Seq("k"), "v", dir, s"b$b")
        }
        def read() = SketchLedger.sumByKey(spark, dir).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
        val before = read()
        SketchLedger.compactSum(spark, dir,
          retain = id => id.stripPrefix("b").toInt >= keepFrom)
        val mid = read()
        SketchLedger.compactSum(spark, dir) // fold the retained remainder
        val after = read()
        before == mid && before == after
    }, tests = 10)
  }
}
