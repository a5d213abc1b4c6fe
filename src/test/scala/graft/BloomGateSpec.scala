package graft

import graft.functions.{BloomGate, GraftFunctions}
import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the Bloom membership gate (functions/BloomGate.scala) and the
  * bloom-prefiltered decontamination path built on it. The DuckDB oracle
  * already pins `q_contamination_bloom`'s END RESULT (it shares
  * q_contamination's SQL verbatim); this spec pins the properties that
  * make that sharing sound — no false negatives, bounded false
  * positives, deterministic build — and the plan shape that makes the
  * prefilter worth having.
  */
class BloomGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered contamination is row-identical to the exact gate") {
    val exact = SparkEntry.queries("q_contamination")(spark, sf).collect().toSeq
    val bloom = SparkEntry.queries("q_contamination_bloom")(spark, sf).collect().toSeq
    assert(exact.nonEmpty, "fixture must actually plant contamination")
    assert(bloom == exact,
      "bloom prefilter changed the result - a false negative leaked through")
  }

  test("no false negatives: every member value passes its own bloom") {
    GraftFunctions.register(spark)
    val (_, bench) = DedupOps.contaminationGrams(Tables.documents(spark, sf))
    val bloom = BloomGate.buildBloom(bench.select("g"), "g", fpp = 0.01)
    val missed = bench.where(!BloomGate.mightContain(bloom, col("g"))).count()
    assert(missed == 0L, s"$missed member grams tested negative - impossible for a bloom")
  }

  test("false-positive rate on a disjoint probe set is near the built fpp") {
    GraftFunctions.register(spark)
    val members = spark.range(20000).select(concat(lit("member-"), col("id")).as("v"))
    val bloom = BloomGate.buildBloom(members, "v", fpp = 0.01)
    val probes = spark.range(20000).select(concat(lit("absent-"), col("id")).as("v"))
    val hits = probes.where(BloomGate.mightContain(bloom, col("v"))).count()
    // 1% nominal; allow generous slack for sizing granularity + the
    // xxhash64 pre-hash, but catch a broken filter (50%+) outright.
    assert(hits <= 20000 * 0.03, s"FPP blew past bound: $hits / 20000 disjoint probes hit")
    assert(hits < 20000, "every disjoint probe hit - the filter is saturated or broken")
  }

  test("bloom build is byte-identical across partitionings (OR-merge is order-free)") {
    val (_, bench) = DedupOps.contaminationGrams(Tables.documents(spark, sf))
    val a = BloomGate.buildBloom(bench.select("g").repartition(7), "g", fpp = 0.01,
      expectedItems = 4096)
    val b = BloomGate.buildBloom(bench.select("g").repartition(2), "g", fpp = 0.01,
      expectedItems = 4096)
    assert(java.util.Arrays.equals(a, b),
      "bloom bytes differ across partitionings - build is not deterministic")
  }

  test("the bloom filter sits below the confirm join on the corpus side") {
    val df = SparkEntry.queries("q_contamination_bloom")(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val bloomFilters = plan.collect {
      case f: Filter if f.condition.toString.contains("graft_bloom_contains") => f
    }
    assert(bloomFilters.nonEmpty, "bloom prefilter was optimized away entirely")
    // Map-only prefilter: nothing join-shaped may run beneath it.
    bloomFilters.foreach { f =>
      val joinsBelow = f.collect { case j: Join => j }
      assert(joinsBelow.isEmpty,
        "bloom prefilter is above a join - it no longer prunes the corpus stream")
    }
  }

  test("bloom smoke harness: survivors = true leaks + bounded FP; sketch beats raw strings") {
    // guards ScaleSmoke.runBloomSmoke (the BASELINE.md "bloom gate
    // smoke" harness) against bit-rot, and pins the quantities on the
    // real fixture: every true-leak row survives the prefilter (no
    // false negatives), false positives stay a small fraction of the
    // corpus gram stream.
    val r = ScaleSmoke.runBloomSmoke(spark, sf)
    assert(r.corpusGrams > 0 && r.benchGrams > 0 && r.trueLeakRows > 0)
    assert(r.survivors >= r.trueLeakRows, "a true leak was filtered out")
    assert(r.fpRows <= (r.corpusGrams * 0.03).toLong + 10,
      s"FP rows ${r.fpRows} of ${r.corpusGrams} corpus grams - filter broken")
  }

  test("an unboundedly large member set fails loudly at build time") {
    val (_, bench) = DedupOps.contaminationGrams(Tables.documents(spark, sf))
    val e = intercept[IllegalArgumentException] {
      BloomGate.buildBloom(bench.select("g"), "g", fpp = 0.001,
        expectedItems = 10_000_000_000L)
    }
    assert(e.getMessage.contains("cap"), s"guard message unhelpful: ${e.getMessage}")
  }

  test("a non-foldable bloom argument is rejected at analysis time") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf)
    val e = intercept[Exception] {
      docs.select(call_function("graft_bloom_contains",
        xxhash64(col("text")), col("text").cast("binary"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"),
      s"expected the foldability check to fire, got: ${e.getMessage}")
  }
}
