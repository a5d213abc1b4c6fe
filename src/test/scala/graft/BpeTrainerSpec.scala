package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the distributed BPE trainer: the classic fixture's known
  * merge sequence, distributed-vs-driver segmentation equality, and the
  * declared q_bpe_train contract.
  */
class BpeTrainerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // The Sennrich et al. (2016) worked example: low×5 lower×2 newest×6
  // widest×3. Hand-derivable merge sequence with the (freq desc, pair
  // asc) tie-break: (e,s)=9 → (es,t)=9 → (est,</w>)=9 → (l,o)=7 →
  // (lo,w)=7 ...
  private val fixture = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromCounts reproduces the classic fixture's merge sequence") {
    val merges = BpeTrainer.trainFromCounts(fixture, 5)
    assert(merges === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("training exhausts gracefully when no pairs remain") {
    // single-char word + marker: one pair, then nothing left to merge
    val merges = BpeTrainer.trainFromCounts(Seq(("a", 3L)), 10)
    assert(merges === Seq(("a", "</w>", 3L)))
  }

  test("segmentWord applies merges left-to-right exhaustively") {
    val merges = BpeTrainer.trainFromCounts(fixture, 5).map(m => (m._1, m._2))
    assert(BpeTrainer.segmentWord("lowest", merges) ===
      Seq("low", "est</w>"))
    assert(BpeTrainer.segmentWord("newest", merges) ===
      Seq("n", "e", "w", "est</w>"))
    // overlap semantics: merging (a,a) over "aaa" is greedy left-to-right
    assert(BpeTrainer.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
  }

  test("distributed segmentWords equals the driver segmentation over real vocabulary") {
    val docs = Tables.documents(spark, sf)
    val merges = BpeTrainer.trainBpe(spark, docs, numMerges = 12)
    val pairList = merges.map(m => (m._1, m._2))
    val words = BpeTrainer.corpusWordCounts(docs)
      .orderBy(col("cnt").desc, col("word").asc).limit(200)
      .select("word")
    val dist = BpeTrainer.segmentWords(words, pairList)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    dist.foreach { case (w, pieces) =>
      assert(pieces === BpeTrainer.segmentWord(w, pairList),
        s"distributed fold diverged from driver semantics for '$w'")
    }
    assert(dist.nonEmpty)
  }

  test("empty merge list segments to characters plus the end marker") {
    import spark.implicits._
    val out = BpeTrainer.segmentWords(Seq("abc").toDF("word"), Nil)
      .collect().head.getSeq[String](1)
    assert(out === Seq("a", "b", "c", "</w>"))
  }

  test("segmentation round-trips: concatenated pieces rebuild the word") {
    val docs = Tables.documents(spark, sf)
    val merges = BpeTrainer.trainBpe(spark, docs, numMerges = 16).map(m => (m._1, m._2))
    BpeTrainer.corpusWordCounts(docs).limit(500).collect().foreach { r =>
      val w = r.getString(0)
      val joined = BpeTrainer.segmentWord(w, merges).mkString
      assert(joined === w + BpeTrainer.EndMark, s"round-trip broke for '$w'")
    }
  }

  test("q_bpe_train: deterministic rows, rank-ordered, first merge pinned") {
    val out = SparkEntry.queries("q_bpe_train")(spark, sf).collect()
    assert(out.length === 16)
    assert(out.map(_.getInt(0)).toSeq === (1 to 16))
    val first = BpeTrainer.trainBpe(spark, Tables.documents(spark, sf), 1).head
    assert((out.head.getString(1), out.head.getString(2), out.head.getLong(4))
      === first)
    // merged column is the concatenation
    out.foreach(r => assert(r.getString(3) === r.getString(1) + r.getString(2)))
  }
}
