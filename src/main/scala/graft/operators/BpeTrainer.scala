package graft.operators

import scala.collection.mutable

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the missing sibling of
  * q_bpe_pairs (which gates one word-level merge-frequency pass).
  *
  * The scalable shape is the one every production trainer (the original
  * Sennrich implementation, HF tokenizers) uses: BPE statistics are a
  * function of the WORD-COUNT vocabulary, not the raw corpus — so the
  * corpus contributes exactly ONE distributed pass (whitespace words →
  * counts, map-side combined), and the merge iterations run over the
  * compact (word, count) table, whose size is vocabulary-bounded
  * (~10⁷ rows at web scale) and independent of corpus row count. This
  * module keeps precisely that split:
  *
  *  - [[corpusWordCounts]] — the 100 TB part: one scan, one shuffle.
  *  - [[trainBpe]] — collects the TOP-`maxVocabWords` counts (an
  *    explicit, documented driver bound — the Zipf tail it drops
  *    contributes negligible pair mass, the same cut HF's
  *    `min_frequency` makes) and runs the classic merge loop in pure
  *    Scala: O(vocab · word-length) per merge, milliseconds per
  *    iteration at the default bound.
  *  - [[segmentWords]] — DISTRIBUTED application of a trained merge
  *    list to a words column via one left-to-right `aggregate` fold per
  *    merge (codegen'd HOFs, no UDF). Expression depth grows with the
  *    merge count, so this face is for bounded tables (≤ ~64 merges:
  *    analysis, ablations, the spec's cross-checks). A production-size
  *    table (30k merges) segments its training vocab AT TRAIN TIME on
  *    the driver ([[segmentVocab]]) and tokenizes the corpus by
  *    broadcast-joining that segmentation — OOV tail words fall back to
  *    character symbols, the standard fast-tokenizer cache shape.
  *
  * Determinism: pair ties break lexicographically on (a, b), so the
  * merge sequence is a pure function of the word counts — q_bpe_train
  * is rows-tier (the iterative loop has no single-SQL DuckDB oracle)
  * but fully deterministic, and BpeTrainerSpec pins the classic
  * low/lower/newest/widest fixture to the known merge sequence.
  */
object BpeTrainer {

  /** End-of-word marker symbol (the Sennrich convention) — keeps merges
    * from crossing word boundaries and lets a segmentation round-trip. */
  val EndMark = "</w>"

  /** The corpus pass: whitespace words → exact counts. */
  def corpusWordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` merges over `docs`. The driver materializes at
    * most `maxVocabWords` (word, count) rows — the only collect, and
    * explicitly bounded. Returns (left, right, pairFrequency) in merge
    * order. */
  def trainBpe(s: SparkSession, docs: DataFrame, numMerges: Int,
      maxVocabWords: Int = 65536, textCol: String = "text"): Seq[(String, String, Long)] = {
    val vocab = corpusWordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(vocab, numMerges)
  }

  /** The pure merge loop — shared by [[trainBpe]] and any caller that
    * already holds word counts (also the spec's brute-force twin).
    * Stops early when no adjacent pair remains. */
  def trainFromCounts(vocab: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String, Long)] = {
    var words: Array[(Array[String], Long)] = vocab.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndMark, c)
    }.toArray
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairs.update(k, pairs.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val ((a, b), n) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((a, b, n))
        words = words.map { case (syms, c) => (mergeOnce(syms, a, b), c) }
        i += 1
      }
    }
    out.result()
  }

  /** One exhaustive left-to-right pass of merge (a, b) over a symbol
    * sequence — the reference semantics [[segmentWords]]' fold mirrors. */
  def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        buf += a + b; i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toArray
  }

  /** Driver-side segmentation of a word with an ordered merge list. */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toArray :+ EndMark) {
      case (syms, (a, b)) => mergeOnce(syms, a, b)
    }.toSeq

  /** Segment many words on the driver (the train-time vocab cache a
    * production deployment broadcast-joins against the corpus). */
  def segmentVocab(words: Seq[String],
      merges: Seq[(String, String)]): Seq[(String, Seq[String])] =
    words.map(w => w -> segmentWord(w, merges))

  /** Character symbols + end marker as a Column (empty split artifacts
    * dropped — Java's split keeps a trailing "" on an empty pattern). */
  private def charSymbols(word: Column): Column =
    concat(filter(split(word, ""), x => x =!= lit("")), array(lit(EndMark)))

  /** One merge as a codegen'd left-to-right `aggregate` fold: the
    * running result array grows element by element; when the incoming
    * symbol completes the (a, b) pair with the result's LAST element,
    * the pair collapses in place — exactly [[mergeOnce]]'s semantics
    * (a freshly merged "ab" cannot re-merge with a following "b",
    * because the comparison is against the literal `a`). Built with the
    * Column API, so corpus symbols never splice into SQL text. */
  private def mergeColumn(arr: Column, a: String, b: String): Column =
    aggregate(arr, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Distributed merge application: adds a `pieces array<string>`
    * column segmenting `wordCol` under the ordered `merges`. Expression
    * depth is one nested fold PER MERGE — see the object scaladoc for
    * the bounded-table contract and the production alternative. */
  def segmentWords(words: DataFrame, merges: Seq[(String, String)],
      wordCol: String = "word"): DataFrame = {
    require(merges.length <= 64,
      s"segmentWords chains one fold per merge (${merges.length} requested); " +
        "production-size tables segment the vocab at train time " +
        "(segmentVocab) and broadcast-join — see scaladoc")
    val folded = merges.foldLeft(charSymbols(col(wordCol))) {
      case (acc, (a, b)) => mergeColumn(acc, a, b)
    }
    words.withColumn("pieces", folded)
  }

  /** Declared rows-tier query: the first 16 trained merges over the
    * documents corpus — deterministic (tie-break pinned), gated by the
    * driver's rows>0 check and BpeTrainerSpec's semantic pins (the
    * iterative loop has no single-statement DuckDB twin). */
  val queries: Map[String, Q] = Map(
    "q_bpe_train" -> ((s, d) => {
      val merges = trainBpe(s, Tables.documents(s, d), numMerges = 16)
      val rows = merges.zipWithIndex.map { case ((a, b, n), i) =>
        (i + 1, a, b, a + b, n)
      }
      import s.implicits._
      rows.toDF("rank", "a", "b", "merged", "freq")
        .orderBy("rank")
    }))

  val oracle: Map[String, String] = Map.empty
}
