package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.sources.WriterLock

/** Laws for the single-writer lock (DURABILITY.md, "Concurrent
  * writers"): the crash fences make mutations crash-safe; WriterLock
  * makes the mutators safe to CALL concurrently — two simultaneous
  * appenders used to race Hadoop's shared `_temporary` staging dir
  * (silently dropped rows) and GenStamp's read-bump-write counters
  * (lost update that can stamp a diverged layout "in sync").
  */
class WriterLockSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("graft_wlock").toString

  test("reentrant, returns the body value, and drops the lock file marker") {
    val dir = tmp()
    val got = WriterLock.withLock(dir) { WriterLock.withLock(dir) { 42 } }
    assert(got == 42)
    assert(Files.exists(java.nio.file.Paths.get(dir, "_graft_writer_lock")),
      "cross-JVM lock file missing (local path must take the file-lock tier)")
    // reusable after release
    assert(WriterLock.withLock(dir) { "again" } == "again")
  }

  test("mutual exclusion: two threads never overlap inside the same root") {
    val dir = tmp()
    val inside = new AtomicBoolean(false)
    val overlapped = new AtomicBoolean(false)
    def worker(): Thread = new Thread(() =>
      (1 to 25).foreach { _ =>
        WriterLock.withLock(dir) {
          if (!inside.compareAndSet(false, true)) overlapped.set(true)
          Thread.sleep(1)
          inside.set(false)
        }
      })
    val ts = Seq(worker(), worker(), worker())
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(!overlapped.get, "two threads were inside the lock at once")
  }

  test("distinct roots do not contend; equivalent spellings of one root do") {
    val dir = tmp()
    val other = tmp()
    val t0 = System.nanoTime()
    WriterLock.withLock(dir) {
      WriterLock.withLock(other) { () } // different root: no deadlock, no wait
    }
    assert((System.nanoTime() - t0) < 5e9, "independent roots contended")
    // trailing slash + file: URI resolve to the same lock: a second
    // thread on the alias must WAIT (observed as: the flag the holder
    // sets before releasing is visible to the alias acquirer)
    val seen = new AtomicBoolean(false)
    val aliasWaited = new AtomicBoolean(false)
    val entered = new CountDownLatch(1)
    val t = new Thread(() => {
      entered.await()
      WriterLock.withLock(s"file:$dir/") { aliasWaited.set(seen.get) }
    })
    t.start()
    WriterLock.withLock(dir) {
      entered.countDown()
      Thread.sleep(300) // give the alias thread time to hit the lock
      seen.set(true)
    }
    t.join()
    assert(aliasWaited.get,
      "file:-URI alias of the same root entered while the root was held")
  }

  test("released on exception; timeout fails loudly naming the root") {
    val dir = tmp()
    intercept[RuntimeException] {
      WriterLock.withLock(dir) { throw new RuntimeException("boom") }
    }
    assert(WriterLock.withLock(dir) { 1 } == 1, "lock leaked after exception")

    val held = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => WriterLock.withLock(dir) {
      held.countDown(); release.await()
    })
    holder.start(); held.await()
    val e = intercept[IllegalStateException] {
      WriterLock.withLock(dir, timeoutMs = 200) { fail("must not enter") }
    }
    assert(e.getMessage.contains("WriterLock"), e.getMessage)
    release.countDown(); holder.join()
  }

  test("concurrent minhash appends serialize: both batches land, stamps in sync") {
    import spark.implicits._
    def docs(from: Int, n: Int): DataFrame =
      (from until from + n).map { i =>
        val words = (0 until 12).map(j => s"w${math.abs((i * 31 + j * 7) % 50)}")
        (i.toLong, "s", words.mkString(" "))
      }.toDF("doc_id", "source", "text")
    val dir = tmp() + "/idx"
    DedupOps.writeMinhashIndex(spark, docs(0, 60), dir)
    // two concurrent appenders, disjoint id ranges
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def appender(from: Int): Thread = new Thread(() =>
      try DedupOps.appendToMinhashIndex(spark, docs(from, 40), dir)
      catch { case t: Throwable => errs.add(t) })
    val ts = Seq(appender(200), appender(400))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"append failed: ${errs.peek()}")
    // every appended row is present in BOTH tiers (the _temporary race
    // used to silently drop one job's files)
    val stored = spark.read.parquet(s"$dir/cbuckets")
      .select("doc_id").distinct().count()
    assert(stored == 60 + 40 + 40, s"signature rows lost: $stored of 140")
    // the fence reconverged: pruned probes stay on the fast path
    assert(graft.sources.GenStamp.prunedProbeOk(spark,
      s"$dir/cbuckets", s"$dir/pbands", "minhash",
      "DedupOps.rebuildMinhashProbeLayout"),
      "append-generation stamps diverged after serialized appends")
    // and both batches are PROBE-visible: a near-dup of one doc from
    // each batch must be flagged
    val probe = (Seq(205, 405).map { i =>
      val words = (0 until 12).map(j => s"w${math.abs((i * 31 + j * 7) % 50)}")
      (9000L + i, words.take(11).mkString(" "))
    }).toDF("doc_id", "text")
    val hits = DedupOps.dedupAgainstIndex(spark, probe, dir)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(hits.contains(205L) && hits.contains(405L),
      s"probe missed an appended batch: hits=$hits")
  }
}
