package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.{ConcurrentHashMap, TimeUnit}
import java.util.concurrent.locks.ReentrantLock

/** Single-writer exclusion for multi-file index/landing mutations.
  *
  * DURABILITY.md's fences make every mutation CRASH-safe; this makes the
  * mutators CONCURRENCY-safe. Without it, two simultaneous writers to the
  * same index root can corrupt state the crash fences cannot see:
  * Hadoop's FileOutputCommitter stages every append job under the same
  * `<table>/_temporary/0` path, so a second job's cleanup deletes the
  * first job's in-flight task files (silently dropped rows), and
  * GenStamp's read-bump-write generation counters interleave into a
  * lost update that can leave primary == derived over a layout missing
  * one writer's rows — "in sync" stamps over a diverged table, the one
  * state the probes' divergence check trusts blindly.
  *
  * Two tiers, both scoped to the mutation's root directory:
  *  - in-process: a fair ReentrantLock per canonical root — serializes
  *    the threads of one JVM (the one-driver Spark app, the test
  *    harness, a multi-stream driver running several sinks).
  *  - cross-JVM (local/shared-posix filesystems only): an OS file lock
  *    on `<root>/_graft_writer_lock`, taken when the in-process hold
  *    count reaches 1. Released automatically if the JVM dies — no
  *    stale-lock sweeps. On paths with a non-file scheme (hdfs://,
  *    s3a://) the file-lock tier is skipped: object stores have no
  *    primitive for this, which is the same reason Delta-on-S3 needs an
  *    external LogStore. There, one writer per index root is a
  *    DEPLOYMENT contract (one driver owns an index), and this lock
  *    still covers everything inside that driver.
  *
  * Reentrant per thread (an ingest loop that lands a batch and then
  * appends to the same family's index nests two `withLock` scopes), and
  * exception-safe (both tiers release on the way out). `timeoutMs`
  * bounds the wait on a busy root and fails LOUDLY with the holder's
  * lock path — a wedged writer must surface as an error naming the
  * contended root, not as a silent queue.
  */
object WriterLock {

  private val locks = new ConcurrentHashMap[String, ReentrantLock]()

  private def schemeOf(dir: String): Option[String] =
    try Option(java.net.URI.create(dir.replace(" ", "%20")).getScheme)
    catch { case _: IllegalArgumentException => None } // URI-hostile → local

  /** Canonical key: scheme-less local paths and file: URIs coincide. */
  private def keyOf(dir: String): String = schemeOf(dir) match {
    case None =>
      Paths.get(dir).toAbsolutePath.normalize.toString
    case Some("file") =>
      Paths.get(java.net.URI.create(dir.replace(" ", "%20")).getPath)
        .toAbsolutePath.normalize.toString
    case _ => dir
  }

  private def isLocalPath(dir: String): Boolean =
    schemeOf(dir).forall(_ == "file")

  /** Run `f` as the exclusive writer of `dir`. */
  def withLock[T](dir: String, timeoutMs: Long = 600000L)(f: => T): T = {
    val key = keyOf(dir)
    val rl = locks.computeIfAbsent(key, _ => new ReentrantLock(true))
    if (!rl.tryLock(timeoutMs, TimeUnit.MILLISECONDS))
      throw new IllegalStateException(
        s"WriterLock: another writer has held $key for over ${timeoutMs / 1000}s " +
          "— concurrent index mutation is serialized by design (DURABILITY.md, " +
          "Concurrent writers); raise timeoutMs if the other mutation is " +
          "legitimately long, or find the wedged writer")
    var ch: FileChannel = null
    var fl: java.nio.channels.FileLock = null
    try {
      if (rl.getHoldCount == 1 && isLocalPath(dir)) {
        val root = Paths.get(key)
        Files.createDirectories(root)
        ch = FileChannel.open(root.resolve("_graft_writer_lock"),
          StandardOpenOption.CREATE, StandardOpenOption.WRITE)
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        // poll tryLock: FileChannel.lock() is uninterruptible and has no
        // timeout; 50 ms polling keeps the cross-JVM wait bounded
        while (fl == null) {
          fl = ch.tryLock()
          if (fl == null) {
            if (System.nanoTime() > deadline) {
              ch.close()
              throw new IllegalStateException(
                s"WriterLock: another JVM holds $key/_graft_writer_lock " +
                  s"(waited ${timeoutMs / 1000}s)")
            }
            Thread.sleep(50)
          }
        }
      }
      f
    } finally {
      if (fl != null) fl.release()
      if (ch != null) ch.close()
      rl.unlock()
    }
  }
}
