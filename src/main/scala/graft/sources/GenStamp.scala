package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Append-GENERATION fencing for index families whose logical append
  * spans multiple parquet commits — a primary signature table
  * (`cbuckets` / `hashes` / `grouped`) plus the derived band-partitioned
  * probe layout (`pbands`, BandBuckets).
  *
  * The hazard this closes (r15 verdict, What's wrong #1): the two
  * tables land as SEPARATE jobs, so a crash between the commits leaves
  * the probe layout missing a batch the primary already holds — and a
  * literal-pruned probe over the stale layout then silently returns
  * FALSE NEGATIVES (missed duplicates) that the full-scan fallback
  * would have caught. Nothing detected the divergence; the layout is
  * cheaply re-derivable, but nobody knew to call the rebuild.
  *
  * The fence is a monotone generation counter stamped into a `_`-prefixed
  * marker file inside each table directory (parquet readers skip
  * underscore files, same as `_SUCCESS`), written temp-then-atomic-rename
  * — the ivfBatchStore marker discipline (VectorOps.ivfBatchStore)
  * generalized to the banded families. Append protocol:
  *
  *  1. `beginAppend(primary)`: bump the PRIMARY's stamp to g+1 BEFORE
  *     its data commit — an intent record. From this instant until step
  *     3 the stamps DISAGREE, so any probe that lands in the window
  *     takes the full-scan fallback (conservative: at worst it rescans,
  *     it never misses).
  *  2. append the primary's data, then the probe layout's data.
  *  3. `stamp(derived, g+1)`: the layout has caught up; pruned probes
  *     are safe again.
  *
  * Every crash point therefore degrades to the full-scan probe, never
  * to a silent miss: a crash before the primary commit leaves the batch
  * unadmitted entirely (the caller's Ledger retry re-runs the append);
  * a crash after it leaves the stamps diverged until the retry or a
  * `rebuild*ProbeLayout` reconverges them. Stamps absent on BOTH sides
  * read as generation 0 — a pre-fencing index is in sync by convention
  * (its layout was derived from the primary at write time), so old
  * indexes keep their pruned probes without a rewrite.
  */
object GenStamp {

  val Marker = "_graft_gen"

  /** The table's current append generation; 0 when the marker is absent
    * (pre-fencing table, or a table whose directory was just
    * overwritten — a full overwrite resets the clock on both sides). */
  def read(s: SparkSession, tablePath: String): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new Path(tablePath, Marker)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      new String(buf, "UTF-8").trim.toLong
    }
  }

  /** Write `gen` as the table's marker, temp-then-atomic-rename so a
    * reader never sees a torn stamp. */
  def stamp(s: SparkSession, tablePath: String, gen: Long): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val dir = new Path(tablePath)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val qdir = fs.makeQualified(dir)
    val tmp = new Path(qdir, s"$Marker.tmp.${ProcessHandle.current.pid}")
    val out = fs.create(tmp, true)
    try out.write(gen.toString.getBytes("UTF-8")) finally out.close()
    FileContext.getFileContext(qdir.toUri, conf)
      .rename(tmp, new Path(qdir, Marker), Options.Rename.OVERWRITE)
  }

  /** Step 1 of the append protocol: bump the primary's generation BEFORE
    * its data commit and return the new generation the caller stamps
    * onto the derived layout after ITS commit. */
  def beginAppend(s: SparkSession, primaryPath: String): Long = {
    val g = read(s, primaryPath) + 1
    stamp(s, primaryPath, g)
    g
  }

  /** Reconverge after a full (re-)derivation of the layout: the derived
    * table now reflects the primary exactly, so it takes the primary's
    * current generation. Called by every `rebuild*ProbeLayout`. */
  def syncDerived(s: SparkSession, primaryPath: String, derivedPath: String): Unit =
    stamp(s, derivedPath, read(s, primaryPath))

  /** Pruned-probe eligibility: the layout exists AND its generation
    * matches the primary's. A mismatch means an append crashed between
    * the two commits — the pruned scan would silently miss that batch's
    * rows, so the probe must take the full-scan fallback; this logs the
    * divergence loudly with the rebuild that reconverges it. */
  def prunedProbeOk(s: SparkSession, primaryPath: String, derivedPath: String,
      family: String, rebuild: String): Boolean =
    BandBuckets.exists(s, derivedPath) && {
      val gp = read(s, primaryPath)
      val gd = read(s, derivedPath)
      gp == gd || {
        System.err.println(
          s"[graft] $family probe layout is DIVERGED from its signature table " +
            s"(primary gen $gp, layout gen $gd — an append crashed between the " +
            s"two commits); probing via the full scan until $rebuild reconverges " +
            "the layout")
        false
      }
    }
}
