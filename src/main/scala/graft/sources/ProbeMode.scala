package graft.sources

import org.apache.spark.sql.SparkSession

/** Deployment-mode selector for the per-modality index probes — the
  * policy face of BASELINE.md's measured probe economics, so an operator
  * (or a pipeline's config layer) does not have to re-derive the
  * crossover from the bench tables:
  *
  *  - **ScanCached** while the post-tombstone static side fits the
  *    cluster's storage-memory budget: the stream-static gate with
  *    `cacheStatic = true` has the lowest per-trigger constant of all
  *    three shapes (each trigger reads cached blocks; StaticCache keeps
  *    exactly one entry per index with fingerprint staleness).
  *  - **Scan** (uncached stream-static gate) while the corpus-
  *    proportional parquet re-scan per trigger is still cheaper than
  *    pruned mode's fixed multi-job constant — measured at sf0.1 ×1:
  *    scan 0.40–0.77 s/trigger vs pruned 1.27–1.72 s (r16 table).
  *  - **Pruned** (band-partitioned foreachBatch probe) once the index
  *    outgrows both: per-trigger cost is then O(batch keys) row groups
  *    and independent of corpus size — the only shape that holds at
  *    100 TB (measured flat ×1→×50; scan mode grew 2.3–3.6×).
  *
  * The inputs are planning-time FS stats (no job): the index
  * directory's on-disk bytes. `crossoverBytes` defaults to 256 MiB —
  * deliberately conservative (the measured sf0.1 ×50 crossover sits
  * near ~50 MiB of index bytes on an idle local box; a real cluster's
  * scan throughput is higher, pushing the crossover up). It is a KNOB,
  * not a constant of nature: re-measure with `ScaleSmoke probe` on the
  * deployment's hardware and pass the observed value.
  */
object ProbeMode {

  sealed trait Mode
  /** Stream-static gate, `cacheStatic = true` (StaticCache registry). */
  case object ScanCached extends Mode
  /** Stream-static gate, uncached per-trigger parquet re-scan. */
  case object Scan extends Mode
  /** Band-partitioned foreachBatch batch probe (BandBuckets layout). */
  case object Pruned extends Mode

  /** Recommend a probe shape for the index under `indexDir`.
    *
    * `cacheBudgetBytes`: how much storage memory the deployment is
    * willing to pin for THIS index (0 disables ScanCached).
    * `crossoverBytes`: index size above which the pruned probe's fixed
    * constant beats the per-trigger re-scan (see scaladoc).
    *
    * Pruned additionally requires the band-partitioned layout to exist
    * and be in sync with its signature table (GenStamp) — a diverged or
    * absent layout falls back to Scan, matching what the probe itself
    * would do. `primaryTable` names the signature table the layout is
    * derived from (`cbuckets`, `hashes`, or `grouped`). */
  def recommend(s: SparkSession, indexDir: String, primaryTable: String,
      cacheBudgetBytes: Long, crossoverBytes: Long = 256L << 20): Mode = {
    require(cacheBudgetBytes >= 0, s"cacheBudgetBytes must be >= 0, got $cacheBudgetBytes")
    require(crossoverBytes >= 0, s"crossoverBytes must be >= 0, got $crossoverBytes")
    val bytes = graft.plans.Scale.sourceBytes(s, indexDir)
    // strict guard (r16 advice): an empty / not-yet-written index
    // (bytes = 0) must not satisfy a DISABLED cache budget (0 means
    // "never pin") — and pinning nothing buys nothing, so a 0-byte
    // index takes the Scan path regardless of budget
    if (cacheBudgetBytes > 0 && bytes > 0 && bytes <= cacheBudgetBytes) ScanCached
    else if (bytes <= crossoverBytes) Scan
    else {
      val layoutUsable = GenStamp.prunedProbeOk(s,
        s"$indexDir/$primaryTable", s"$indexDir/pbands",
        "probe-mode selector", "the family's rebuild*ProbeLayout")
      if (layoutUsable) Pruned else Scan
    }
  }
}
