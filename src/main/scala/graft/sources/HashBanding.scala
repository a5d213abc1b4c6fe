package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Modality-agnostic banded 64-bit perceptual-hash dedup engine — the
  * shared core under image aHash dedup (ImageCodec) and audio envelope
  * dedup (AudioCodec), and the same LSH-banding shape as the SimHash
  * text path (DedupOps).
  *
  * The 64-bit hash splits into four 16-bit bands; by pigeonhole, any two
  * hashes at Hamming distance <= 3 share at least one identical band, so
  * the band equi-join has EXACT recall at that threshold and candidates
  * stay linear in bucket sizes — never all-pairs. Every candidate is
  * verified with a popcount on the XOR, so precision is exact too.
  *
  * Input contract for both entry points: a frame with columns
  * `asset_id` (long) and `ahash` (long), already filtered to decodable
  * rows. Callers should barrier (lazy localCheckpoint) any hash frame
  * whose lineage contains a codec pass — see perceptualDupPairs'
  * measured note.
  */
object HashBanding {

  val Bands = 4
  val BandBits = 16
  val MaxGuaranteedHamming = 3

  private def banded(hashes: DataFrame, idAs: String, hashAs: String): DataFrame =
    hashes.select(col("asset_id").as(idAs), col("ahash").as(hashAs),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> (shiftrightunsigned(ahash, b * $BandBits) & ${(1 << BandBits) - 1}))"))
        .as(Seq("band_idx", "band_val")))

  /** Self-join: all pairs (a_id < b_id) at Hamming <= maxHamming. */
  def pairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= MaxGuaranteedHamming,
      s"${Bands}x$BandBits banding only guarantees recall for Hamming <= " +
        s"$MaxGuaranteedHamming, got $maxHamming")
    banded(hashes, "a_id", "a_hash")
      .join(banded(hashes, "b_id", "b_hash"), Seq("band_idx", "band_val"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_hash ^ b_hash)").cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Batch-vs-corpus probe: (batch_id, corpus_id, hamming) at
    * Hamming <= maxHamming — linear in batch size. */
  def probe(batch: DataFrame, stored: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= MaxGuaranteedHamming,
      s"${Bands}x$BandBits banding only guarantees recall for Hamming <= " +
        s"$MaxGuaranteedHamming, got $maxHamming")
    banded(batch, "batch_id", "b_hash")
      .join(banded(stored, "corpus_id", "c_hash"), Seq("band_idx", "band_val"))
      .select(col("batch_id"), col("corpus_id"),
        expr("bit_count(b_hash ^ c_hash)").cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
