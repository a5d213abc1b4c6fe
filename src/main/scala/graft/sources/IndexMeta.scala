package graft.sources

import org.apache.spark.sql.Row

/** On-disk LAYOUT versioning for the persisted index families.
  *
  * The r11 rework changed what the index directories physically hold —
  * MinHash `bands` → grouped `cbuckets`, embed-LSH likewise, video
  * `hashes`+`counts` → one `grouped` table — while signature BITS stayed
  * identical (any two frames signed with the same parameters are
  * join-compatible regardless of engine vintage; see the
  * MinHashBuckets scaladoc). Signature compatibility is useless if the
  * reader expects tables the directory doesn't contain: probing a
  * pre-r11 index with post-r11 code used to die on a raw
  * path-not-found, and an existence check keyed on the NEW table name
  * silently treated the old index as absent — corpus dedup skipped,
  * duplicates admitted. So every index family now stamps the layout
  * generation it writes into its 1-row meta table, and every reader
  * checks it FIRST and fails with an actionable rebuild message on
  * mismatch — the HashBanding.requireMeta discipline extended from band
  * geometry to directory shape.
  *
  * A meta row with no `layout` column is a pre-stamping index: layout 1.
  * That keeps the families whose physical shape never changed (image/
  * audio flat `hashes`) readable without rewrite, and makes every
  * pre-r11 grouped-family index fail loudly instead of mis-probing.
  */
object IndexMeta {

  /** Memoized read of a 1-row meta table, keyed by the meta directory's
    * file fingerprint (name, size, mtime triples). Every per-micro-batch
    * probe starts by reading its index's meta row; uncached that is one
    * whole Spark job per trigger per family (~0.1-0.3 s of the pruned
    * probe's fixed per-trigger constant, BASELINE.md r15). The
    * fingerprint makes a rewrite of the meta (index rebuild, layout
    * upgrade) invalidate the entry — same staleness discipline as
    * StaticCache — and a missing directory is NOT cached (the read
    * throws, as the uncached path would). */
  private val metaCache =
    scala.collection.mutable.HashMap.empty[(String, String), Row]

  private def fingerprint(s: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("\n")
  }

  def headCached(s: org.apache.spark.sql.SparkSession, path: String): Row = {
    val key = (path, fingerprint(s, path))
    metaCache.synchronized(metaCache.get(key)) match {
      case Some(r) => r
      case None =>
        val r = s.read.parquet(path).head()
        metaCache.synchronized {
          // one live generation per path: drop stale fingerprints
          metaCache.filterInPlace { case ((p, _), _) => p != path }
          metaCache.update(key, r)
        }
        r
    }
  }

  /** Flat per-item tables (image/audio `hashes`) — the original shape,
    * still current for those families. */
  val FlatLayout = 1

  /** The r11 grouped/id-bucketed shape (minhash + embed-LSH `cbuckets`,
    * video `grouped`): one row per item carrying its full signature,
    * IdBuckets-partitioned for bounded compaction. */
  val GroupedLayout = 2

  /** The layout generation a meta row declares (absent column =
    * pre-stamping = [[FlatLayout]]). */
  def layoutOf(meta: Row): Int =
    if (meta.schema.fieldNames.contains("layout")) meta.getAs[Int]("layout")
    else FlatLayout

  /** Fail loudly on a layout mismatch. `rebuild` names the writer the
    * operator should re-run (e.g. "DedupOps.writeMinhashIndex") — a
    * layout migration is a rebuild, deliberately: the grouped forms are
    * derived data and rebuilding is one pass over the corpus, while an
    * in-place migrator would be a second writer to keep correct
    * forever. */
  def requireLayout(meta: Row, expected: Int, family: String,
      rebuild: String): Unit = {
    val got = layoutOf(meta)
    require(got == expected,
      s"$family index: on-disk layout v$got, this engine reads v$expected — " +
        s"rebuild the index with $rebuild (reading across layouts would " +
        "fail on missing tables or silently skip corpus dedup)")
  }
}
