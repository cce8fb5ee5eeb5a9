package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-scoped memo of ACCUMULATED scratch stores — the CorpusPrep
  * discipline applied to store DIRECTORIES. The audit tier's keyed
  * queries (c67/c68/c72/c77) read stores built by replaying a batch
  * history through the live gates' own `processBatch` code; a
  * deployment accumulates that state ONCE and every consumer reads
  * it, so inside a multi-query session (Verify, Bench, a notebook)
  * the replay runs once per (corpus, geometry) and each audit query
  * prices as a store READ plus its own report derivation, not a
  * rebuild. This is the same adjudication as the c35 bit-table memo:
  * charging every query for the gate's setup cost would measure the
  * harness, not the operator.
  *
  * Keys carry the corpus dir and every geometry parameter that shapes
  * the store (batch count, shingle width, caps); the session is part
  * of the map key, and the scratch root is appId-scoped so two
  * drivers never collide on disk. Builds are serialized under one
  * coarse lock (they are rare — once per corpus per session); hits
  * are a single map lookup. Directories are reaped at JVM exit.
  *
  * Anyone who rewrites a corpus dir IN PLACE (ScaleSmoke's work dir)
  * must call [[invalidate]] alongside `CorpusPrep.invalidate()` —
  * same staleness contract, same fix. */
private[graft] object StoreMemo {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private val lock = new Object

  /** Return the scratch root for `key`, running `build(root)` exactly
    * once per (session, key) to populate it. The root is cleared
    * before the build and scheduled for deletion at JVM exit. */
  def memo(spark: SparkSession, key: String)(build: String => Unit): String = {
    val k = (spark, key)
    cache.get(k) match {
      case Some(root) => root
      case None =>
        lock.synchronized {
          cache.get(k).getOrElse {
            cache.keys.foreach { c => if (c._1.sparkContext.isStopped) cache.remove(c) }
            val root = System.getProperty("java.io.tmpdir") + "/graft_store_" +
              key.replaceAll("[^A-Za-z0-9._-]", "_") +
              "_" + spark.sparkContext.applicationId
            val p = new org.apache.hadoop.fs.Path(root)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(p)) fs.delete(p, true)
            fs.deleteOnExit(p)
            build(root)
            cache.put(k, root)
            root
          }
        }
    }
  }

  // driver-side caches of COLLECTED store artifacts (Similarity's
  // codebook/centroid arrays) must drop with the stores they were
  // collected from — roots are rebuilt IN PLACE on invalidate, so a
  // surviving array cache would serve the old store's values
  private val onInvalidate = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  private[graft] def registerInvalidateHook(f: () => Unit): Unit =
    lock.synchronized { onInvalidate += f }

  /** Drop all entries — call after mutating a corpus path in place. */
  def invalidate(): Unit = {
    cache.clear()
    lock.synchronized(onInvalidate.toList).foreach(_())
  }
}
