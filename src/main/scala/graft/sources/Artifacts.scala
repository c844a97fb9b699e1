package graft.sources

import org.apache.spark.sql.SparkSession

/** Marker-guarded build-once protocol for persisted artifacts (index
  * layouts, oracle fixtures): if `root/markerName` exists the artifact
  * is reused, otherwise `build` runs and the marker is written last, so
  * a crashed half-build never passes for complete. All IO goes through
  * the Hadoop FileSystem resolved from the path — local disk and
  * HDFS/S3 behave identically. One implementation for every artifact
  * (IVF index, media fixtures) so hardening lands in one place.
  *
  * Concurrency contract: builders within ONE JVM are serialized per
  * marker path, and a lost marker-create race (another writer finished
  * while ours built — both builds are deterministic, so the bytes are
  * identical) is treated as success. Across JVMs the protocol assumes a
  * SINGLE WRITER per root: two drivers racing the same unbuilt root can
  * interleave `mode=overwrite` writes with the other's reads, which no
  * marker can repair — coordinate externally (pre-build the artifact,
  * or give each driver its own root) in multi-driver deployments.
  */
object Artifacts {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Delete sibling roots under `base` that share `prefix` (same source
    * table) but are not `keep` (the current fingerprint): every
    * regeneration of the source parquet mints a fresh fingerprinted root,
    * and without this the dead ones accumulate on disk forever. Best
    * effort — a prune failure (permissions, concurrent reader on another
    * driver) must never fail the query that triggered it.
    *
    * Assumes one live source per basename under `base`: two source dirs
    * sharing a basename (`/a/sf0.1` and `/b/sf0.1`) would prune each
    * other's roots on alternating access. Give such deployments distinct
    * artifact bases via the `spark.graft.*Root` confs.
    */
  def pruneStaleSiblings(s: SparkSession, base: String, prefix: String, keep: String): Unit =
    try {
      val basePath = new org.apache.hadoop.fs.Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath))
        fs.listStatus(basePath).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory && n.startsWith(prefix) && n != keep)
            fs.delete(st.getPath, true)
        }
    } catch { case _: Throwable => () }

  def ensureOnce(s: SparkSession, root: String, markerName: String)(build: => Unit): Unit = {
    val key = s"$root/$markerName"
    locks.computeIfAbsent(key, _ => new Object).synchronized {
      val marker = new org.apache.hadoop.fs.Path(key)
      val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        build
        try fs.create(marker, false).close()
        catch {
          // Exists-after-build: a concurrent writer completed the same
          // deterministic build first; ours is byte-identical — success.
          case _: java.io.IOException if fs.exists(marker) => ()
        }
      }
    }
  }
}
