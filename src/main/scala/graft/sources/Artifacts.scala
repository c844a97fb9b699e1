package graft.sources

import org.apache.spark.sql.SparkSession

/** Marker-guarded build-once protocol for persisted artifacts (index
  * layouts, oracle fixtures): if `root/markerName` exists the artifact
  * is reused, otherwise `build` runs and the marker is written last, so
  * a crashed half-build never passes for complete. All IO goes through
  * the Hadoop FileSystem resolved from the path — local disk and
  * HDFS/S3 behave identically. One implementation for every artifact
  * (IVF index, media fixtures) so hardening lands in one place.
  */
object Artifacts {
  def ensureOnce(s: SparkSession, root: String, markerName: String)(build: => Unit): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$root/$markerName")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      build
      fs.create(marker, false).close()
    }
  }
}
