package graft.util

import org.apache.spark.sql.SparkSession

/** File-level fingerprint of a table path (name/len/mtime per leaf
  * file — namenode metadata only, no data pages). The family-wide
  * staleness discipline: every memo whose value is DERIVED from a
  * fixture's data (id-domain probes, LSH/IVF geometry, state widths)
  * keys on this, so a fixture whose contents change mid-session —
  * files rewritten, appended, or vacuumed — re-probes instead of
  * silently reusing a decision measured against bytes that no longer
  * exist. */
object Fingerprint {
  def of(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      var h = 1125899906842597L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        h = h * 31 + f.getPath.getName.hashCode
        h = h * 31 + f.getLen
        h = h * 31 + f.getModificationTime
      }
      java.lang.Long.toHexString(h)
    }
  }
}
