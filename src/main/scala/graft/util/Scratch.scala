package graft.util

/** Session-scoped venue scratch: every demo/venue temp directory an
  * operator materializes registers for JVM-exit GC ([[Lease.gcOnExit]]
  * — the same hook the ANN index's loser-path local copies use).
  *
  * Why this exists: venue scratch is write-once-read-within-run, but
  * `Files.createTempDirectory` outlives the JVM, so successive bench/
  * soak runs ACCUMULATE dead bytes — the sf10 full-surface venue's
  * format roundtrip alone leaves ~58 GB, and one day of r11 soaks
  * filled this box to 93%, silently turning every I/O-bound query
  * into a writeback victim and finally killing a run with "No space
  * left on device" (BENCH_NOTES r11). Exit GC bounds the footprint to
  * ONE run's working set without changing in-run lifetime (results
  * stay readable until exit, which is the venue contract). */
object Scratch {
  def path(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Lease.gcOnExit(p)
    p
  }

  def dir(prefix: String): String = path(prefix).toString
}
