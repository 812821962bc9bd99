package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's ACID table commits over plain parquet: every write lands
  * in a fresh immutable `v=N` snapshot directory, and a one-line
  * `_CURRENT` manifest names the live version. The manifest is the ONLY
  * mutable object and it changes via an atomic rename, so a reader
  * either sees the old snapshot or the new one — never a half-written
  * merge. (The same pointer-swap commit protocol Delta/Iceberg build
  * their logs on, reduced to a single head pointer: no time travel, one
  * writer at a time — the missing piece vs a real table format is a
  * compare-and-swap for concurrent writers.)
  *
  * Crash anatomy (proven in SnapshotSpec):
  *  - crash while writing `v=N+1` → pointer still names `v=N`; the
  *    orphan directory is invisible to readers (they never list, they
  *    follow the pointer) and the next commit claims a HIGHER version,
  *    never reusing the orphan's name for different content.
  *  - crash between finishing `v=N+1` and the pointer swap → same:
  *    readers stay on `v=N`; the completed-but-unreferenced snapshot is
  *    garbage to be collected.
  *  - the swap itself is a single metadata-atomic rename (HDFS
  *    FileContext rename-OVERWRITE; CREATE+rename on the local FS), so
  *    there is no window where `_CURRENT` is missing or truncated.
  *
  * Reference had no table format at all (overwrite-only,
  * `server.py:53-54`); this gives the MERGE/CDC operators (`of4`/`of5`
  * shapes) snapshot-isolated commits without any new dependency.
  */
object Snapshot {
  private val Pointer = "_CURRENT"

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live version, or None for an empty/new table. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val ptr = new org.apache.hadoop.fs.Path(root, Pointer)
    val fs = fsOf(spark, ptr)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Read the live snapshot (the only read path — readers never list
    * version directories, so unreferenced snapshots are invisible). */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no committed version"))
    spark.read.parquet(s"$root/v=$v")
  }

  /** Commit `df` as the next snapshot: write `v=N+1` fully, then swap
    * the pointer atomically. Returns the committed version. The next
    * version is 1 + max(pointer value, any existing `v=*` dir), so a
    * crashed writer's orphan directory is never re-pointed at. */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, rootPath)
    fs.mkdirs(rootPath)
    // strict v=\d+ match: a stray non-numeric entry (editor artifact,
    // leftover v=tmp) must not NumberFormatException every future commit
    val dirMax = fs.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+") => n.drop(2).toLong }
      .maxOption.getOrElse(0L)
    val next = math.max(currentVersion(spark, root).getOrElse(0L), dirMax) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    setPointer(spark, root, next)
    next
  }

  /** Atomic pointer swap: write `_CURRENT.tmp`, then rename over the
    * pointer. FileContext's OVERWRITE rename is the atomic primitive on
    * both HDFS and the local FS (plain FileSystem.rename refuses to
    * replace an existing destination). */
  private[graft] def setPointer(spark: SparkSession, root: String,
                                    v: Long): Unit = {
    val ptr = new org.apache.hadoop.fs.Path(root, Pointer)
    val tmp = new org.apache.hadoop.fs.Path(root, Pointer + ".tmp")
    val fs = fsOf(spark, ptr)
    val out = fs.create(tmp, true)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      ptr.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Copy-on-write keyed MERGE as a snapshot commit: replace matching
    * keys with the change batch, keep the rest, commit the result as a
    * new version. Readers concurrent with the merge see the old
    * snapshot until the single pointer swap. One keyed shuffle over the
    * base (the change side is typically small and broadcasts). */
  def mergeCommit(spark: SparkSession, root: String, changes: DataFrame,
                  key: String): Long = {
    val base = readCurrent(spark, root)
    val merged = changes.unionByName(
      base.join(changes.select(key), Seq(key), "left_anti"))
    commit(merged, root)
  }

  /** Write a snapshot directory WITHOUT swapping the pointer — the
    * "crashed after data write, before commit" state, exposed so the
    * spec can construct it deterministically. */
  private[graft] def writeOrphan(df: DataFrame, root: String,
                                 v: Long): Unit =
    df.write.mode("overwrite").parquet(s"$root/v=$v")
}
