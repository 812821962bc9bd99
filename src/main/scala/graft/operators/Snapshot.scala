package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's ACID table commits over plain parquet: every write lands
  * in a fresh immutable `v=N` snapshot directory, and a one-line
  * `_CURRENT` manifest names the live version. The manifest is the ONLY
  * mutable object and it changes via an atomic rename, so a reader
  * either sees the old snapshot or the new one — never a half-written
  * merge. (The same pointer-swap commit protocol Delta/Iceberg build
  * their logs on, reduced to a single head pointer: no time travel.)
  *
  * Concurrent writers serialize through a VERSION CLAIM: before writing
  * `v=N`, a committer must win `_claims/N` via an atomic
  * create-exclusive (NameNode-atomic rename-WITHOUT-overwrite on HDFS;
  * kernel-atomic O_EXCL create on `file:` URIs, where Hadoop's rename
  * is only check-then-act) — exactly one racing writer succeeds, every
  * loser observes the conflict and retries against the new state
  * instead of silently overwriting the winner's data directory and
  * pointer (the pre-claim protocol's failure mode). A won claim is
  * additionally REFUSED if the version was already decided (data dir
  * present or pointer ≥ it), so claim-file GC can never re-open a
  * committed version. Read-modify-write commits ([[mergeCommit]])
  * claim exactly `pointer+1`, which makes them serializable: winning
  * that claim proves no other committer can finalize `pointer+1`, so
  * the base the merge read from is the true predecessor snapshot. The
  * pointer swap itself runs under a leased `_ptrlock` critical section
  * so committers of DIFFERENT versions cannot interleave their
  * read-compare-rename and regress the pointer.
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

  private val ManifestDir = "_manifest"

  /** `input_file_name`-format URI for a listed file. The local FS
    * prints `file:/x` from `Path.toString` but `file:///x` from the
    * scan's `input_file_name` — one canonical form keeps manifest
    * entries and stats-manifest `file` keys joinable (schemes with an
    * authority, e.g. `hdfs://nn/x`, already agree). */
  private def canonFile(p: org.apache.hadoop.fs.Path): String = {
    val s = p.toString
    if (s.startsWith("file:/") && !s.startsWith("file://"))
      "file://" + s.stripPrefix("file:")
    else s
  }

  private val SchemaDir = "_schema"

  /** Record version `v`'s LOGICAL schema (`_schema/v=N.json`) — the
    * schema-evolution backbone: a version whose manifest mixes file
    * generations (old files without a later-added column) is read with
    * this schema EXPLICITLY, so parquet fills the missing columns with
    * NULL and no footer is ever read for inference (the 1000-file soak
    * measured footer inference as the O(files) read to avoid). One tiny
    * driver-side file per version, same lifecycle as the manifests. */
  private def writeSchema(spark: SparkSession, root: String, v: Long,
                          schema: org.apache.spark.sql.types.StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, s"$SchemaDir/v=$v.json")
    val fs = fsOf(spark, p)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** Version `v`'s recorded logical schema, or None for a version
    * committed before schema tracking (reads fall back to inference). */
  private[graft] def schemaOf(spark: SparkSession, root: String, v: Long)
      : Option[org.apache.spark.sql.types.StructType] = {
    val p = new org.apache.hadoop.fs.Path(root, s"$SchemaDir/v=$v.json")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** ADD-COLUMN evolution: base columns keep their position, batch-only
    * columns append. A same-name column must keep its type — anything
    * else (rename, retype, drop) is not an additive append and fails
    * fast rather than silently corrupting carried files' reads. */
  private def mergedSchema(base: org.apache.spark.sql.types.StructType,
                           batch: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val baseNames = base.fieldNames.toSet
    base.fields.foreach { f =>
      batch.fields.find(_.name == f.name).foreach { g =>
        require(g.dataType == f.dataType,
          s"schema evolution is ADD-COLUMN only: ${f.name} is " +
            s"${f.dataType.simpleString} in the table but " +
            s"${g.dataType.simpleString} in the batch")
      }
    }
    org.apache.spark.sql.types.StructType(
      base.fields ++ batch.fields.filterNot(f => baseNames(f.name)))
  }

  private val ConstraintsDir = "_constraints"

  /** A commit rejected by a CHECK constraint: the constraint's name
    * plus how many of the batch's rows failed it. The version
    * directory written before validation stays an unreferenced orphan
    * (the standard crash anatomy — readers follow the pointer and
    * never see it; [[vacuum]] collects it). */
  final class ConstraintViolation(val constraint: String,
                                  val nViolations: Long, msg: String)
    extends IllegalArgumentException(msg)

  /** The CHECK constraints active at version `v`: a constraint
    * add/drop writes the FULL new set at its own version, so
    * resolution is one O(constraint-changes) directory listing plus
    * one tiny parquet read of the highest set at-or-below `v` — never
    * a log replay, and versions committed between constraint changes
    * need no per-version copy. */
  def checkConstraintsOf(spark: SparkSession, root: String,
                         v: Long): Seq[(String, String)] = {
    val dir = new org.apache.hadoop.fs.Path(root, ConstraintsDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) return Nil
    val vs = fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+") => n.stripPrefix("v=").toLong }
      .filter(_ <= v)
    if (vs.isEmpty) Nil
    else {
      val rows = spark.read.parquet(s"$root/$ConstraintsDir/v=${vs.max}")
        .select("name", "expr").collect()
      rows.map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
    }
  }

  private def writeConstraintSet(spark: SparkSession, root: String,
                                 v: Long,
                                 cs: Seq[(String, String)]): Unit = {
    import spark.implicits._
    cs.toDF("name", "expr").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$ConstraintsDir/v=$v")
  }

  /** Violation counts of `df` against each constraint — ONE aggregate
    * scan reading only the constraint columns (column-pruned when `df`
    * is a fresh-files read-back). SQL CHECK semantics: a NULL
    * predicate passes (only definite FALSE violates). */
  private def violationCounts(df: DataFrame,
                              cs: Seq[(String, String)])
      : Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    if (cs.isEmpty) return Nil
    val aggs = cs.map { case (n, e) =>
      sum(when(!coalesce(expr(e).cast("boolean"), lit(true)), 1L)
        .otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cs.zipWithIndex.map { case ((n, _), i) =>
      (n, if (row.isNullAt(i)) 0L else row.getLong(i))
    }
  }

  /** Enforce the base version's CHECK constraints on the parquet just
    * written into `v=next`, BEFORE the pointer swap — reading back the
    * written files (the [[writeStats]] pattern) costs one column-pruned
    * scan of the BATCH and never re-executes the input plan; a
    * violation throws and the orphaned directory never becomes
    * visible. */
  private def enforceWritten(spark: SparkSession, root: String,
                             next: Long, base: Long): Unit = {
    val cs = checkConstraintsOf(spark, root, base)
    if (cs.isEmpty) return
    // constraints are authored in LOGICAL names; the written files are
    // physical — evaluate on the logical view ([[renameColumn]] refuses
    // to rename a column an active constraint references)
    val bad = violationCounts(
      toLogical(spark.read.parquet(s"$root/v=$next"),
        columnMapOf(spark, root, base)), cs).filter(_._2 > 0)
    bad.headOption.foreach { case (n, c) =>
      throw new ConstraintViolation(n, c,
        s"commit to $root rejected: CHECK constraint `$n` failed on " +
          s"$c row(s); pointer stays on v=$base")
    }
  }

  private val ColMapDir = "_colmap"

  /** COLUMN MAPPING (Delta `columnMapping.mode = name` / Iceberg field
    * IDs, reduced to the rename case): physical column names are
    * FROZEN at first commit; a rename is pure metadata — a
    * `(physical, logical)` map versioned like the constraint sets
    * (full set per change, nearest-at-or-below resolution). Readers
    * get logical names by aliasing after the scan; writers translate
    * logical → physical before parquet sees the batch, so EVERY file
    * of the table keeps one physical schema across any number of
    * renames and no data is ever rewritten. */
  private[graft] def columnMapOf(spark: SparkSession, root: String,
                                 v: Long): Seq[(String, String)] = {
    val dir = new org.apache.hadoop.fs.Path(root, ColMapDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) return Nil
    val vs = fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+") => n.stripPrefix("v=").toLong }
      .filter(_ <= v)
    if (vs.isEmpty) Nil
    else spark.read.parquet(s"$root/$ColMapDir/v=${vs.max}")
      .select("physical", "logical").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
  }

  private def writeColumnMap(spark: SparkSession, root: String, v: Long,
                             m: Seq[(String, String)]): Unit = {
    import spark.implicits._
    m.toDF("physical", "logical").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$ColMapDir/v=$v")
  }

  /** Present `df` (physical names) under version `v`'s logical names. */
  private def toLogical(df: DataFrame,
                        m: Seq[(String, String)]): DataFrame =
    if (m.isEmpty) df
    else {
      val byPhys = m.toMap
      import org.apache.spark.sql.functions.col
      df.select(df.columns.map(c =>
        col(c).as(byPhys.getOrElse(c, c))): _*)
    }

  /** Translate a batch arriving in LOGICAL names back to the table's
    * frozen physical names before it is written. */
  private def toPhysical(df: DataFrame,
                         m: Seq[(String, String)]): DataFrame =
    if (m.isEmpty) df
    else {
      val byLogical = m.map(_.swap).toMap
      import org.apache.spark.sql.functions.col
      df.select(df.columns.map(c =>
        col(c).as(byLogical.getOrElse(c, c))): _*)
    }

  /** The physical name behind a logical column at version `v` (the
    * name stats manifests and parquet footers know it by). */
  private[graft] def physicalOf(spark: SparkSession, root: String,
                                v: Long, logical: String): String =
    columnMapOf(spark, root, v).find(_._2 == logical)
      .map(_._1).getOrElse(logical)

  /** [[enforceWritten]] under an OWNED claim: a rejected batch must not
    * wedge the table — read-modify-write commits (merge/delete/
    * constraint-add) can only ever claim `pointer+1`, so a burnt claim
    * there would block them until vacuum. We still hold the claim, the
    * written directory never became visible: remove it FIRST (so the
    * claim protocol's already-decided check can never observe a released
    * claim with a live dir), then the claim, then rethrow. */
  private def enforceOrRelease(spark: SparkSession, root: String,
                               next: Long, base: Long): Unit =
    try enforceWritten(spark, root, next, base)
    catch { case v: ConstraintViolation =>
      val fs = fsOf(spark, new org.apache.hadoop.fs.Path(root))
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$next"), true)
      fs.delete(new org.apache.hadoop.fs.Path(root, s"$ClaimsDir/$next"), false)
      throw v
    }

  /** The `(file, bytes)` inventory of version `v` — manifest-listed
    * files or the directory's parquet parts; an O(files) driver-side
    * metadata read, never a data scan. */
  private[graft] def fileInventory(spark: SparkSession, root: String,
                                   v: Long): Seq[(String, Long)] = {
    val fs = fsOf(spark, new org.apache.hadoop.fs.Path(root))
    manifestFiles(spark, root, v) match {
      case Some(files) => files.map { f =>
        (f, fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
      }
      case None =>
        val dir = new org.apache.hadoop.fs.Path(root, s"v=$v")
        fs.listStatus(dir).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => (canonFile(st.getPath), st.getLen))
    }
  }

  /** The data files composing version `v`, when a FILE MANIFEST names
    * them explicitly ([[deleteWhere]] writes one so untouched files are
    * carried by REFERENCE into the new version instead of rewritten);
    * None for a self-contained `v=N` directory. A manifest read is a
    * driver-side metadata scan, O(files) — the same planning read every
    * table format's manifest layer does. */
  private[graft] def manifestFiles(spark: SparkSession, root: String,
                                   v: Long): Option[Seq[String]] = {
    val p = new org.apache.hadoop.fs.Path(root, s"$ManifestDir/v=$v")
    if (!fsOf(spark, p).exists(p)) None
    else Some(spark.read.parquet(p.toString)
      .select("file").collect().map(_.getString(0)).toSeq)
  }

  /** Resolve version `v` to a DataFrame: manifest-listed files when a
    * manifest exists, the version directory otherwise. A version with a
    * RECORDED schema is read with it explicitly — files from before an
    * add-column evolution surface the new columns as NULL, and no
    * footer is read for inference (O(1) planning instead of O(files)
    * mergeSchema). */
  /** Parquet reader pinned to version `v`'s RECORDED physical schema
    * when one exists (inference otherwise). Every file-granular read
    * path must go through this: a raw `spark.read.parquet(files)`
    * infers the FILES' physical columns, which resurrects
    * [[dropColumn]]-removed columns and footer-reads for schema. */
  private def physReader(spark: SparkSession, root: String,
                         v: Long): org.apache.spark.sql.DataFrameReader =
    schemaOf(spark, root, v) match {
      case Some(s) => spark.read.schema(s)
      case None => spark.read
    }

  private def readResolved(spark: SparkSession, root: String,
                           v: Long): DataFrame = {
    val reader = physReader(spark, root, v)
    val physical = manifestFiles(spark, root, v) match {
      case Some(files) if files.nonEmpty => reader.parquet(files: _*)
      case Some(_) => // degenerate: a delete emptied the whole table —
        // the rewrite dir still holds a schema-only anchor file
        reader.parquet(s"$root/v=$v")
      case None => reader.parquet(s"$root/v=$v")
    }
    // merge-on-read tombstones first (they key on the physical scan's
    // _metadata), then column mapping: physical → logical names
    toLogical(applyDv(spark, root, v, physical),
      columnMapOf(spark, root, v))
  }

  /** Read the live snapshot (the only read path — readers never list
    * version directories, so unreferenced snapshots are invisible). */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no committed version"))
    readResolved(spark, root, v)
  }

  /** Time travel: read a specific retained version. Versions survive
    * until [[vacuum]] collects them (`retain` controls how many stay
    * readable); reading a collected version fails fast with the
    * version inventory rather than a bare path error. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val fs = fsOf(spark, new org.apache.hadoop.fs.Path(root))
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, s"v=$v"))) {
      val have = fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.getName).filter(_.matches("v=\\d+")).sorted
      throw new java.util.NoSuchElementException(
        s"snapshot $root has no version $v (vacuumed?); " +
          s"retained: ${have.mkString(", ")}")
    }
    readResolved(spark, root, v)
  }

  /** `numFiles` sentinel for [[compact]]: derive the rewrite width
    * from the bytes the current version actually references. */
  val DerivedWidth: Int = 0

  /** Target bytes per compacted file (parquet-encoded). One writer
    * per ~this many referenced bytes keeps rewrite parallelism
    * tracking data volume while still producing scan-efficient files —
    * the table's target-file-size policy as code. */
  private val TargetCompactBytes = 128L * 1024 * 1024

  /** The clamp itself, separated for spec pinning: referenced bytes
    * over [[TargetCompactBytes]], ceiling, clamped to [1, cap]. */
  private[graft] def compactWidthFor(bytes: Long, cap: Int): Int =
    math.min(cap.toLong, math.max(1L,
      (bytes + TargetCompactBytes - 1) / TargetCompactBytes)).toInt

  /** Rewrite width for version `v`: referenced bytes (manifest-aware
    * [[fileInventory]] — an O(files) metadata read, no data scan) over
    * [[TargetCompactBytes]], clamped to [1, shuffle.partitions]. */
  private def derivedCompactFiles(spark: SparkSession, root: String,
                                  v: Long): Int =
    compactWidthFor(fileInventory(spark, root, v).map(_._2).sum,
      spark.sessionState.conf.numShufflePartitions)

  /** Compaction: rewrite the CURRENT version's files into `numFiles`
    * and commit the result as a new version — the small-file
    * maintenance pass every incrementally-ingested table needs (a CDC
    * stream of small merge batches leaves one file per shuffle
    * partition per commit; scan cost grows with file count, not data).
    * Runs under the same claim protocol as any commit, so it is safe
    * against concurrent writers — if a merge lands first, the claim is
    * lost and the compaction retries on the new head. Readers are
    * never disturbed: content is byte-identical by construction
    * (repartition only moves rows between files), and the old version
    * remains until vacuumed.
    *
    * `numFiles` defaults to [[DerivedWidth]]: one writer per
    * ~128 MB of referenced bytes, clamped to [1, shuffle.partitions].
    * A FIXED width is the of21-class scale defect in maintenance
    * form — 10× the rows through the same k writer tasks; deriving it
    * per-attempt (the referenced set changes if a concurrent commit
    * wins the claim race) keeps rewrite parallelism tracking volume. */
  def compact(spark: SparkSession, root: String,
              numFiles: Int = DerivedWidth,
              maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to compact"))
      if (claimVersion(spark, root, base + 1)) {
        // readResolved: compacting a manifest (delete) version
        // re-materializes it self-contained, collapsing the reference
        // chain so vacuum can reclaim the referenced ancestors
        val resolved = toPhysical(readResolved(spark, root, base),
          columnMapOf(spark, root, base))
        val nF = if (numFiles > 0) numFiles
                 else derivedCompactFiles(spark, root, base)
        resolved.repartition(nF)
          .write.mode("overwrite").parquet(s"$root/v=${base + 1}")
        // a stats-carrying table keeps its data-skipping index across
        // maintenance passes: re-derive the manifest for the new files
        val sc = statsColsOf(spark, root, base)
        if (sc.nonEmpty) writeStats(spark, root, base + 1, sc,
          bloomColsOf(spark, root, base))
        writeSchema(spark, root, base + 1, resolved.schema)
        if (pointerAdvance(spark, root, base + 1)) return base + 1
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"compact of $root did not win a claim in $maxRetries attempts")
  }

  private val ClaimsDir = "_claims"

  /** Highest version any artifact names: pointer, `v=*` data dirs
    * (orphans included), and claims (in-flight or dead writers). The
    * next blind commit goes strictly above ALL of them, so no name is
    * ever reused for different content. Strict `\d+` matches: a stray
    * non-numeric entry (editor artifact, leftover `v=tmp`) must not
    * NumberFormatException every future commit. */
  private def observedMax(spark: SparkSession, root: String): Long = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, rootPath)
    fs.mkdirs(rootPath)
    val dirMax = fs.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+") => n.drop(2).toLong }
      .maxOption.getOrElse(0L)
    val claims = new org.apache.hadoop.fs.Path(root, ClaimsDir)
    val claimMax =
      if (!fs.exists(claims)) 0L
      else fs.listStatus(claims).toSeq.map(_.getPath.getName)
        .collect { case n if n.matches("\\d+") => n.toLong }
        .maxOption.getOrElse(0L)
    math.max(math.max(currentVersion(spark, root).getOrElse(0L), dirMax),
      claimMax)
  }

  /** The atomic create-exclusive election primitive: exactly one racing
    * creator of `p` succeeds — [[graft.util.Lease.createExclusive]]
    * (the shared lease discipline; semantics documented there). */
  private def createExclusive(spark: SparkSession,
                              p: org.apache.hadoop.fs.Path,
                              body: String): Boolean =
    graft.util.Lease.createExclusive(
      spark.sparkContext.hadoopConfiguration, p, body)

  /** Claim exclusive right to commit version `v` via create-exclusive
    * on `_claims/v`. Winning the file race is necessary but not
    * sufficient: if `v` was ALREADY decided — its data directory exists,
    * or the pointer has reached it — the claim is released and refused,
    * so a delayed writer whose claim file was vacuumed away can never
    * reclaim a committed version number and overwrite live data. */
  /** Lost-claim wait: poll (20 ms) until the winner's pointer swap
    * passes `base`, or 5 s. Returns true when the head ADVANCED — the
    * loss was to a LIVE competitor and the table made global progress,
    * so callers do not charge it against their retry budget (the
    * two-JVM mergedelete race soak found the starvation this fixes: a
    * hot sequential merge train re-claims within microseconds of each
    * publish, and a neighbor polling at 20 ms lost 16 straight claims
    * — exhausting a budget meant for STALLED claims). False — nothing
    * moved in 5 s, a stale/dead claimant — is the budget-worthy case.
    * An op may therefore wait out an arbitrarily long competitor
    * train (each free retry is matched by ≥1 competitor commit, so
    * the table is at maximal throughput), but can never spin without
    * either global progress or budget burn: standard
    * optimistic-concurrency liveness. */
  private def awaitAdvance(spark: SparkSession, root: String,
                           base: Long): Boolean =
    graft.util.Lease.awaitProgress(5000L, base)(
      currentVersion(spark, root).getOrElse(0L))

  private[graft] def claimVersion(spark: SparkSession, root: String,
                                  v: Long): Boolean = {
    val claims = new org.apache.hadoop.fs.Path(root, ClaimsDir)
    val fs = fsOf(spark, claims)
    fs.mkdirs(claims)
    val claim = new org.apache.hadoop.fs.Path(claims, v.toString)
    if (!createExclusive(spark, claim, s"$v\n")) return false
    val decided =
      fs.exists(new org.apache.hadoop.fs.Path(root, s"v=$v")) ||
        currentVersion(spark, root).getOrElse(0L) >= v
    if (decided) { fs.delete(claim, false); return false }
    true
  }

  /** Monotonic pointer swap: advance `_CURRENT` to `v` unless it already
    * names something ≥ v (a concurrent committer of a HIGHER version may
    * have swapped first; regressing the pointer would un-commit it).
    * Returns whether the pointer now names `v`.
    *
    * The read-compare-rename must be a critical section: two committers
    * of DIFFERENT versions interleaving (both read cur, higher renames
    * first, lower renames second) would regress the pointer and
    * un-commit a commit that already returned success. A create-
    * exclusive `_ptrlock` serializes the swap; a holder that dies is
    * recovered by breaking locks older than [[PtrLockTimeoutMs]] (the
    * swap is two metadata ops — any live holder is long gone by then).
    */
  private val PtrLockTimeoutMs = 60000L

  /** `expectedPrev >= 0` makes the swap a strict CAS: advance only if
    * the pointer names exactly `expectedPrev` (0 = no pointer) at swap
    * time. Commits that claimed MORE than one version ahead of the
    * pointer need this — between their base observation and their swap
    * another claimant below them can publish, and an unconditional
    * "advance if higher" would then overwrite that commit's place in
    * the carry chain with a manifest that never carried it (the
    * two-process bootstrap race the r9 soak caught: append's bootstrap
    * claimed v2 over a concurrent v1 and published a full-replace —
    * v1's batch vanished with every invariant green). */
  private def pointerAdvance(spark: SparkSession, root: String,
                             v: Long, expectedPrev: Long = -1L): Boolean = {
    val lock = new org.apache.hadoop.fs.Path(root, "_ptrlock")
    val fs = fsOf(spark, lock)
    // Lease semantics ([[graft.util.Lease.acquire]]): a holder past the
    // timeout has forfeited the lock (the critical section is two
    // metadata ops; 60 s means a dead JVM). The break is
    // IDENTITY-CHECKED against the observed modification time — an
    // unconditional delete could race the forfeiting holder's own
    // release and kill a FRESH committer's lock acquired in the gap
    // (two swaps then interleave).
    graft.util.Lease.acquire(spark.sparkContext.hadoopConfiguration,
      lock, s"$v\n", PtrLockTimeoutMs)
    try {
      val cur = currentVersion(spark, root).getOrElse(0L)
      if (cur >= v) false
      else if (expectedPrev >= 0L && cur != expectedPrev) false
      else {
        setPointer(spark, root, v)
        // still under _ptrlock, so markers are strictly serialized and
        // the prev-marker read below sees the latest one
        writeHistoryMarker(spark, root, cur, v)
        true
      }
    } finally fs.delete(lock, false)
  }

  private val HistoryDir = "_history"

  /** One tiny marker per pointer swap: `_history/v=N` holding the
    * commit's wall-clock millis — the timestamp axis for
    * [[readAsOf]]. Written inside the `_ptrlock` critical section, so
    * markers are serialized; monotonicity is enforced against the
    * PREDECESSOR version's marker only (`max(now, prev+1)`) — an O(1)
    * read per commit, never an O(commits) directory scan on the commit
    * path. A crash between pointer swap and marker write loses that
    * one version's timestamp: [[versionAsOf]] then resolves
    * timestamps in the gap to the last MARKED predecessor — time
    * travel degrades by one version, reads never break. Marker write
    * failure itself is swallowed for the same reason: the commit has
    * already happened (the pointer IS the truth); history is an index
    * over it, not a participant. */
  private def writeHistoryMarker(spark: SparkSession, root: String,
                                 prev: Long, v: Long): Unit =
    try {
      val dir = new org.apache.hadoop.fs.Path(root, HistoryDir)
      val fs = fsOf(spark, dir)
      val prevTs =
        if (prev <= 0) 0L
        else readHistoryMarker(spark, root, prev).getOrElse(0L)
      val ts = math.max(System.currentTimeMillis(), prevTs + 1)
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, s"v=$v"), true)
      try out.write(s"$ts\n".getBytes("UTF-8")) finally out.close()
    } catch { case _: java.io.IOException => () }

  private def readHistoryMarker(spark: SparkSession, root: String,
                                v: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(root, s"$HistoryDir/v=$v")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        Option(buf.readLine()).map(_.trim.toLong)
      } finally in.close()
    }
  }

  /** The table's commit timeline: (version, commitTimeMillis) sorted by
    * version — Delta's DESCRIBE HISTORY shape. O(commits) metadata
    * listing; only [[versionAsOf]] and forensics read it, never the
    * commit path. */
  def commitHistory(spark: SparkSession, root: String): Seq[(Long, Long)] = {
    val dir = new org.apache.hadoop.fs.Path(root, HistoryDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+") => n.drop(2).toLong }
      .sorted
      .flatMap(v => readHistoryMarker(spark, root, v).map(v -> _))
  }

  /** The version the table was at, at wall-clock `tsMillis` — Delta's
    * `TIMESTAMP AS OF`. Marker timestamps are strictly increasing in
    * version (enforced at write), so this is the last marked version
    * at or before the instant. Fails fast when the instant precedes
    * the first commit, or the table predates history markers. */
  def versionAsOf(spark: SparkSession, root: String, tsMillis: Long): Long = {
    val h = commitHistory(spark, root)
    if (h.isEmpty) throw new java.util.NoSuchElementException(
      s"snapshot table $root has no commit history " +
        "(empty, or committed before history markers existed)")
    val eligible = h.filter(_._2 <= tsMillis)
    if (eligible.isEmpty) throw new java.util.NoSuchElementException(
      s"timestamp $tsMillis precedes the first commit of $root " +
        s"(first: v=${h.head._1} at ${h.head._2})")
    eligible.last._1
  }

  /** Timestamp time travel: [[readVersion]] at [[versionAsOf]] the
    * instant. Reading an instant whose version was [[vacuum]]ed fails
    * fast with the retained inventory (history markers outlive their
    * data on purpose — they are the audit log of WHEN the table
    * changed, not a liveness promise). */
  def readAsOf(spark: SparkSession, root: String,
               tsMillis: Long): DataFrame =
    readVersion(spark, root, versionAsOf(spark, root, tsMillis))

  // Forfeited-`_ptrlock` recovery lives in
  // [[graft.util.Lease.breakIfStillStale]] (steal-to-tombstone,
  // identity re-check by mtime, hand-back of a fresh holder's lock);
  // the monotonic compare inside the critical section bounds any
  // residual three-party window to an adjacent-version regression,
  // never a torn pointer.

  /** Commit `df` as the next snapshot: claim a fresh version, write
    * `v=N` fully, then swap the pointer atomically. Returns the
    * committed version. Racing blind commits serialize through the
    * claim: each gets its own version directory and the pointer ends on
    * the highest (monotonic advance) — nobody overwrites anybody. */
  def commit(df: DataFrame, root: String): Long =
    commitInternal(df, root, Nil)

  /** [[commit]] plus a per-file min/max/count stats manifest over
    * `statsCols` — the data-skipping index every table format keeps
    * (Delta's per-file stats, Iceberg's manifest column bounds). The
    * manifest is written BEFORE the pointer swap, so any version the
    * pointer names has its stats in place, and it is derived by
    * re-scanning only the files just written (grouped on
    * `input_file_name`, one map-side-combined aggregate — at 100 TB
    * this reads back one commit's files, not the table). Pair with a
    * range layout on the stats column (`repartitionByRange` +
    * `sortWithinPartitions`) so file bounds are disjoint and
    * [[readCurrentPruned]] skips all but the overlapping files. */
  def commitWithStats(df: DataFrame, root: String,
                      statsCols: Seq[String],
                      bloomCols: Seq[String] = Nil): Long = {
    require(statsCols.nonEmpty, "commitWithStats needs at least one column")
    commitInternal(df, root, statsCols, bloomCols)
  }

  /** Z-order clustered commit — the Delta `OPTIMIZE ... ZORDER BY`
    * shape as a first-class write: lay the files on the Morton curve
    * of two filter dimensions ([[Layout.zorderCluster]]) and record
    * min/max stats for BOTH, so every file's stats describe a compact
    * box in (c1, c2) space and [[readCurrentPrunedBox]] skips any file
    * whose box misses the query box. A single-column range layout
    * serves one dimension and scatters the other (its min/max spans
    * everything); the curve serves both from one write-time range
    * shuffle. */
  def commitClustered(df: DataFrame, root: String, c1: String, c2: String,
                      nFiles: Int, bloomCols: Seq[String] = Nil,
                      bits: Int = 0): Long =
    commitInternal(Layout.zorderCluster(df, c1, c2, nFiles, bits), root,
      Seq(c1, c2), bloomCols)

  private def commitInternal(df: DataFrame, root: String,
                             statsCols: Seq[String],
                             bloomCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    var attempts = 0
    while (true) {
      val next = observedMax(spark, root) + 1
      if (claimVersion(spark, root, next)) {
        // column mapping: the batch arrives in LOGICAL names — freeze
        // it back to the table's physical names before parquet sees it
        // (and the stats columns with it); a fresh table has no map
        val cmap = currentVersion(spark, root)
          .map(columnMapOf(spark, root, _)).getOrElse(Nil)
        val physDf = toPhysical(df, cmap)
        val physStats = statsCols.map(c =>
          cmap.find(_._2 == c).map(_._1).getOrElse(c))
        val physBlooms = bloomCols.map(c =>
          cmap.find(_._2 == c).map(_._1).getOrElse(c))
        physDf.write.mode("overwrite").parquet(s"$root/v=$next")
        // CHECK constraints resolve against the live pointer (a blind
        // commit replaces whatever is current, so current's rules bind)
        currentVersion(spark, root)
          .foreach(cur => enforceOrRelease(spark, root, next, cur))
        if (physStats.nonEmpty)
          writeStats(spark, root, next, physStats, physBlooms)
        writeSchema(spark, root, next, physDf.schema)
        pointerAdvance(spark, root, next)
        return next
      }
      attempts += 1
      if (attempts > 64) throw new IllegalStateException(
        s"snapshot commit to $root lost the version claim 64 times")
    }
    -1L // unreachable
  }

  private val StatsDir = "_stats"

  /** The stats columns version `v`'s manifest covers (recovered from
    * its schema's `min_*` fields), or Nil for a stats-less version. */
  private def statsColsOf(spark: SparkSession, root: String,
                          v: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root, s"$StatsDir/v=$v")
    if (!fsOf(spark, p).exists(p)) Nil
    else spark.read.parquet(p.toString).schema.fieldNames.toSeq
      .collect { case n if n.startsWith("min_") => n.stripPrefix("min_") }
  }

  /** The columns version `v`'s manifest carries per-file BLOOM indexes
    * for (`bloom_*` binary fields), or Nil. */
  private def bloomColsOf(spark: SparkSession, root: String,
                          v: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root, s"$StatsDir/v=$v")
    if (!fsOf(spark, p).exists(p)) Nil
    else spark.read.parquet(p.toString).schema.fieldNames.toSeq
      .collect { case n if n.startsWith("bloom_") => n.stripPrefix("bloom_") }
  }

  private val DvDir = "_dv"

  /** The sidecar size up to which [[applyDv]] broadcasts the tombstone
    * relation; above it the anti-join falls back to a shuffle — the
    * operational signal that [[purgeDv]] is due (README's COW-vs-MOR
    * rule, enforced by [[maybePurgeOversizedDv]]). */
  private[graft] val DvBroadcastBytes = 64L * 1024 * 1024

  /** Target tombstone rows per sidecar parquet file: ~4M `(file,
    * row_index)` pairs (dictionary-encoded file column) keep each file
    * in the tens of MB, so a 10^9-row tombstone wave writes wide
    * instead of serializing through one task, while a toy delete still
    * writes exactly one file. */
  private val DvRowsPerSidecarFile = 4L * 1000 * 1000

  /** Version `v`'s DELETION VECTOR — the merge-on-read tombstone
    * relation `(file, row_index)` written by [[deleteWhereMor]] — or
    * None when the version carries no tombstones (every table before
    * its first MOR delete, and every version whose files were fully
    * rewritten since). `file` is the scan's `_metadata.file_path` URI,
    * the same form the stats/file manifests use, and `row_index` is
    * parquet's stable in-file row ordinal (`_metadata.row_index`) —
    * valid for exactly as long as the file is immutable, which
    * snapshot version files are by construction. */
  /** `_metadata.file_path` surfaces the local FS as `file:/x` while
    * every manifest in this layer carries [[canonFile]]'s `file:///x`
    * — normalize scan-side paths to the manifest form so sidecar
    * entries, manifest rows, and stats rows all name a file the same
    * way (other schemes — hdfs://, s3a:// — are already consistent and
    * pass through untouched). */
  private def canonMetaPath(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val slashed = regexp_replace(c, "^file:/(?!/)", "file:///")
    // Scan-derived paths are URI-ENCODED (`a b` → `a%20b`; a literal
    // `%` → `%25`), but the canonical form is the DECODED one: only it
    // is accepted back by `spark.read.parquet` (Hadoop `Path(String)`
    // treats `%20` as three literal chars), and it is what
    // `Path.toString`-derived manifest rows already hold — measured in
    // SnapshotSpec's spaced-root pin, where the undecoded form dropped
    // every carried tombstone. `url_decode` is form-decoding (`+` →
    // space), so literal `+` — legal raw in a URI path — is protected
    // by pre-escaping it; every other `%` in scan output begins a valid
    // escape, making the decode total. try_ + fallback keeps a
    // malformed string inert rather than failing the whole plan.
    val plusSafe = regexp_replace(slashed, "\\+", "%2B")
    coalesce(try_url_decode(plusSafe), slashed)
  }

  private def dvOf(spark: SparkSession, root: String,
                   v: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(root, s"$DvDir/v=$v")
    if (!fsOf(spark, p).exists(p)) None
    else Some(spark.read.parquet(p.toString))
  }

  /** Filter version `v`'s tombstoned rows out of a PHYSICAL parquet
    * scan — the merge-on-read half of every read path. MUST be applied
    * directly on (a projection of) the file scan: it reads the scan's
    * constant `_metadata` columns, which do not survive a join. A
    * version without tombstones returns the scan untouched — zero cost
    * for every non-MOR table. The tombstone relation is metadata-sized
    * by contract ([[purgeDv]]/[[compact]] re-materialize and clear it;
    * those maintenance passes ARE the DV-growth bound), so the
    * anti-join broadcasts below a 64 MB sidecar bound and falls back
    * to a shuffled anti-join above it rather than OOMing the driver.
    *
    * The join keys on `(xxhash64(file), row_index)` — long pairs —
    * instead of the raw path string: the corpus side evaluates the
    * probe per ROW, and hashing a ~90-char URI beats string-equality
    * probing by ~4× at 150M rows (measured, the sf100 read-tax line in
    * BENCH_NOTES). Exactness is not delegated to the hash: the
    * version's file INVENTORY is metadata-sized, so hash uniqueness
    * across it is CHECKED on the driver per apply, and a collision
    * (never, at ~10⁻¹² for 10k files) falls back to the string-keyed
    * join rather than trusting 64 bits. */
  private def applyDv(spark: SparkSession, root: String, v: Long,
                      phys: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val p = new org.apache.hadoop.fs.Path(root, s"$DvDir/v=$v")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return phys
    val dv = spark.read.parquet(p.toString)
    def sized(df: DataFrame): DataFrame =
      if (fs.getContentSummary(p).getLength <= 64L * 1024 * 1024)
        broadcast(df)
      else df
    // the driver replays the SQL function's exact hash (same code
    // path, same seed) over the O(files) inventory — uniqueness there
    // makes the long-keyed join provably equal to the string-keyed
    // one. Versions are immutable, so the verdict is memoized per
    // (root, version): without the memo every read-plan construction
    // of a DV'd version re-collected the manifest and re-hashed the
    // full inventory on the driver (twice per deleteWhereMor, which
    // calls applyDv inside its own read). The key also folds in a
    // cheap inventory fingerprint: a scratch root deleted and
    // recreated at the same path within one session (test fixtures,
    // re-run soaks) must not be served the dead root's verdict for a
    // different inventory. Directory mtime alone is second-granular
    // on some filesystems — a same-second delete+recreate would still
    // hit the stale memo (ADVICE r13) — so fold in the direct-child
    // count and total length from one listStatus (O(children) driver
    // metadata, same order as the fs.exists probe above).
    val fpDir = {
      val m = new org.apache.hadoop.fs.Path(root, s"$ManifestDir/v=$v")
      if (fs.exists(m)) m else new org.apache.hadoop.fs.Path(root, s"v=$v")
    }
    val fp = try {
      val fpFs = fsOf(spark, fpDir)
      val mtime = fpFs.getFileStatus(fpDir).getModificationTime
      val kids = fpFs.listStatus(fpDir)
      s"$mtime:${kids.length}:${kids.map(_.getLen).sum}"
    } catch { case _: Exception => "0" }
    val exactSafe = graft.util.SessionMemo.memoizedValue(spark,
        s"graft.dv.exactSafe:$root:v=$v:fp=$fp") {
      val inventory = manifestFiles(spark, root, v).getOrElse {
        val dir = new org.apache.hadoop.fs.Path(root, s"v=$v")
        fsOf(spark, dir).listStatus(dir).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => canonFile(st.getPath))
      }
      def xx(f: String): Long =
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(f),
          org.apache.spark.sql.types.StringType, 42L)
      inventory.iterator.map(xx).toSet.size == inventory.size
    }
    if (exactSafe) {
      val right = sized(dv.select(xxhash64(col("file")).as("__dv_fh"),
        col("row_index").as("__dv_ri")))
      phys
        .withColumn("__dv_file",
          xxhash64(canonMetaPath(col("_metadata.file_path"))))
        .withColumn("__dv_idx", col("_metadata.row_index"))
        .join(right, col("__dv_file") === col("__dv_fh") &&
          col("__dv_idx") === col("__dv_ri"), "left_anti")
        .drop("__dv_file", "__dv_idx")
    } else {
      val right = sized(dv)
      phys
        .withColumn("__dv_file", canonMetaPath(col("_metadata.file_path")))
        .withColumn("__dv_idx", col("_metadata.row_index"))
        .join(right, col("__dv_file") === right("file") &&
          col("__dv_idx") === right("row_index"), "left_anti")
        .drop("__dv_file", "__dv_idx")
    }
  }

  /** Per-file bloom sketch size target: estimated distinct values per
    * FILE (Spark sizes numBits from it at the default 3 % fpp, ~90 KB
    * per file at 100k — SIZE IT TO ROWS-PER-FILE: the manifest grows
    * by sketch-size × files, and [[readCurrentPoint]] deserializes
    * every sketch (executor-side, inside the manifest scan), so an
    * oversized est wastes manifest bytes and lookup latency while an
    * undersized one only raises the false-positive rate — never loses
    * files. Overridable per session via `graft.snapshot.bloomEstItems`
    * on the Spark conf. */
  private def bloomEstItems(spark: SparkSession): Long =
    spark.conf.getOption("graft.snapshot.bloomEstItems")
      .map(_.toLong).getOrElse(100000L)

  private def writeStats(spark: SparkSession, root: String, v: Long,
                         statsCols: Seq[String],
                         bloomCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions._
    // FOOTER FAST PATH (r14, guide §6/§1.2): the per-file min/max/count
    // manifest is exactly what parquet footers already record, so for
    // integer stats columns the manifest derives from METADATA — no
    // second pass over the just-committed data bytes (at 100 TB the
    // read-back is a full extra scan of every commit). Values are
    // exact (parquet int statistics are never truncated), null
    // semantics match the aggregate path (all-null file → null bounds;
    // zero-row file → no manifest row, like an empty groupBy), and any
    // unsupported type / missing statistic / bloom requirement falls
    // back to the measured scan. `graft.stats.footerFastPath=false`
    // restores the old path for A/B.
    val enabled = spark.conf.getOption("graft.stats.footerFastPath")
      .forall(_.toBoolean)
    val fast =
      if (bloomCols.nonEmpty || !enabled) None
      else footerStats(spark, s"$root/v=$v", statsCols)
    fast match {
      case Some(df) =>
        df.coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$StatsDir/v=$v")
      case None =>
        spark.read.parquet(s"$root/v=$v")
          .groupBy(canonMetaPath(input_file_name()).as("file"))
          .agg(statsAggs(spark, statsCols, bloomCols).head,
            statsAggs(spark, statsCols, bloomCols).tail: _*)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$StatsDir/v=$v")
    }
  }

  /** Per-file `(file, min_c, max_c, …, n_rows)` rows assembled from
    * parquet FOOTERS (column-chunk statistics aggregated across row
    * groups), or None when any stats column is not a plain INT32/INT64
    * (float NaN rules and binary truncation make those footers
    * unreliable; int statistics are exact) or any populated row group
    * lacks a statistic. Driver-side O(files) metadata reads — the same
    * footers the scan-path planner opens anyway. */
  private def footerStats(spark: SparkSession, dir: String,
                          statsCols: Seq[String]): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val files =
      try p.getFileSystem(conf).listStatus(p).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      catch { case _: java.io.FileNotFoundException => return None }
    footerStatsOf(spark, files, statsCols)
  }

  /** [[footerStats]] over an explicit file list (the file-granular
    * commit's FRESH files — paths as [[canonFile]] strings). */
  private def footerStatsPaths(spark: SparkSession, paths: Seq[String],
                               statsCols: Seq[String]): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files =
      try paths.map { s =>
        val p = new org.apache.hadoop.fs.Path(s)
        p.getFileSystem(conf).getFileStatus(p)
      }
      catch { case _: java.io.FileNotFoundException => return None }
    footerStatsOf(spark, files, statsCols)
  }

  private def footerStatsOf(spark: SparkSession,
                            files: Seq[org.apache.hadoop.fs.FileStatus],
                            statsCols: Seq[String]): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    if (files.isEmpty) return None
    // (sparkType, per-file Row values) per column; abort → None
    val perFile = files.flatMap { st =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try {
        val schema = reader.getFileMetaData.getSchema
        val blocks = reader.getRowGroups.asScala.toSeq
        val nRows = blocks.map(_.getRowCount).sum
        if (nRows == 0L) None // scan path emits no group for 0 rows
        else {
          val cols = statsCols.map { c =>
            if (!schema.containsField(c)) return None
            val t = schema.getType(Seq(c): _*)
            if (!t.isPrimitive) return None
            val prim = t.asPrimitiveType()
            val tn = prim.getPrimitiveTypeName
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
            val sparkType: DataType = tn match {
              case INT64 => LongType
              case INT32 => IntegerType
              case _ => return None
            }
            // logical annotations (decimal/date/timestamp/int8/16)
            // change the Spark-side value — plain ints only
            val ann = prim.getLogicalTypeAnnotation
            val plain = ann == null || (ann match {
              case i: org.apache.parquet.schema.LogicalTypeAnnotation
                    .IntLogicalTypeAnnotation =>
                i.isSigned && (i.getBitWidth == 32 || i.getBitWidth == 64)
              case _ => false
            })
            if (!plain) return None
            var lo: Long = Long.MaxValue
            var hi: Long = Long.MinValue
            var seen = false
            blocks.foreach { b =>
              if (b.getRowCount > 0) {
                val chunk = b.getColumns.asScala
                  .find(_.getPath.toDotString == c).getOrElse(return None)
                val s = chunk.getStatistics
                if (s == null || s.isEmpty) return None
                if (s.hasNonNullValue) {
                  val (mn, mx) = s.genericGetMin match {
                    case l: java.lang.Long =>
                      (l.longValue,
                        s.genericGetMax.asInstanceOf[java.lang.Long].longValue)
                    case i: java.lang.Integer =>
                      (i.intValue.toLong, s.genericGetMax
                        .asInstanceOf[java.lang.Integer].intValue.toLong)
                    case _ => return None
                  }
                  if (mn < lo) lo = mn
                  if (mx > hi) hi = mx
                  seen = true
                } else if (s.getNumNulls < b.getRowCount) return None
              }
            }
            def box(v: Long): Any =
              if (sparkType == LongType) Long.box(v) else Int.box(v.toInt)
            val (mnV, mxV) =
              if (seen) (box(lo), box(hi)) else (null, null)
            (sparkType, mnV, mxV)
          }
          Some((canonFile(st.getPath), cols, nRows))
        }
      } finally reader.close()
    }
    // every file empty: let the scan path produce the (empty) manifest
    // with the exact column types — a guessed type here would silently
    // widen on the carry path's unionByName
    if (perFile.isEmpty) return None
    val colTypes = perFile.head._2.map(_._1)
    val fields = StructField("file", StringType, nullable = true) +:
      statsCols.zip(colTypes).flatMap { case (c, t) =>
        Seq(StructField(s"min_$c", t, nullable = true),
          StructField(s"max_$c", t, nullable = true)) } :+
      StructField("n_rows", LongType, nullable = false)
    val rows = perFile.map { case (f, cols, n) =>
      org.apache.spark.sql.Row.fromSeq(
        f +: cols.flatMap { case (_, mn, mx) => Seq(mn, mx) } :+ Long.box(n))
    }
    Some(spark.createDataFrame(rows.asJava, StructType(fields)))
  }

  /** The per-file aggregate list every stats write shares: min/max per
    * stats column, a bloom sketch per bloom column ([[readCurrentPoint]]
    * consults it for point-lookup file skipping on columns a range
    * layout can't serve), and the row count. */
  private def statsAggs(spark: SparkSession, statsCols: Seq[String],
                        bloomCols: Seq[String])
      : Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    if (bloomCols.nonEmpty) graft.plans.BloomReduce.register(spark)
    statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      bloomCols.map(c =>
        expr(s"${graft.plans.BloomReduce.aggName}(CAST($c AS BIGINT), " +
          s"CAST(${bloomEstItems(spark)} AS BIGINT))").as(s"bloom_$c")) :+
      count(lit(1)).as("n_rows")
  }

  /** The file paths of version `v` whose `[min,max]` interval on
    * `statsCol` overlaps `[lo, hi]` — a driver-side scan of the stats
    * MANIFEST (O(files) metadata rows, the same listing every table
    * format's planner does), never of the data. */
  private[graft] def prunedFiles(spark: SparkSession, root: String, v: Long,
                                 statsCol: String,
                                 lo: org.apache.spark.sql.Column,
                                 hi: org.apache.spark.sql.Column): Seq[String] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$root/$StatsDir/v=$v")
      .filter(col(s"max_$statsCol") >= lo && col(s"min_$statsCol") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range read with manifest-level data skipping: consult the current
    * version's per-file stats and scan ONLY the files whose bounds
    * overlap `[lo, hi]`, with the residual `BETWEEN` filter still
    * applied (file granularity is coarse) and pushed into the parquet
    * scan. On a range-laid-out table this turns a full-table scan into
    * an O(selectivity) one BEFORE any file is opened — at 100 TB,
    * skipping a file this way saves even the footer round-trip that
    * row-group pruning would still pay. Falls back to a plain filtered
    * scan when the version predates stats collection. */
  def readCurrentPruned(spark: SparkSession, root: String, statsCol: String,
                        lo: org.apache.spark.sql.Column,
                        hi: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no committed version"))
    val cmap = columnMapOf(spark, root, v)
    val physCol = cmap.find(_._2 == statsCol).map(_._1).getOrElse(statsCol)
    val statsPath = new org.apache.hadoop.fs.Path(root, s"$StatsDir/v=$v")
    if (!fsOf(spark, statsPath).exists(statsPath))
      // resolve through the FILE manifest, not the bare v=N directory: a
      // stats-less version is reachable with a manifest (plain commit,
      // then appendCommit/compactSmall/restore — writeManifestAndStats
      // skips stats when the base has none), and the directory alone
      // would silently drop every manifest-referenced row (for a
      // restored version, the directory is an EMPTY schema anchor).
      // readResolved output is LOGICAL, so filter on the logical name
      readResolved(spark, root, v)
        .filter(col(statsCol) >= lo && col(statsCol) <= hi)
    else {
      // physical files: prune and filter on the frozen physical name,
      // then present logical names
      val between = col(physCol) >= lo && col(physCol) <= hi
      val files = prunedFiles(spark, root, v, physCol, lo, hi)
      if (files.isEmpty) // no overlap: empty result, correct schema, no scan
        toLogical(physReader(spark, root, v).parquet(s"$root/v=$v")
          .filter(between).filter(lit(false)), cmap)
      else toLogical(applyDv(spark, root, v,
        physReader(spark, root, v).parquet(files: _*))
        .filter(between), cmap)
    }
  }

  /** Two-dimensional box read over a [[commitClustered]] table: the
    * surviving file set is the INTERSECTION of each dimension's
    * stats-pruned set, so a file is opened only when its (c1, c2)
    * stats box overlaps the query box — the read-side half of Z-order
    * clustering (on a single-column layout the scattered dimension's
    * prune returns every file and the intersection degrades to the
    * 1-D prune, never worse). The residual predicate still applies
    * and pushes into the parquet scan. */
  def readCurrentPrunedBox(spark: SparkSession, root: String,
                           c1: String, lo1: org.apache.spark.sql.Column,
                           hi1: org.apache.spark.sql.Column,
                           c2: String, lo2: org.apache.spark.sql.Column,
                           hi2: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no committed version"))
    val cmap = columnMapOf(spark, root, v)
    val p1 = cmap.find(_._2 == c1).map(_._1).getOrElse(c1)
    val p2 = cmap.find(_._2 == c2).map(_._1).getOrElse(c2)
    val statsPath = new org.apache.hadoop.fs.Path(root, s"$StatsDir/v=$v")
    if (!fsOf(spark, statsPath).exists(statsPath))
      readResolved(spark, root, v).filter(
        col(c1) >= lo1 && col(c1) <= hi1 &&
          col(c2) >= lo2 && col(c2) <= hi2)
    else {
      val box = col(p1) >= lo1 && col(p1) <= hi1 &&
        col(p2) >= lo2 && col(p2) <= hi2
      val files =
        prunedFiles(spark, root, v, p1, lo1, hi1).toSet
          .intersect(prunedFiles(spark, root, v, p2, lo2, hi2).toSet)
      if (files.isEmpty)
        toLogical(physReader(spark, root, v).parquet(s"$root/v=$v")
          .filter(box).filter(lit(false)), cmap)
      else toLogical(applyDv(spark, root, v, physReader(spark, root, v)
        .parquet(files.toSeq.sorted: _*)).filter(box), cmap)
    }
  }

  /** The files of version `v` whose per-file BLOOM index might contain
    * `value` in `bloomCol` — the probe runs EXECUTOR-side (a filter over
    * the manifest scan), so only the matching file NAMES ever reach the
    * driver. The distinction is the difference between O(matches) and
    * O(files × sketch-bytes) driver traffic: at the soak's own sizing
    * (~18 KB/sketch) a million-file table would otherwise ship ~18 GB
    * through the driver per lookup. The deserialization cost is the
    * same either way and O(files) manifest rows distribute across the
    * scan; a UDF is fine here because this is metadata scale, never the
    * data path. Blooms never lose a file (no false negatives); false
    * positives only add reads. */
  private[graft] def filesForPoint(spark: SparkSession, root: String,
                                   v: Long, bloomCol: String,
                                   value: Long): Seq[String] = {
    import org.apache.spark.sql.functions.{col, udf}
    val mightContain = udf { bytes: Array[Byte] =>
      bytes != null && org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
        .mightContainLong(value)
    }
    spark.read.parquet(s"$root/$StatsDir/v=$v")
      .filter(mightContain(col(s"bloom_$bloomCol")))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Point lookup with BLOOM-index file skipping: scan ONLY the files
    * whose per-file bloom sketch might contain `value` — the skipping
    * tool for the column a range layout CANNOT serve (min/max bounds
    * on an unordered column span everything; a bloom prunes by
    * membership instead, the Delta bloom-index / Parquet bloom-filter
    * shape at manifest granularity). On a table whose values scatter a
    * key across few files, a point lookup opens those files plus the
    * sketch fpp, not the table. The residual equality filter still
    * applies and pushes into the parquet scan. Falls back to a plain
    * filtered read when the version carries no bloom for `pointCol`. */
  def readCurrentPoint(spark: SparkSession, root: String,
                       pointCol: String, value: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no committed version"))
    val cmap = columnMapOf(spark, root, v)
    val physCol = cmap.find(_._2 == pointCol).map(_._1).getOrElse(pointCol)
    val eq = col(physCol) === lit(value)
    if (!bloomColsOf(spark, root, v).contains(physCol))
      readResolved(spark, root, v).filter(col(pointCol) === lit(value))
    else {
      val files = filesForPoint(spark, root, v, physCol, value)
      if (files.isEmpty) {
        // definitively absent: no file can contain it — anchor the
        // empty result's SCHEMA on one file instead of footer-reading
        // the whole table (measured 2.3 s vs 0.1 s at 1000 files)
        val any = spark.read.parquet(s"$root/$StatsDir/v=$v")
          .select("file").head().getString(0)
        toLogical(physReader(spark, root, v).parquet(any)
          .filter(eq).filter(lit(false)), cmap)
      } else toLogical(applyDv(spark, root, v,
        physReader(spark, root, v).parquet(files: _*)).filter(eq), cmap)
    }
  }

  /** Atomic pointer swap: write `_CURRENT.tmp`, then rename over the
    * pointer. FileContext's OVERWRITE rename is the atomic primitive on
    * both HDFS and the local FS (plain FileSystem.rename refuses to
    * replace an existing destination). */
  private[graft] def setPointer(spark: SparkSession, root: String,
                                    v: Long): Unit = {
    val ptr = new org.apache.hadoop.fs.Path(root, Pointer)
    if ("file" == Option(ptr.toUri.getScheme).getOrElse("file")) {
      // Local FS: Hadoop's ChecksumFs renames the data file and its
      // .crc sidecar as TWO operations, so a concurrent pointer read
      // between them dies with ChecksumException (seen in the racing-
      // merge spec). NIO ATOMIC_MOVE with no sidecar at all is the
      // actually-atomic local swap; any historical sidecar is removed
      // so stale checksums can never shadow the moved content.
      val dir = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(root).toUri.getPath)
      val tmp = dir.resolve(Pointer + ".tmp")
      java.nio.file.Files.write(tmp, s"$v\n".getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(dir.resolve("." + Pointer + ".crc"))
      java.nio.file.Files.move(tmp, dir.resolve(Pointer),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new org.apache.hadoop.fs.Path(root, Pointer + ".tmp")
      val fs = fsOf(spark, ptr)
      val out = fs.create(tmp, true)
      try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        ptr.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Copy-on-write keyed MERGE as a snapshot commit: replace matching
    * keys with the change batch, keep the rest, commit the result as a
    * new version. Readers concurrent with the merge see the old
    * snapshot until the single pointer swap. One keyed shuffle over the
    * base (the change side is typically small and broadcasts).
    *
    * FILE-GRANULAR when the table carries per-file stats on the merge
    * key ([[commitWithStats]]): only the files whose `[min,max]` key
    * interval contains at least one change key are rewritten (survivor
    * rows anti-joined against the batch, batch unioned in); every other
    * file is carried into the new version BY REFERENCE through the
    * same `_manifest` mechanism as [[deleteWhere]]. On a key-laid-out
    * 100 TB table a merge touching 0.1% of the key space costs
    * O(matching files) of data I/O plus an O(files) metadata write —
    * never a table rewrite; an insert-only batch (keys beyond every
    * file's range) rewrites ZERO base files and degenerates to an
    * append. The touch decision is a broadcast interval join of the
    * O(files) stats rows against the distinct change keys — metadata
    * mass, not data. Stats-less tables keep the full-rewrite path
    * (they have no skipping index to prove which files a key could
    * hide in). Semantics are identical on both paths, including NULL
    * keys (never equal to a change key, so NULL-key base rows survive;
    * an all-NULL-key file has NULL stats bounds and is carried) and
    * add-column evolution (carried files surface the new column as
    * NULL through the recorded-schema read, exactly as a rewritten
    * NULL would read).
    *
    * Serializable under concurrent merges: the claim target is exactly
    * `pointer+1`, so winning it proves the base snapshot read below is
    * the true predecessor — no other committer can finalize that
    * version. A loser waits for the winner's pointer swap and RETRIES
    * the whole merge against the new head (its change batch is never
    * silently dropped); if a concurrent blind [[commit]] out-versions
    * the merge before its swap, the merge also retries. A claim held by
    * a CRASHED writer stalls merges by design (nobody can prove the
    * version won't appear) — the retry limit surfaces it and
    * [[vacuum]] `clearStaleClaims=true` is the admin recovery. */
  def mergeCommit(spark: SparkSession, root: String, changes: DataFrame,
                  key: String, maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to merge into"))
      if (claimVersion(spark, root, base + 1)) {
        // CHECK constraints: validate the CHANGE batch up front —
        // O(batch), and base rows were validated by their own commits,
        // so the merged result cannot introduce a violation elsewhere
        val mcs = checkConstraintsOf(spark, root, base)
        if (mcs.nonEmpty) violationCounts(changes, mcs)
          .filter(_._2 > 0).headOption.foreach { case (n, c) =>
            // nothing written yet — release the claim so pointer+1
            // committers are not wedged, then reject
            fsOf(spark, new org.apache.hadoop.fs.Path(root)).delete(
              new org.apache.hadoop.fs.Path(
                root, s"$ClaimsDir/${base + 1}"), false)
            throw new ConstraintViolation(n, c,
              s"merge into $root rejected: CHECK constraint `$n` " +
                s"failed on $c change row(s); pointer stays on v=$base")
          }
        val cmap = columnMapOf(spark, root, base)
        val physKey = physicalOf(spark, root, base, key)
        val statsPath =
          new org.apache.hadoop.fs.Path(root, s"$StatsDir/v=$base")
        val prunable = statsColsOf(spark, root, base).contains(physKey) &&
          fsOf(spark, statsPath).exists(statsPath)
        if (prunable) {
          import org.apache.spark.sql.functions._
          // the stats manifest is the file inventory (deleteWhere's
          // discipline): O(files) metadata rows decide the rewrite set
          val stats = spark.read.parquet(statsPath.toString)
            .select(col("file"), col(s"min_$physKey").as("kmin"),
              col(s"max_$physKey").as("kmax"))
          val all = stats.select("file").collect().map(_.getString(0)).toSeq
          // touched = files whose key interval contains ≥1 change key:
          // broadcast the metadata-sized interval list, stream the keys
          // through it (BNLJ — non-equi, but one side is O(files) rows)
          val touched = changes.select(col(key).as("k"))
            .filter(col("k").isNotNull).distinct()
            .join(broadcast(stats),
              col("k") >= col("kmin") && col("k") <= col("kmax"), "inner")
            .select("file").distinct()
            .collect().map(_.getString(0)).toSeq
          val untouched = all.diff(touched)
          // survivors: touched files' rows whose key is NOT replaced.
          // Recorded-schema read (mixed generations after an evolution),
          // logical names for the anti-join, empty-but-full-schema
          // relation when no file overlaps (pure insert).
          val survivors =
            if (touched.nonEmpty)
              // tombstones apply to the rewrite read, so a MOR-deleted
              // row never re-materializes through a merge's rewrite
              toLogical(applyDv(spark, root, base,
                  physReader(spark, root, base).parquet(touched: _*)),
                cmap).join(changes.select(key), Seq(key), "left_anti")
            else readResolved(spark, root, base).limit(0)
          val merged =
            changes.unionByName(survivors, allowMissingColumns = true)
          // Output width from the REWRITE mass (touched-file bytes,
          // floored at the touched-file count — one reader ≈ one
          // writer), never from the union's inherited partitioning: a
          // CDC batch filtered out of a wide corpus scan carries the
          // scan's near-empty splits, and writing through them exploded
          // a 72.6 MB band rewrite into 210 ~350 KB files (measured,
          // sf100 one-hop MergeSoak). Insert-only merges (no touched
          // files) size from the batch's plan estimate instead — an
          // in-memory over-estimate, so it only widens, clamped at cap.
          val cap = spark.sessionState.conf.numShufflePartitions
          val width =
            if (touched.nonEmpty) {
              val inv = fileInventory(spark, root, base).toMap
              math.max(
                compactWidthFor(touched.map(inv.getOrElse(_, 0L)).sum, cap),
                math.min(touched.size, cap))
            } else {
              val est = merged.queryExecution.optimizedPlan.stats.sizeInBytes
              compactWidthFor(
                if (est.isValidLong) est.toLong else Long.MaxValue, cap)
            }
          toPhysical(merged, cmap).coalesce(width).write.mode("overwrite")
            .parquet(s"$root/v=${base + 1}")
          // manifest carries untouched files by reference; stats carry
          // verbatim for them and re-derive over the fresh files; the
          // recorded schema absorbs any add-column evolution
          writeManifestAndStats(spark, root, base + 1, base, untouched)
          if (pointerAdvance(spark, root, base + 1)) return base + 1
        } else {
          val baseDf = readResolved(spark, root, base)
          // allowMissingColumns: a change batch carrying a NEW column is
          // an add-column evolution (kept rows read NULL there), and a
          // batch without a recently-added column still merges (its rows
          // get NULL) — either way the union schema is recorded below
          val merged = changes.unionByName(
            baseDf.join(changes.select(key), Seq(key), "left_anti"),
            allowMissingColumns = true)
          // the merge is computed in LOGICAL names (changes and baseDf
          // both are); freeze back to physical before the write
          val physMerged = toPhysical(merged, cmap)
          physMerged.write.mode("overwrite").parquet(s"$root/v=${base + 1}")
          // carry the base's stats manifest forward (same contract as
          // compact: maintenance must not silently kill data skipping)
          val sc = statsColsOf(spark, root, base)
          if (sc.nonEmpty) writeStats(spark, root, base + 1, sc,
            bloomColsOf(spark, root, base))
          writeSchema(spark, root, base + 1, physMerged.schema)
          if (pointerAdvance(spark, root, base + 1)) return base + 1
        }
        // a concurrent blind commit claimed a higher version and swapped
        // first — this merge never became current; recompute on the head
      } else {
        // lost the claim: the winner's swap is in flight — wait for the
        // pointer to move past our base before recomputing
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"mergeCommit to $root did not win a claim in $maxRetries attempts " +
        "(live contention, or a crashed writer's stale claim — see vacuum)")
  }

  /** Row-level DELETE with file-granular copy-on-write: remove every
    * row with `statsCol BETWEEN lo AND hi`, rewriting ONLY the files
    * whose per-file `[min,max]` stats overlap the range. Untouched
    * files are carried into the new version BY REFERENCE through a
    * file manifest (`_manifest/v=N`) — the Delta/Iceberg shape where a
    * version is a file LIST, not a directory copy — so at 100 TB a
    * selective delete costs O(matching files) of data I/O plus an
    * O(files) metadata write, never a table rewrite. On a range-laid-
    * out table ([[commitWithStats]]'s contract) the overlap set IS the
    * selectivity.
    *
    * The new version's stats manifest carries the untouched files'
    * rows verbatim and re-derives stats over just the rewritten files,
    * so data skipping survives the delete. Runs under the same
    * claim-exactly-`pointer+1` protocol as [[mergeCommit]] (read-
    * modify-write serializability). Requires per-file stats on
    * `statsCol`: the skipping index is what makes the delete file-
    * granular (a stats-less table would degrade to a blind full
    * rewrite — refuse instead, the caller should commitWithStats).
    *
    * [[compact]] re-materializes a manifest version self-contained,
    * collapsing the reference chain; [[vacuum]] keeps any version
    * directory a retained manifest still references. */
  def deleteWhere(spark: SparkSession, root: String, statsCol: String,
                  lo: org.apache.spark.sql.Column,
                  hi: org.apache.spark.sql.Column,
                  maxRetries: Int = 16): Long = {
    import org.apache.spark.sql.functions._
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to delete from"))
      // column mapping: the caller names the LOGICAL column; stats
      // manifests and the physical files know its frozen physical name
      val physCol = physicalOf(spark, root, base, statsCol)
      val sc = statsColsOf(spark, root, base)
      require(sc.contains(physCol),
        s"deleteWhere needs per-file stats on $statsCol (have: $sc) — " +
          "commit with commitWithStats to make deletes file-granular")
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        // the stats manifest is the file inventory (its `file` values
        // are input_file_name-format URIs, consistent across carried
        // and fresh rows)
        val all = spark.read.parquet(s"$root/$StatsDir/v=$base")
          .select("file").collect().map(_.getString(0)).toSeq
        val touched = prunedFiles(spark, root, base, physCol, lo, hi)
        val untouched = all.diff(touched)
        val between = col(physCol) >= lo && col(physCol) <= hi
        // SQL DELETE WHERE semantics: a NULL predicate does not delete.
        // A bare `!between` evaluates to NULL on NULL-key rows and the
        // filter would DROP them — but only in rewritten files (carried
        // files never evaluate the predicate), deleting NULL rows or not
        // based on which file they happened to share with an overlapping
        // range. coalesce pins NULL-key rows as survivors everywhere.
        val keep = !coalesce(between, lit(false))
        // rewrite ONLY the overlapping files, dropping matching rows;
        // a no-overlap delete writes a schema-only anchor so the v=N
        // directory exists for the claim/observedMax protocol. The
        // touched files are read with the base's RECORDED schema when
        // present: after an add-column evolution they can mix
        // generations, and plain inference would take one file's schema
        // and drop the later column from the rewrite.
        val touchedReader = schemaOf(spark, root, base) match {
          case Some(s) => spark.read.schema(s)
          case None => spark.read
        }
        val rewritten =
          if (touched.nonEmpty) // DV-filtered: a COW rewrite of a file
            // holding MOR tombstones must not resurrect those rows
            applyDv(spark, root, base,
              touchedReader.parquet(touched: _*)).filter(keep)
          else toPhysical(readResolved(spark, root, base),
            columnMapOf(spark, root, base)).limit(0)
        rewritten.write.mode("overwrite").parquet(s"$root/v=$next")
        writeManifestAndStats(spark, root, next, base, untouched)
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"deleteWhere on $root did not win a claim in $maxRetries attempts")
  }

  /** Row-level DELETE, MERGE-ON-READ — the Delta deletion-vector
    * motion: no data file is rewritten at all. The new version's
    * manifest carries EVERY base file by reference, plus a tombstone
    * sidecar (`_dv/v=N`, rows of `(file, row_index)`) naming exactly
    * the deleted rows; every read path anti-joins the sidecar against
    * the scan's `_metadata` columns ([[applyDv]]).
    *
    * This is the complement of [[deleteWhere]]'s copy-on-write: COW
    * wins when deletes CLUSTER (a range on the layout key rewrites few
    * files), MOR wins when they SCATTER — a predicate matching one row
    * in every file of a 100 TB table (the GDPR/right-to-be-forgotten
    * erasure shape, per-id scrubs) costs O(matched rows) of sidecar
    * metadata here versus a full table rewrite there. The read-side
    * price is one broadcast anti-join per scan until [[compact]] (or
    * any rewriting maintenance pass) re-materializes the rows and
    * clears the sidecar — run it when the sidecar grows past the
    * broadcast bound, exactly Delta's PURGE discipline.
    *
    * Composes with the rest of the layer: tombstones survive appends
    * and metadata-only commits verbatim, follow carried files through
    * file-granular merges/deletes (rewritten files' entries die with
    * the DV-filtered rewrite), ride shallow clones, stay version-pinned
    * for time travel ([[readVersion]] of the pre-delete version still
    * sees the rows), and are vacuumed with their version. `cond` is
    * evaluated in LOGICAL names with SQL DELETE semantics (a NULL
    * predicate deletes nothing). Same claim-exactly-`pointer+1`
    * serialization as every read-modify-write commit.
    *
    * Streaming append-tails are strictly SAFER under MOR than under
    * COW deletes: the commit adds no data files (the version dir holds
    * only a zero-row schema anchor), so a running tail sees nothing —
    * no rewritten files interleaving already-emitted rows, which is
    * the case [[graft.streaming.Streaming.tailVacuumAudit]] exists to
    * refuse. (File tails never retract rows on any engine; deletes
    * reach streaming consumers through [[changeFeed]].)
    *
    * @return the newest committed version carrying this delete's
    *         effect: normally the MOR commit itself, but when the new
    *         sidecar crosses the broadcast bound and the auto-purge
    *         ([[maybePurgeOversizedDv]]) runs and succeeds, the
    *         follow-on purge's commit. Purge failure is logged and
    *         swallowed — the delete is durable either way. */
  def deleteWhereMor(spark: SparkSession, root: String,
                     cond: org.apache.spark.sql.Column,
                     maxRetries: Int = 16): Long = {
    import org.apache.spark.sql.functions._
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to delete from"))
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        val cmap = columnMapOf(spark, root, base)
        val reader = physReader(spark, root, base)
        val physical = manifestFiles(spark, root, base) match {
          case Some(files) if files.nonEmpty => reader.parquet(files: _*)
          case _ => reader.parquet(s"$root/v=$base")
        }
        // pin (file, row_index) BEFORE the existing-DV anti-join (both
        // relations are parquet scans — `_metadata` goes ambiguous
        // after the join), apply the base's tombstones so already-
        // deleted rows never re-enter, then evaluate the predicate in
        // logical names
        val tagged = applyDv(spark, root, base, physical
          .withColumn("__mor_file",
            canonMetaPath(col("_metadata.file_path")))
          .withColumn("__mor_idx", col("_metadata.row_index")))
        val fresh = toLogical(tagged, cmap)
          .filter(coalesce(cond, lit(false)))
          .select(col("__mor_file").as("file"),
            col("__mor_idx").as("row_index"))
        // persisted: the count below and the sidecar write would
        // otherwise each re-run the corpus-sized predicate scan
        val merged = dvOf(spark, root, base)
          .map(_.unionByName(fresh)).getOrElse(fresh).distinct().persist()
        try {
          val nTomb = merged.count()
          // schema anchor (the claim/observedMax protocol needs the
          // dir); all data rides by reference
          toPhysical(readResolved(spark, root, base), cmap).limit(0)
            .write.mode("overwrite").parquet(s"$root/v=$next")
          val carried = fileInventory(spark, root, base).map(_._1)
          writeManifestAndStats(spark, root, next, base, carried)
          // the carry above wrote the base's sidecar verbatim (all files
          // carried); replace it with base ∪ fresh. A predicate matching
          // zero rows on a DV-less base writes NO sidecar at all — an
          // empty one would tax every subsequent read with the anti-join
          // plus the per-plan inventory-hash check for no semantic
          // effect. Width tracks tombstone volume ([[DvRowsPerSidecarFile]])
          // so a scattered 10^9-row erasure never funnels through one
          // writer task.
          if (nTomb > 0) {
            val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
            val width = math.min(cap.toLong, (nTomb + DvRowsPerSidecarFile
              - 1) / DvRowsPerSidecarFile).toInt
            merged.coalesce(width).write.mode("overwrite")
              .parquet(s"$root/$DvDir/v=$next")
          }
          // The MOR commit is durable once the pointer advances; the
          // auto-purge is follow-on maintenance. A purge failure (e.g.
          // claim contention exhausting ITS retries) must not surface
          // as a deleteWhereMor failure — the delete committed. On
          // purge success the returned version is the PURGE's commit
          // (the newest version carrying the delete's effect); on
          // failure or opt-out it is the MOR commit itself.
          if (pointerAdvance(spark, root, next))
            return (try maybePurgeOversizedDv(spark, root, next)
            catch {
              case e: Exception =>
                System.err.println(s"graft: post-MOR DV auto-purge on " +
                  s"$root failed (${e.getMessage}); the MOR delete at " +
                  s"v=$next is committed — run Snapshot.purgeDv manually")
                next
            })
        } finally merged.unpersist()
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"deleteWhereMor on $root did not win a claim in $maxRetries attempts")
  }

  /** The README's COW-vs-MOR operational rule, self-executing: once a
    * just-committed sidecar exceeds the [[DvBroadcastBytes]] bound
    * (overridable via `graft.snapshot.dvAutoPurgeBytes`), every read
    * of the version pays a SHUFFLED anti-join instead of a broadcast —
    * from that point the one-time [[purgeDv]] rewrite is strictly
    * cheaper than the standing read tax, so it runs here unless the
    * operator opts out (`graft.snapshot.dvAutoPurge=false`, which
    * downgrades to a logged recommendation). Called after the pointer
    * advance, so the MOR commit itself stays O(matched rows) and the
    * purge is an ordinary follow-on maintenance commit. */
  private def maybePurgeOversizedDv(spark: SparkSession, root: String,
                                    v: Long): Long = {
    val p = new org.apache.hadoop.fs.Path(root, s"$DvDir/v=$v")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return v
    val bytes = fs.getContentSummary(p).getLength
    val bound = spark.conf.getOption("graft.snapshot.dvAutoPurgeBytes")
      .map(_.toLong).getOrElse(DvBroadcastBytes)
    if (bytes <= bound) return v
    val auto = spark.conf.getOption("graft.snapshot.dvAutoPurge")
      .forall(_.toBoolean)
    if (auto) {
      System.err.println(s"graft: DV sidecar on $root v=$v is $bytes B " +
        s"(> $bound B broadcast bound) — auto-purging (set " +
        "graft.snapshot.dvAutoPurge=false to defer)")
      purgeDv(spark, root)
    } else {
      System.err.println(s"graft: DV sidecar on $root v=$v is $bytes B " +
        s"(> $bound B broadcast bound) — reads now pay a shuffled " +
        "anti-join; run Snapshot.purgeDv to clear it")
      v
    }
  }

  /** PURGE the deletion-vector sidecar — Delta's `REORG TABLE … APPLY
    * (PURGE)` as a first-class maintenance pass: rewrite ONLY the
    * files that carry tombstones (DV-filtered, so the deleted rows
    * vanish from the bytes), carry every clean file into the new
    * version by manifest reference, and drop the sidecar — after
    * which reads pay zero anti-join tax again. Where [[compact]]
    * rewrites the whole table, this touches O(tombstoned-file bytes):
    * on a table whose deletes clustered in a few files, the purge
    * reads those files, not the table. (A fully scattered delete —
    * of23's GDPR shape — tombstones every file, and purge degrades to
    * compact's cost; both points measured in BENCH_NOTES.) The
    * sidecar clears through [[writeManifestAndStats]]'s carry rule
    * itself: every surviving tombstone names a rewritten file, so the
    * carried set is empty — no special case. No-op (current version
    * returned, no commit burned) on a table without tombstones. */
  def purgeDv(spark: SparkSession, root: String,
              maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to purge"))
      if (dvOf(spark, root, base).isEmpty) return base
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        val touched = dvOf(spark, root, base).get
          .select("file").distinct().collect().map(_.getString(0)).toSeq
        val inv = fileInventory(spark, root, base)
        // Set membership, not Seq.contains: a fully scattered delete on
        // a 100k-file table would otherwise run ~10^10 driver-side
        // string compares here (O(files × touched))
        val touchedSet = touched.toSet
        val untouched = inv.map(_._1).filterNot(touchedSet.contains)
        val touchedBytes = inv.filter(f => touchedSet.contains(f._1))
          .map(_._2).sum
        // target-file-size width, FLOORED at the touched-file count:
        // bytes alone under-width hyper-compressed tables (the soak
        // fixture packs 150M rows into 119 MB → width 1 → a one-task
        // whole-corpus rewrite, measured 277 s at sf100); matching the
        // input file count keeps one reader≈one writer parallelism and
        // never explodes small files
        val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
        val width = math.max(compactWidthFor(touchedBytes, cap),
          math.min(touched.size, cap))
        applyDv(spark, root, base,
            physReader(spark, root, base).parquet(touched: _*))
          .coalesce(width)
          .write.mode("overwrite").parquet(s"$root/v=$next")
        writeManifestAndStats(spark, root, next, base, untouched)
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"purgeDv on $root did not win a claim in $maxRetries attempts")
  }

  /** ADD a named CHECK constraint (the Delta `ALTER TABLE ... ADD
    * CONSTRAINT ... CHECK (...)` shape): validate that the CURRENT
    * data already satisfies `exprSql` (one column-pruned aggregate
    * scan — refused with the violation count otherwise, no version
    * burned), then commit a METADATA-ONLY version carrying every file
    * by manifest reference (zero data I/O at any table size). From
    * that version on, every [[commit]]/[[appendCommit]]/[[mergeCommit]]
    * batch is validated before the pointer swap and rejected
    * atomically on violation ([[ConstraintViolation]]) — the
    * write-side quality gate a 100 TB ingest pipeline runs on, where a
    * bad batch must die at the boundary instead of poisoning the
    * table. NULL predicate rows pass (SQL CHECK semantics).
    * Maintenance passes ([[compact]], [[deleteWhere]], [[vacuum]])
    * skip re-validation: they only rearrange or remove already-
    * validated rows. */
  def addCheckConstraint(spark: SparkSession, root: String,
                         name: String, exprSql: String,
                         maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to constrain"))
      val existing = checkConstraintsOf(spark, root, base)
      require(!existing.exists(_._1 == name),
        s"constraint `$name` already exists on $root")
      violationCounts(readResolved(spark, root, base),
          Seq((name, exprSql))).filter(_._2 > 0)
        .headOption.foreach { case (n, c) =>
          throw new ConstraintViolation(n, c,
            s"cannot add CHECK constraint `$n` to $root: existing data " +
              s"violates it on $c row(s)")
        }
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        // metadata-only version: an empty data dir (for the claim /
        // observedMax protocol) + a manifest referencing base's files
        fsOf(spark, new org.apache.hadoop.fs.Path(root))
          .mkdirs(new org.apache.hadoop.fs.Path(root, s"v=$next"))
        writeManifestAndStats(spark, root, next, base,
          fileInventory(spark, root, base).map(_._1))
        writeConstraintSet(spark, root, next,
          existing :+ (name -> exprSql))
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"addCheckConstraint on $root did not win a claim in " +
        s"$maxRetries attempts")
  }

  /** DROP a CHECK constraint by name — a metadata-only version whose
    * constraint set omits it; later versions stop enforcing while
    * time-travel reads of earlier versions still report it through
    * [[checkConstraintsOf]]. */
  def dropCheckConstraint(spark: SparkSession, root: String,
                          name: String, maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version"))
      val existing = checkConstraintsOf(spark, root, base)
      require(existing.exists(_._1 == name),
        s"no constraint `$name` on $root (have: " +
          s"${existing.map(_._1).mkString(", ")})")
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        fsOf(spark, new org.apache.hadoop.fs.Path(root))
          .mkdirs(new org.apache.hadoop.fs.Path(root, s"v=$next"))
        writeManifestAndStats(spark, root, next, base,
          fileInventory(spark, root, base).map(_._1))
        writeConstraintSet(spark, root, next,
          existing.filterNot(_._1 == name))
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"dropCheckConstraint on $root did not win a claim in " +
        s"$maxRetries attempts")
  }

  /** METADATA-ONLY column RENAME (the Delta column-mapping / Iceberg
    * field-ID motion): physical names are frozen at first commit, so a
    * rename writes only a new `(physical, logical)` map version and a
    * manifest carrying every file by reference — zero data I/O at any
    * table size. From then on readers alias physical → logical after
    * the scan, writers translate logical → physical before it
    * ([[commit]]/[[appendCommit]]/[[mergeCommit]] accept batches in
    * the NEW names), stats/bloom skipping keys stay physical (pruned
    * reads translate), renames COMPOSE (a→b→c keeps one map entry),
    * and [[changeFeed]] crosses the boundary as pure renames. Old
    * versions still read under the names they had. Refused when the
    * source column is missing, the target name is taken, or an active
    * CHECK constraint references the column (constraints are authored
    * in logical names — rename would silently detach them). Like the
    * constraint sets, the mapping persists across [[restore]]:
    * metadata history is orthogonal to data history. */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String,
                   maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to rename in"))
      val logicalNames = readResolved(spark, root, base).columns.toSet
      require(logicalNames.contains(from),
        s"no column `$from` in $root (have: ${logicalNames.mkString(", ")})")
      require(!logicalNames.contains(to),
        s"column `$to` already exists in $root")
      checkConstraintsOf(spark, root, base).foreach { case (n, e) =>
        require(!e.contains(from),
          s"rename of `$from` refused: CHECK constraint `$n` ($e) " +
            "references it — drop the constraint first")
      }
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        fsOf(spark, new org.apache.hadoop.fs.Path(root))
          .mkdirs(new org.apache.hadoop.fs.Path(root, s"v=$next"))
        writeManifestAndStats(spark, root, next, base,
          fileInventory(spark, root, base).map(_._1))
        val phys = physicalOf(spark, root, base, from)
        val composed = columnMapOf(spark, root, base)
          .filterNot(_._1 == phys) :+ (phys -> to)
        // identity entries (renamed back to the physical name) drop out
        writeColumnMap(spark, root, next,
          composed.filterNot(p => p._1 == p._2))
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"renameColumn on $root did not win a claim in $maxRetries attempts")
  }

  private val DroppedDir = "_dropped"

  /** PHYSICAL names retired by [[dropColumn]] as of version `v` —
    * full-set-per-change, nearest-at-or-below resolution, exactly the
    * [[columnMapOf]] protocol. O(1) metadata read. */
  private[graft] def droppedOf(spark: SparkSession, root: String,
                               v: Long): Set[String] = {
    val dir = new org.apache.hadoop.fs.Path(root, DroppedDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) return Set.empty
    val vs = fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+") => n.stripPrefix("v=").toLong }
      .filter(_ <= v)
    if (vs.isEmpty) Set.empty
    else spark.read.parquet(s"$root/$DroppedDir/v=${vs.max}")
      .select("physical").collect().map(_.getString(0)).toSet
  }

  private def writeDropped(spark: SparkSession, root: String, v: Long,
                           s: Set[String]): Unit = {
    import spark.implicits._
    s.toSeq.sorted.toDF("physical").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$DroppedDir/v=$v")
  }

  /** METADATA-ONLY column DROP (the other half of the column-mapping
    * story beside [[renameColumn]]): the new version records the
    * table's physical schema WITHOUT the column plus a manifest
    * carrying every file by reference — zero data I/O at any table
    * size. Carried files still physically contain the bytes, but the
    * recorded schema governs every read, so the vectorized reader
    * never materializes the column (dropping is also a read-cost
    * optimization, not just a logical one); old versions read under
    * the schema they had, so time travel still sees the column.
    *
    * The dropped PHYSICAL name is tombstoned: an [[appendCommit]]
    * batch that reintroduces it is refused, because the merged schema
    * would otherwise resurrect the carried files' old values next to
    * the batch's new ones — silent corruption. A retired name stays
    * retired (the Iceberg/Delta field-id discipline — ids are never
    * reused); evolve under a fresh logical name instead.
    * [[mergeCommit]] needs no guard: it rewrites the table from the
    * resolved (post-drop) read, so a change batch re-adding the name
    * is an ordinary add-column evolution with NULLs for kept rows.
    * Refused when the column is missing, is the table's last column,
    * or an active CHECK constraint references it. */
  def dropColumn(spark: SparkSession, root: String, colName: String,
                 maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to drop from"))
      val resolved = readResolved(spark, root, base)
      val logicalNames = resolved.columns.toSet
      require(logicalNames.contains(colName),
        s"no column `$colName` in $root (have: ${logicalNames.mkString(", ")})")
      require(logicalNames.size > 1,
        s"refusing to drop `$colName`: it is the last column of $root")
      checkConstraintsOf(spark, root, base).foreach { case (n, e) =>
        require(!e.contains(colName),
          s"drop of `$colName` refused: CHECK constraint `$n` ($e) " +
            "references it — drop the constraint first")
      }
      // a stats/bloom key cannot be dropped in place: later appends
      // re-derive fresh per-file stats over the manifest's columns and
      // would aggregate a column the new files no longer have
      val physKey = physicalOf(spark, root, base, colName)
      require(!(statsColsOf(spark, root, base) ++
          bloomColsOf(spark, root, base)).contains(physKey),
        s"drop of `$colName` refused: it keys the data-skipping index " +
          "— recommit with different stats columns first")
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        fsOf(spark, new org.apache.hadoop.fs.Path(root))
          .mkdirs(new org.apache.hadoop.fs.Path(root, s"v=$next"))
        writeManifestAndStats(spark, root, next, base,
          fileInventory(spark, root, base).map(_._1))
        val cmap = columnMapOf(spark, root, base)
        val phys = physicalOf(spark, root, base, colName)
        // the base's PHYSICAL schema (logical fields mapped back
        // through the column map — toLogical only renames, so this is
        // exact) minus the dropped field, recorded for `next`. This
        // OVERWRITES whatever writeManifestAndStats recorded.
        val byLogical = cmap.map(_.swap).toMap
        val physSchema = org.apache.spark.sql.types.StructType(
          resolved.schema.fields
            .map(f => f.copy(name = byLogical.getOrElse(f.name, f.name)))
            .filterNot(_.name == phys))
        writeSchema(spark, root, next, physSchema)
        // the mapping entry (if any) retires with the column
        writeColumnMap(spark, root, next, cmap.filterNot(_._1 == phys))
        writeDropped(spark, root, next, droppedOf(spark, root, base) + phys)
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"dropColumn on $root did not win a claim in $maxRetries attempts")
  }

  /** Manifest-referenced APPEND: commit `df` as NEW files while every
    * existing file rides into the new version by reference — an
    * O(batch) write at any table size, vs [[commit]]'s full rewrite
    * (the incremental-ingest shape: a CDC/stream consumer lands each
    * batch in one append, and scan cost is controlled afterwards by
    * [[compactSmall]]). Stats carry verbatim for referenced files and
    * are re-derived over just the appended ones. The first commit on
    * an empty table degrades to a plain [[commit]]. Note appends are
    * ADDITIVE by contract: same-key rows accumulate (use
    * [[mergeCommit]] for upsert semantics). */
  def appendCommit(df: DataFrame, root: String,
                   maxRetries: Int = 16): Long = {
    val spark = df.sparkSession
    var attempt = 0
    while (attempt < maxRetries) {
      currentVersion(spark, root) match {
        case None =>
          // The empty-table bootstrap must ALSO serialize through the
          // claim: two appends racing here as blind [[commit]]s would
          // each land a full-replace version (v=1, v=2) and the pointer
          // would end on ONE batch — the other silently lost despite
          // append's additive contract. Claim the first version
          // ourselves; a lost claim waits for the winner's pointer swap
          // and re-enters the loop, which then sees Some(base) and
          // appends on top of it.
          val next = observedMax(spark, root) + 1
          if (claimVersion(spark, root, next)) {
            df.write.mode("overwrite").parquet(s"$root/v=$next")
            writeSchema(spark, root, next, df.schema)
            // Publish is a strict CAS against the EMPTY table: when
            // `next > 1` this claim sits ahead of other claimants still
            // mid-bootstrap, and one of them can publish between our
            // None observation and our swap. An unconditional advance
            // then replaced their batch with ours — silent loss under a
            // perfectly contiguous version history (caught by the
            // two-JVM SnapshotRace soak). On CAS failure the table is
            // no longer empty: UPGRADE this commit in place to an
            // append — we still hold the claim on `next`, the data dir
            // is written, so carry the now-current head's inventory and
            // CAS against that head; re-carry if it moves again (each
            // retry means a version below `next` published — finite).
            var outcome = 0L // >0: committed; <0: out-versioned
            while (outcome == 0L) {
              currentVersion(spark, root) match {
                case None =>
                  if (pointerAdvance(spark, root, next, expectedPrev = 0L))
                    outcome = next
                  // else a concurrent bootstrap published: loop — the
                  // re-read sees Some and upgrades to an append
                case Some(base2) if base2 < next =>
                  // The data dir was written from RAW df (the
                  // bootstrap assumed an empty table). If the
                  // now-current head carries a column map or
                  // tombstones, these files hold LOGICAL names the
                  // head's physical schema may not match, and the
                  // tombstone guard never ran — release the claim and
                  // dir and retry through the normal Some(base) append
                  // arm, which renames via toPhysical and enforces the
                  // guard before writing.
                  if (columnMapOf(spark, root, base2).nonEmpty
                      || droppedOf(spark, root, base2).nonEmpty) {
                    val fs = fsOf(spark,
                      new org.apache.hadoop.fs.Path(root))
                    fs.delete(
                      new org.apache.hadoop.fs.Path(root, s"v=$next"), true)
                    fs.delete(new org.apache.hadoop.fs.Path(root,
                      s"$ClaimsDir/$next"), false)
                    outcome = -1L
                  } else {
                    enforceOrRelease(spark, root, next, base2)
                    writeManifestAndStats(spark, root, next, base2,
                      fileInventory(spark, root, base2).map(_._1))
                    if (pointerAdvance(spark, root, next,
                        expectedPrev = base2))
                      outcome = next
                    // else the head moved again — re-carry from it
                  }
                case Some(_) =>
                  // the pointer PASSED our claim while we wrote (a
                  // later claimant's CAS won): this version can never
                  // publish — abandon (orphan dir + decided claim are
                  // vacuum's to clean) and retry on the new head
                  outcome = -1L
              }
            }
            if (outcome > 0L) return outcome
          } else {
            val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
            while (currentVersion(spark, root).isEmpty
                   && System.nanoTime() < deadline) Thread.sleep(20)
          }
        case Some(base) =>
          // tombstone guard (see [[dropColumn]]): a batch whose
          // physical names include a dropped column would make the
          // merged schema resurrect carried files' old values. Only
          // names ABSENT from the base's live schema are refused — a
          // [[restore]] to a pre-drop version puts the column back in
          // the schema, and appending it there is consistent (carried
          // files all hold real values again).
          val physBatch = toPhysical(df, columnMapOf(spark, root, base))
          val livePhys = schemaOf(spark, root, base)
            .map(_.fieldNames.toSet)
            .getOrElse {
              val byLogical =
                columnMapOf(spark, root, base).map(_.swap).toMap
              readResolved(spark, root, base).columns
                .map(c => byLogical.getOrElse(c, c)).toSet
            }
          val revived = physBatch.columns.toSet
            .intersect(droppedOf(spark, root, base)) -- livePhys
          require(revived.isEmpty,
            s"append to $root refused: column(s) ${revived.mkString(", ")} " +
              "were dropped and their physical names are retired — " +
              "use a fresh logical name")
          if (claimVersion(spark, root, base + 1)) {
            val next = base + 1
            val carried = fileInventory(spark, root, base).map(_._1)
            // column mapping: logical batch → frozen physical names
            physBatch.write.mode("overwrite").parquet(s"$root/v=$next")
            // enforce on the APPENDED files only — carried rows were
            // validated by the commits that wrote them
            enforceOrRelease(spark, root, next, base)
            writeManifestAndStats(spark, root, next, base, carried)
            if (pointerAdvance(spark, root, next)) return next
          } else {
            if (awaitAdvance(spark, root, base)) attempt -= 1
          }
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"appendCommit to $root did not win a claim in $maxRetries attempts")
  }

  /** Shared tail of every file-granular commit: write version `next`'s
    * file manifest (`carried` by reference + whatever parquet the
    * commit just wrote into `v=next`) and, when the base carries a
    * stats manifest, the new stats manifest — `carried` rows verbatim,
    * fresh stats re-derived by scanning ONLY the newly written files. */
  private def writeManifestAndStats(spark: SparkSession, root: String,
                                    next: Long, base: Long,
                                    carriedFiles: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val newDir = new org.apache.hadoop.fs.Path(root, s"v=$next")
    val newFiles = fsOf(spark, newDir).listStatus(newDir)
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .map(canonFile).toSeq
    (carriedFiles ++ newFiles).toDF("file").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$ManifestDir/v=$next")
    // schema evolution: the new version's logical schema is the base's
    // with any NEW batch columns appended (one footer read of the fresh
    // files — a commit batch is schema-uniform). A legacy base with no
    // recorded schema stays legacy: recording only the batch's schema
    // would mask the carried files' columns.
    schemaOf(spark, root, base).foreach { baseSchema =>
      val vSchema =
        if (newFiles.isEmpty) baseSchema
        else mergedSchema(baseSchema, spark.read.parquet(newFiles.head).schema)
      writeSchema(spark, root, next, vSchema)
    }
    val sc = statsColsOf(spark, root, base)
    if (sc.nonEmpty) {
      val carried = spark.read.parquet(s"$root/$StatsDir/v=$base")
        .filter(col("file").isin(carriedFiles: _*))
      val blooms = bloomColsOf(spark, root, base)
      val aggs = statsAggs(spark, sc, blooms)
      // fresh-file stats from footers where eligible (same fast path
      // as writeStats — appends are the highest-frequency commit
      // shape, and the scan this replaces reads every appended byte
      // back); scan fallback otherwise
      val footerOk = blooms.isEmpty &&
        spark.conf.getOption("graft.stats.footerFastPath")
          .forall(_.toBoolean)
      val fresh =
        if (newFiles.isEmpty) carried.limit(0)
        else (if (footerOk) footerStatsPaths(spark, newFiles, sc) else None)
          .getOrElse(spark.read.parquet(newFiles: _*)
            .groupBy(canonMetaPath(input_file_name()).as("file"))
            .agg(aggs.head, aggs.tail: _*))
      carried.unionByName(fresh).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/$StatsDir/v=$next")
    }
    // merge-on-read tombstones follow their files: entries for CARRIED
    // files stay live in the new version; entries for rewritten files
    // die with them (the rewrite read was DV-filtered, so the rows are
    // gone from the fresh bytes). Written only when rows survive — a
    // DV-less version costs its readers nothing.
    dvOf(spark, root, base).foreach { dv =>
      // Loud invariant, not a silent filter: every sidecar file string
      // must byte-match a base-inventory string, or the carry below
      // would silently DROP tombstones and MOR-deleted rows would
      // resurrect on the next commit (the GDPR-erasure shape this
      // feature exists for). The sidecar strings come from
      // `_metadata.file_path` via canonMetaPath, the inventory from
      // `Path.toString` via canonFile — a table root whose URI-encoding
      // differs between the two (spaces, percent, non-ASCII) is exactly
      // the mismatch this catches. Driver-side O(files): the sidecar's
      // distinct-file set is metadata-sized by contract.
      val dvFiles = dv.select("file").distinct()
        .collect().map(_.getString(0))
      val baseInv = fileInventory(spark, root, base).map(_._1).toSet
      val orphans = dvFiles.filterNot(baseInv.contains)
      require(orphans.isEmpty,
        s"DV carry on $root v=$base→$next would silently drop tombstones " +
          s"for ${orphans.length} file(s) absent from the base inventory " +
          s"(byte-wise path mismatch — canonMetaPath vs canonFile " +
          s"canonicalization); first orphan: ${orphans.head}")
      val carriedSet = carriedFiles.toSet
      val keptFiles = dvFiles.filter(carriedSet.contains)
      if (keptFiles.nonEmpty)
        dv.filter(col("file").isin(keptFiles.toSeq: _*))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$root/$DvDir/v=$next")
    }
  }

  /** Incremental small-file compaction (the OPTIMIZE maintenance pass
    * a CDC- or delete-churned table needs): bin-pack ONLY the files
    * under `smallBytes` into ~`targetBytes` outputs and carry every
    * already-well-sized file into the new version by manifest
    * reference. Where [[compact]] rewrites the whole table (collapsing
    * reference chains for vacuum), this touches O(small-file bytes) —
    * on a 100 TB table whose churn left a few thousand 1 MB merge
    * outputs beside thousand-file terabytes of settled data, the
    * rewrite reads megabytes, not the table. A no-op (≤1 small file)
    * returns the current version without committing. Stats carry the
    * same way as [[deleteWhere]]'s, so data skipping survives. */
  def compactSmall(spark: SparkSession, root: String,
                   smallBytes: Long = 32L * 1024 * 1024,
                   targetBytes: Long = 128L * 1024 * 1024,
                   maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to compact"))
      val inv = fileInventory(spark, root, base)
      val (small, large) = inv.partition(_._2 < smallBytes)
      if (small.size <= 1) return base // already compact: no new version
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        val nOut = math.max(1L,
          (small.map(_._2).sum + targetBytes - 1) / targetBytes).toInt
        // coalesce, not repartition: bin-packing needs no shuffle.
        // Recorded schema for the same mixed-generation reason as
        // deleteWhere's rewrite — small files can straddle an
        // add-column evolution boundary.
        val smallReader = schemaOf(spark, root, base) match {
          case Some(s) => spark.read.schema(s)
          case None => spark.read
        }
        applyDv(spark, root, base,
          smallReader.parquet(small.map(_._1): _*)).coalesce(nOut)
          .write.mode("overwrite").parquet(s"$root/v=$next")
        writeManifestAndStats(spark, root, next, base, large.map(_._1))
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"compactSmall of $root did not win a claim in $maxRetries attempts")
  }

  /** SHALLOW CLONE: materialize a NEW table at `dstRoot` whose first
    * version REFERENCES the source's current files through a manifest —
    * the Delta `CREATE TABLE ... SHALLOW CLONE` shape: zero data I/O
    * at any table size (a schema anchor plus O(files) manifest rows),
    * after which the clone evolves independently (merges/deletes on
    * the clone write THEIR new files under `dstRoot` while untouched
    * data keeps riding the source's files by absolute reference — the
    * everyday dev/test-against-prod and experiment-branch motion).
    * Stats/bloom manifests copy over, so data skipping works on the
    * clone from the first read. Runs under the claim protocol on the
    * destination; the target must be a fresh root.
    *
    * Same caveat as Delta documents: the clone borrows the source's
    * RETENTION — vacuuming the source can collect files a clone still
    * references (the source does not know its clones). Pin clones to
    * sources with compatible retention, or [[compact]] the clone to
    * self-contain it. */
  def shallowClone(spark: SparkSession, srcRoot: String,
                   dstRoot: String): Long = {
    import spark.implicits._
    val srcV = currentVersion(spark, srcRoot).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $srcRoot has no committed version to clone"))
    val src = readResolved(spark, srcRoot, srcV)
    var attempts = 0
    while (true) {
      val next = observedMax(spark, dstRoot) + 1
      require(next == 1L,
        s"shallowClone target $dstRoot already has versions — clone " +
          "into a fresh root")
      if (claimVersion(spark, dstRoot, next)) {
        // schema anchor: the v=N directory must exist for the claim /
        // observedMax protocol; the data rides by reference. The anchor
        // and recorded schema are PHYSICAL (readResolved presents
        // logical) — the referenced files only answer to physical names
        val srcMap = columnMapOf(spark, srcRoot, srcV)
        val srcPhys = toPhysical(src, srcMap)
        srcPhys.limit(0).write.mode("overwrite").parquet(s"$dstRoot/v=$next")
        val carried = fileInventory(spark, srcRoot, srcV).map(_._1)
        carried.toDF("file").coalesce(1)
          .write.mode("overwrite").parquet(s"$dstRoot/$ManifestDir/v=$next")
        writeSchema(spark, dstRoot, next, srcPhys.schema)
        // the clone inherits the source's column mapping and CHECK
        // constraints — it must read and gate like the table it mirrors
        if (srcMap.nonEmpty) writeColumnMap(spark, dstRoot, next, srcMap)
        val srcCs = checkConstraintsOf(spark, srcRoot, srcV)
        if (srcCs.nonEmpty) writeConstraintSet(spark, dstRoot, next, srcCs)
        if (statsColsOf(spark, srcRoot, srcV).nonEmpty)
          spark.read.parquet(s"$srcRoot/$StatsDir/v=$srcV").coalesce(1)
            .write.mode("overwrite").parquet(s"$dstRoot/$StatsDir/v=$next")
        // the clone references the source's files, so it must also
        // inherit their merge-on-read tombstones or deleted rows would
        // resurrect on the clone
        dvOf(spark, srcRoot, srcV).foreach(_.coalesce(1)
          .write.mode("overwrite").parquet(s"$dstRoot/$DvDir/v=$next"))
        pointerAdvance(spark, dstRoot, next)
        return next
      }
      attempts += 1
      if (attempts > 64) throw new IllegalStateException(
        s"shallowClone to $dstRoot lost the version claim 64 times")
    }
    -1L // unreachable
  }

  /** RESTORE: roll the table back to retained version `toV` as a NEW
    * commit — history moves forward only (the bad versions stay
    * readable for forensics until vacuumed), and the restore itself is
    * a METADATA-ONLY commit: the new version's manifest references
    * `toV`'s files verbatim, so restoring a 100 TB table writes a
    * schema anchor plus O(files) manifest rows, never data. Stats
    * carry from `toV`'s manifest, so data skipping survives. Runs
    * under the claim-exactly-`pointer+1` protocol like every
    * read-modify-write commit. */
  def restore(spark: SparkSession, root: String, toV: Long,
              maxRetries: Int = 16): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"snapshot table $root has no committed version to restore"))
      if (base == toV) return base
      // fails fast with the retained inventory if toV was vacuumed
      val target = readVersion(spark, root, toV)
      if (claimVersion(spark, root, base + 1)) {
        val next = base + 1
        // schema anchor: the v=N directory must exist for the
        // claim/observedMax protocol; the data rides by reference
        // (physical names — the carried files only answer to those)
        toPhysical(target, columnMapOf(spark, root, toV)).limit(0)
          .write.mode("overwrite").parquet(s"$root/v=$next")
        val carried = fileInventory(spark, root, toV).map(_._1)
        writeManifestAndStats(spark, root, next, toV, carried)
        if (pointerAdvance(spark, root, next)) return next
      } else {
        if (awaitAdvance(spark, root, base)) attempt -= 1
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"restore of $root did not win a claim in $maxRetries attempts")
  }

  /** Change feed between two retained versions (the lakehouse CDF
    * read): a keyed full-outer join of the `from` and `to` snapshots
    * classifies every key as `insert` (absent before), `delete`
    * (absent after), or `update` (present in both with any non-key
    * column changed — compared via a canonical struct so NULLs compare
    * equal); unchanged keys are dropped. Emits the post-image for
    * inserts/updates and the pre-image for deletes, tagged in
    * `_change`.
    *
    * 100 TB shape: ONE keyed shuffle joining exactly the two version
    * directories — the feed derives from committed data, needing no
    * write-path logging, and downstream incremental consumers (e.g.
    * [[graft.operators.Relational.resampleIncremental]]'s touched-user
    * refresh) read ONLY this diff instead of the full snapshot. */
  def changeFeed(spark: SparkSession, root: String, key: String,
                 fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    // Both sides presented under the NEWER version's logical names, so
    // the feed crosses a metadata-only RENAME boundary as pure renames
    // (same physical column, no spurious delete+insert): re-base the
    // older side physical → toV's map.
    val a = toLogical(
      toPhysical(readVersion(spark, root, fromV),
        columnMapOf(spark, root, fromV)),
      columnMapOf(spark, root, toV))
    val b = readVersion(spark, root, toV)
    // Align both snapshots to the UNION of their columns so the feed
    // crosses an add-column evolution boundary: a column absent on one
    // side reads as NULL there (its pre-image before the column
    // existed), and the null-safe struct compare below then classifies
    // a row as `update` only when a real value differs — an old row
    // whose new column is still NULL on both sides stays unchanged.
    // Same-name/different-type drift is still not a row change feed.
    val types = (a.schema.fields ++ b.schema.fields)
      .map(f => f.name -> f.dataType).toMap
    a.schema.fields.foreach { f =>
      require(types(f.name) == f.dataType,
        s"column ${f.name} changed type between v$fromV and v$toV — " +
          "not a row change feed")
    }
    val aCols = a.columns.toSet
    val dataCols = (a.columns ++ b.columns.filterNot(aCols.contains))
      .filterNot(_ == key).toSeq
    def aligned(df: DataFrame): Seq[org.apache.spark.sql.Column] = {
      val have = df.columns.toSet
      dataCols.map(c =>
        if (have(c)) col(c) else lit(null).cast(types(c)).as(c))
    }
    val pre = a.select(col(key).as("k"), struct(aligned(a): _*).as("pre"))
    val post = b.select(col(key).as("k"), struct(aligned(b): _*).as("post"))
    pre.join(post, Seq("k"), "full_outer")
      .withColumn("_change",
        when(col("pre").isNull, "insert")
          .when(col("post").isNull, "delete")
          // null-safe struct equality: <=> compares field-wise with
          // NULL == NULL, so an update is any real field difference
          .when(!(col("pre") <=> col("post")), "update"))
      .filter(col("_change").isNotNull)
      .select(Seq(col("k").as(key), col("_change")) ++
        dataCols.map(c =>
          when(col("_change") === "delete", col(s"pre.$c"))
            .otherwise(col(s"post.$c")).as(c)): _*)
  }

  /** The oracle-certified [[changeFeed]] venue (`of7_change_feed`):
    * two snapshot versions derived DETERMINISTICALLY from the orders
    * fixture — v1 drops keys ≡3 (mod 10) (v2's inserts), v2 drops keys
    * ≡7 (deletes) and doubles o_totalprice on keys ≡0 (updates) — so
    * the feed is a pure function of the fixture and DuckDB can replay
    * the identical full-outer diff without any snapshot machinery. */
  def changeFeedDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val v1 = o.filter(col("o_orderkey") % 10 =!= 3)
    val v2 = o.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    val root = graft.util.Scratch.dir("graft_cdf_")
    commit(v1, root)
    commit(v2, root)
    changeFeed(spark, root, "o_orderkey", fromV = 1L, toV = 2L)
      .orderBy("o_orderkey")
  }

  /** The oracle-certified [[deleteWhere]] venue (`of8_delete_where`):
    * lineitem range-laid-out on `l_orderkey` into 8 disjoint-bound
    * files, committed with stats, then a selective key-range delete of
    * `[1, floor(max/5)]`. With the range layout, ~1/5 of the files
    * overlap the range and get rewritten; the rest ride into v2 by
    * manifest reference (file-granularity is spec-pinned in
    * SnapshotSpec — this query certifies VALUES). DuckDB replays the
    * surviving rows straight off the fixture, certifying the
    * file-granular machinery is exactly a row filter: no lost rows
    * from referenced files, no survivors from rewritten ones. */
  def deleteDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    // footer probe feeds both the delete bound and the commit width
    // (r14: exact metadata, no probe job)
    val (hi, rows) = Layout.footerMaxLong(
        spark, s"$sfDir/lineitem.parquet", "l_orderkey") match {
      case Some(mx) =>
        (mx / 5, Layout.footerRowCount(spark, s"$sfDir/lineitem.parquet"))
      case None =>
        val probe = li.agg(floor(max(col("l_orderkey")) / 5),
          count(lit(1))).head()
        (probe.getLong(0), probe.getLong(1))
    }
    val root = graft.util.Scratch.dir("graft_del_")
    commitWithStats(
      li.repartitionByRange(derivedCommitFiles(rows), col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      root, Seq("l_orderkey"))
    deleteWhere(spark, root, "l_orderkey", lit(1L), lit(hi))
    readCurrent(spark, root)
      .groupBy((col("l_orderkey") % 7).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
      .orderBy("bucket")
  }

  /** The oracle-certified [[restore]] venue (`of9_restore`): commit
    * orders range-laid-out with stats, damage it with a key-range
    * delete, then roll back to v1. The restore is metadata-only (spec-
    * pinned in SnapshotSpec); this query certifies VALUES — the
    * restored table must be indistinguishable from the fixture, which
    * DuckDB replays directly. */
  def restoreDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val root = graft.util.Scratch.dir("graft_restore_")
    commitWithStats(
      o.repartitionByRange(derivedCommitFiles(
            Layout.footerRowCount(spark, s"$sfDir/orders.parquet")),
          col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      root, Seq("o_orderkey"))
    deleteWhere(spark, root, "o_orderkey", lit(1L), lit(1000L))
    restore(spark, root, 1L)
    readCurrent(spark, root)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")
  }

  /** The oracle-certified [[readCurrentPoint]] venue (`of10_point_lookup`):
    * lineitem range-laid-out on `l_orderkey` (so `l_partkey` values
    * scatter across files and min/max bounds on it are useless) with a
    * per-file bloom index on `l_partkey`, then a point lookup of the
    * smallest part key. The bloom picks the few files holding that
    * key's rows (file-skipping is spec-pinned in SnapshotSpec); this
    * query certifies VALUES — the lookup must return exactly the
    * fixture's rows for that key, which DuckDB replays directly. */
  def pointLookupDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    // one probe pass feeds both the lookup key and the commit width
    val probe = li.agg(min(col("l_partkey")), count(lit(1))).head()
    val (pk, rows) = (probe.getLong(0), probe.getLong(1))
    val root = graft.util.Scratch.dir("graft_point_")
    commitWithStats(
      li.repartitionByRange(derivedCommitFiles(rows), col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      root, Seq("l_orderkey"), bloomCols = Seq("l_partkey"))
    readCurrentPoint(spark, root, "l_partkey", pk)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"))
      .orderBy("l_partkey")
  }

  /** The oracle-certified schema-evolution venue
    * (`of12_schema_evolution`): v1 commits orders `(o_orderkey,
    * o_totalprice)` range-laid-out with stats for keys ≢3 (mod 10);
    * an [[appendCommit]] then lands the ≡3 batch WITH a new `o_flag`
    * column (`o_orderkey % 2`) — the first thing a real Delta/Iceberg
    * user does. The recorded per-version schema makes the mixed-
    * generation read explicit-schema (old files' `o_flag` reads NULL,
    * zero footer inference); DuckDB replays the union with NULL flags
    * on the old slice, certifying no row is lost or mis-flagged across
    * the boundary. Old-version reads keeping the OLD schema and the
    * change feed crossing the boundary are spec-pinned (SnapshotSpec);
    * this query certifies VALUES. */
  def schemaEvolutionDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val root = graft.util.Scratch.dir("graft_evo_")
    val keep = o.filter(col("o_orderkey") % 10 =!= 3)
    commitWithStats(
      keep.repartitionByRange(derivedCommitFiles(keep.count()),
          col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      root, Seq("o_orderkey"))
    appendCommit(
      o.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_flag", col("o_orderkey") % 2),
      root)
    readCurrent(spark, root)
      .groupBy(col("o_flag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(asc_nulls_first("o_flag"))
  }

  /** The column-mapping venue (`of18_rename_column`): commit a
    * stats-carrying orders slice, RENAME `o_totalprice` → `o_price`
    * (pure metadata — the physical files and the skipping index are
    * untouched), land an append that already speaks the NEW name, and
    * read three ways in one result: the current table under the new
    * name, version 1 under the OLD name it was committed with, and a
    * stats-pruned range read addressed by logical name. The oracle
    * replays all three slices from the fixture — a rename that
    * rewrote, dropped, or mis-aliased anything cannot hash-match. */
  def renameDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val root = graft.util.Scratch.dir("graft_rename_")
    val keep = orders.filter(col("o_orderkey") % 10 =!= 3)
    // r14: width and range cut from footer metadata — the survivor
    // count is bounded above by the base count (9/10 of it here), and
    // upper-bound sizing errs toward smaller files, the safe
    // direction; the old keep.count()/max() pair was two extra full
    // passes per venue run
    commitWithStats(
      keep.repartitionByRange(derivedCommitFiles(
            Layout.footerRowCount(spark, s"$sfDir/orders.parquet")),
          col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      root, Seq("o_orderkey"))
    renameColumn(spark, root, "o_totalprice", "o_price")
    appendCommit(
      orders.filter(col("o_orderkey") % 10 === 3)
        .withColumnRenamed("o_totalprice", "o_price"),
      root)
    val cut = Layout.footerMaxLong(spark, s"$sfDir/orders.parquet",
        "o_orderkey")
      .getOrElse(orders.agg(max(col("o_orderkey"))).head().getLong(0)) / 5
    def side(df: DataFrame, priceCol: String, label: String) =
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col(priceCol).cast("decimal(12,2)")).cast("double")
            .as("sum_price"))
        .withColumn("part", lit(label))
    side(readCurrent(spark, root), "o_price", "current")
      .unionByName(side(readVersion(spark, root, 1L),
        "o_totalprice", "v1_oldname"))
      .unionByName(side(
        readCurrentPruned(spark, root, "o_orderkey", lit(1L), lit(cut)),
        "o_price", "pruned"))
      .select("part", "o_orderstatus", "n_rows", "sum_price")
      .orderBy("part", "o_orderstatus")
  }

  /** The DROP-COLUMN venue (`of20_drop_column`): commit a
    * stats-carrying orders slice, DROP `o_totalprice` (pure metadata —
    * files and skipping index untouched), land an append WITHOUT the
    * column, certify the tombstone guard (an append reintroducing the
    * retired name is refused, counted in the result), and read three
    * ways: the current 2-column table, version 1 still showing the
    * column with its full pre-drop sum (zero data was rewritten), and
    * a stats-pruned range read. Each side carries its observed column
    * COUNT, so a drop that leaked the column into current reads — or
    * ate it from time travel — cannot hash-match. */
  def dropDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val root = graft.util.Scratch.dir("graft_drop_")
    val keep = orders.filter(col("o_orderkey") % 10 =!= 3)
    // r14: footer-derived width (upper-bound sizing — see renameDemo)
    commitWithStats(
      keep.repartitionByRange(derivedCommitFiles(
            Layout.footerRowCount(spark, s"$sfDir/orders.parquet")),
          col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      root, Seq("o_orderkey"))
    dropColumn(spark, root, "o_totalprice")
    appendCommit(
      orders.filter(col("o_orderkey") % 10 === 3).drop("o_totalprice"),
      root)
    // the guard: reintroducing the retired physical name must refuse
    val refused =
      try { appendCommit(orders.limit(1), root); 0L }
      catch { case _: IllegalArgumentException => 1L }
    val cut = Layout.footerMaxLong(spark, s"$sfDir/orders.parquet",
        "o_orderkey")
      .getOrElse(orders.agg(max(col("o_orderkey"))).head().getLong(0)) / 5
    def side(df: DataFrame, label: String) = {
      val priceAgg =
        if (df.columns.contains("o_totalprice"))
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
        else max(lit(null).cast("double"))
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), priceAgg.as("sum_price"))
        .withColumn("n_cols", lit(df.columns.length))
        .withColumn("part", lit(label))
    }
    side(readCurrent(spark, root), "current")
      .unionByName(side(readVersion(spark, root, 1L), "v1_predrop"))
      .unionByName(side(
        readCurrentPruned(spark, root, "o_orderkey", lit(1L), lit(cut)),
        "pruned"))
      .unionByName(spark.range(1).select(
        lit(null).cast("string").as("o_orderstatus"),
        lit(refused).as("n_rows"),
        lit(null).cast("double").as("sum_price"),
        lit(2).as("n_cols"), lit("refused").as("part")))
      .select("part", "o_orderstatus", "n_rows", "n_cols", "sum_price")
      .orderBy(asc("part"), asc_nulls_first("o_orderstatus"))
  }

  /** The CHECK-constraint venue (`of19_check_constraint`): commit a
    * lineitem slice, add a quantity-range constraint (validating the
    * existing data), land a good append, then certify BOTH refusal
    * paths — a batch with negated quantities dies at the commit
    * boundary with the exact violation count and the pointer parked,
    * and a constraint the existing data violates is refused without
    * burning a version. The final aggregate proves the bad batch never
    * became visible. The oracle replays every count and the surviving
    * sum from the fixture slices. */
  def checkConstraintDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
    val root = graft.util.Scratch.dir("graft_check_")
    val base = li.filter(col("l_orderkey") % 7 === 0)
    val good = li.filter(col("l_orderkey") % 7 === 1)
    // a PARTIALLY bad batch: every third line's quantity negated — the
    // rejection must count exactly those rows, not the whole batch
    val bad = li.filter(col("l_orderkey") % 7 === 2)
      .withColumn("l_quantity",
        when(col("l_linenumber") % 3 === 0, -col("l_quantity"))
          .otherwise(col("l_quantity")))
    val nBase = {
      commit(base, root)
      readCurrent(spark, root).count()
    }
    addCheckConstraint(spark, root, "qty_range",
      "l_quantity BETWEEN 1 AND 50")
    val nAfterGood = {
      appendCommit(good, root)
      readCurrent(spark, root).count()
    }
    val vBeforeBad = currentVersion(spark, root).get
    val nRejected =
      try { appendCommit(bad, root); -1L }
      catch { case v: ConstraintViolation => v.nViolations }
    val badAppendHeld =
      if (currentVersion(spark, root).get == vBeforeBad) 1L else 0L
    val nRefused =
      try {
        addCheckConstraint(spark, root, "price_low",
          "l_extendedprice < 0"); -1L
      } catch { case v: ConstraintViolation => v.nViolations }
    val sumQty = readCurrent(spark, root)
      .agg(sum(col("l_quantity").cast("decimal(12,2)")))
      .head().getDecimal(0).longValue()
    val nActive =
      checkConstraintsOf(spark, root, currentVersion(spark, root).get).size
    Seq(
      ("s1_base_commit", "committed", nBase),
      ("s2_add_qty_check", "active_constraints", nActive.toLong),
      ("s3_good_append", "committed", nAfterGood),
      ("s4_bad_append", "rejected_rows", nRejected),
      ("s5_bad_append_held", "pointer_unmoved", badAppendHeld),
      ("s6_bad_constraint", "refused_rows", nRefused),
      ("s7_final", "sum_qty", sumQty)
    ).toDF("step", "outcome", "n").orderBy("step")
  }

  /** The [[shallowClone]] venue (`of17_shallow_clone`): clone a
    * stats-carrying orders table by reference, DELETE a key band on
    * the CLONE (file-granular — only stats-overlapping files rewrite
    * under the clone's root; the rest keep riding the source's files
    * cross-root), and certify both sides: the clone shows the delete,
    * the source must be byte-indistinguishable from the fixture. The
    * oracle replays the two sides as a UNION of a plain aggregate and
    * a NOT-BETWEEN aggregate. */
  def cloneDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val base = graft.util.Scratch.dir("graft_clone_")
    val src = s"$base/src"
    val dst = s"$base/clone"
    // footer probe feeds both the delete cut and the commit width (r14)
    val (cut, rows) = Layout.footerMaxLong(
        spark, s"$sfDir/orders.parquet", "o_orderkey") match {
      case Some(mx) =>
        (mx / 6, Layout.footerRowCount(spark, s"$sfDir/orders.parquet"))
      case None =>
        val probe = orders.agg(max(col("o_orderkey")), count(lit(1))).head()
        (probe.getLong(0) / 6, probe.getLong(1))
    }
    commitWithStats(
      orders.repartitionByRange(derivedCommitFiles(rows),
          col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      src, Seq("o_orderkey"))
    shallowClone(spark, src, dst)
    deleteWhere(spark, dst, "o_orderkey", lit(1L), lit(cut))
    def side(root: String, label: String) =
      readCurrent(spark, root)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
            .as("sum_price"))
        .withColumn("side", lit(label))
    side(src, "source").unionByName(side(dst, "clone"))
      .select("side", "o_orderstatus", "n_rows", "sum_price")
      .orderBy("side", "o_orderstatus")
  }

  /** The MERGE-side schema-evolution venue (`of16_merge_evolution`):
    * a change batch that both REPRICES existing keys and CARRIES A NEW
    * COLUMN lands through [[mergeCommit]] in one commit — the
    * `unionByName(allowMissingColumns)` path records the union schema,
    * kept rows read NULL in the new column, and the next read sees one
    * evolved table. This is the everyday Delta/Iceberg motion (`MERGE
    * ... WHEN MATCHED UPDATE` after an upstream added a field); the
    * commit-side add-column venue is [[schemaEvolutionDemo]] (`of12`),
    * this one certifies the merge path end-to-end against the oracle's
    * CASE/anti-join replay. Same scale shape as any merge: one keyed
    * anti-join over the base, the change batch broadcast-sized. */
  def mergeEvolutionDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val root = graft.util.Scratch.dir("graft_mergevo_")
    commit(orders, root)
    val changes = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice",
        (col("o_totalprice").cast("decimal(12,2)") + 250).cast("double"))
      .withColumn("o_audit_src", concat(lit("merge-"), col("o_orderkey") % 3))
    mergeCommit(spark, root, changes, "o_orderkey")
    readCurrent(spark, root)
      .groupBy(col("o_audit_src"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(asc_nulls_first("o_audit_src"))
  }

  private val GenDir = "_gencol"

  /** GENERATED-COLUMN commit (the Delta `GENERATED ALWAYS AS` pruning
    * motion): materialize `genName = baseCol div bucket` at write time,
    * lay the files out by range on it, keep per-file stats on the
    * GENERATED column, and record the generation rule as versioned
    * table metadata. [[readCurrentWhereBase]] then serves predicates on
    * the BASE column by translating them through the (monotone) rule —
    * `base ∈ [lo, hi] ⇒ gen ∈ [lo div b, hi div b]` — pruning files
    * with the generated column's stats before any file is opened, and
    * keeping the exact base predicate as the residual. The point at
    * 100 TB: one coarse derived column (day-of-timestamp, key-bucket)
    * gives partition-pruning economics to range queries on a
    * high-cardinality base column whose raw min/max would make every
    * file overlap. `bucket` must be positive and the rule is applied
    * with `div` (floor for the non-negative keys it is meant for). */
  def commitGenerated(df: DataFrame, root: String, baseCol: String,
                      bucket: Long, genName: String,
                      nFiles: Int = 8): Long = {
    import org.apache.spark.sql.functions.{col, expr}
    require(bucket > 0, s"generation bucket must be positive: $bucket")
    // the sidecar is a hand-built one-line JSON parsed by a fixed
    // pattern in [[genRuleOf]]; restrict names to plain identifiers at
    // COMMIT time so no committed rule can ever contain a quote,
    // backslash, or other char the reader would mis-parse (and plain
    // identifiers are also what `expr`/`repartitionByRange` expect —
    // anything fancier would need backtick-quoting anyway)
    Seq("generated" -> genName, "base" -> baseCol).foreach { case (what, n) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"$what column name must be a plain identifier " +
          s"[A-Za-z_][A-Za-z0-9_]*, got: `$n`")
    }
    val spark = df.sparkSession
    val withG = df
      .withColumn(genName, expr(s"$baseCol div $bucket"))
      .repartitionByRange(nFiles, col(genName), col(baseCol))
      .sortWithinPartitions(genName, baseCol)
    val v = commitWithStats(withG, root, Seq(genName))
    val p = new org.apache.hadoop.fs.Path(root, s"$GenDir/v=$v.json")
    val out = fsOf(spark, p).create(p, true)
    try out.write(
      s"""{"gen":"$genName","base":"$baseCol","bucket":$bucket}"""
        .getBytes("UTF-8"))
    finally out.close()
    v
  }

  /** The generation rule in force at version `v` (nearest at or below,
    * the [[columnMapOf]] protocol): (genName, baseCol, bucket). */
  private[graft] def genRuleOf(spark: SparkSession, root: String,
                               v: Long): Option[(String, String, Long)] = {
    val dir = new org.apache.hadoop.fs.Path(root, GenDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) return None
    val vs = fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+\\.json") =>
        n.stripPrefix("v=").stripSuffix(".json").toLong }
      .filter(_ <= v)
    if (vs.isEmpty) None
    else {
      val p = new org.apache.hadoop.fs.Path(root, s"$GenDir/v=${vs.max}.json")
      val in = fs.open(p)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      val re = """\{"gen":"([^"]+)","base":"([^"]+)","bucket":(\d+)\}""".r
      json match {
        case re(g, b, k) => Some((g, b, k.toLong))
        // a sidecar EXISTS but doesn't parse → corruption or format
        // drift, never "no rule": fail loudly with the evidence
        // instead of returning None and letting the caller report the
        // misleading "table has no generated-column rule"
        case _ => throw new IllegalStateException(
          s"malformed generated-column rule sidecar $p: $json")
      }
    }
  }

  /** Range read on the BASE column of a [[commitGenerated]] table: the
    * bounds translate through the recorded monotone rule and the
    * GENERATED column's stats prune the file set; the exact base
    * predicate stays as the residual (pushed into the surviving
    * parquet scans). Base-column semantics, generated-column pruning
    * economics. */
  def readCurrentWhereBase(spark: SparkSession, root: String,
                           baseCol: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no committed version"))
    val (gen, base, bucket) = genRuleOf(spark, root, v).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no generated-column rule"))
    require(base == baseCol,
      s"generated rule on $root derives from `$base`, not `$baseCol`")
    readCurrentPruned(spark, root, gen,
        lit(Math.floorDiv(lo, bucket)), lit(Math.floorDiv(hi, bucket)))
      .filter(col(baseCol) >= lo && col(baseCol) <= hi)
  }

  /** Commit width for a demo venue writing `rows` rows: ~2M rows per
    * file, clamped to [8, 32]. The table's target-file-size policy as
    * code — a FIXED width is the sf10-soak defect class (10× the rows
    * through the same k writer tasks); deriving it from the observed
    * row count keeps write parallelism tracking data volume, and finer
    * files also prune finer on the read side. */
  private[graft] def derivedCommitFiles(rows: Long): Int =
    math.min(32L, math.max(8L, rows / 2000000L)).toInt

  /** The oracle-certified [[commitGenerated]] venue
    * (`of21_generated_column`): orders committed with a derived
    * thousand-key bucket column, then a BASE-key range query served
    * through the generated-column prune — the result must equal the
    * plain fixture filter (the generated column rides along,
    * recomputed by the oracle), and SnapshotSpec pins that the prune
    * opened a strict subset of the files. */
  def generatedDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val root = graft.util.Scratch.dir("graft_gencol_")
    // file count tracks data volume: a FIXED 8-file layout made the
    // write venue the 18.7× line of the sf10 soak — 10× the rows
    // through the same 8 writers (see [[derivedCommitFiles]]).
    // r14: both probes from footer metadata (exact; no sizing jobs)
    val rows = Layout.footerRowCount(spark, s"$sfDir/orders.parquet")
    val nF = derivedCommitFiles(rows)
    commitGenerated(orders, root, "o_orderkey", 1000L, "ok_bucket",
      nFiles = nF)
    val mx = Layout.footerMaxLong(spark, s"$sfDir/orders.parquet",
        "o_orderkey")
      .getOrElse(orders.agg(max("o_orderkey")).head().getLong(0))
    readCurrentWhereBase(spark, root, "o_orderkey", mx / 4, mx / 2)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
        countDistinct(col("ok_bucket")).as("n_buckets"))
      .orderBy("o_orderstatus")
  }

  /** The oracle-certified [[commitClustered]] venue
    * (`of13_zorder_commit`): lineitem laid on the Morton curve of
    * (l_partkey, l_suppkey) with min/max stats on both, then a 2-D box
    * read through [[readCurrentPrunedBox]] — the dimensions a
    * single-column sort cannot serve together. File skipping on the
    * intersection is spec-pinned (SnapshotSpec: the box prune opens
    * strictly fewer files than either 1-D prune on a linear layout);
    * this query certifies VALUES — the box read must return exactly
    * the fixture's rows inside the box, which DuckDB replays as a
    * plain double-range filter. */
  def clusteredDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))
    // footer probe feeds the box bounds, the commit width AND the
    // z-order interleave width (r14: zorderCluster's own bits
    // derivation would re-aggregate the maxima — one more full pass;
    // the footer maxima are the same exact values)
    val liDir = s"$sfDir/lineitem.parquet"
    val (pMax, sMax, rows) = (
      Layout.footerMaxLong(spark, liDir, "l_partkey"),
      Layout.footerMaxLong(spark, liDir, "l_suppkey")) match {
      case (Some(p), Some(s)) => (p, s, Layout.footerRowCount(spark, liDir))
      case _ =>
        val m = li.agg(max(col("l_partkey")), max(col("l_suppkey")),
          count(lit(1))).head()
        (m.getLong(0), m.getLong(1), m.getLong(2))
    }
    val zbits = math.min(31, math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(pMax, sMax)))).toInt
    val root = graft.util.Scratch.dir("graft_zorder_")
    commitClustered(li, root, "l_partkey", "l_suppkey",
      derivedCommitFiles(rows), bits = zbits)
    readCurrentPrunedBox(spark, root,
        "l_partkey", lit(pMax / 4), lit(pMax / 2),
        "l_suppkey", lit(sMax / 4), lit(sMax / 2))
      .groupBy((col("l_suppkey") % 5).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"),
        min(col("l_partkey")).as("min_part"),
        max(col("l_partkey")).as("max_part"))
      .orderBy("bucket")
  }

  /** The oracle-certified [[vacuum]] venue (`of14_vacuum`): commit
    * lineitem range-laid-out (v1), carve a key range out with
    * [[deleteWhere]] (v2 — a manifest version still REFERENCING v1's
    * carried files), collapse the chain with [[compact]] (v3,
    * self-contained), then vacuum with the default one-version
    * retention — v1 and v2 are now unreferenced and their data, stats,
    * and manifest artifacts are reclaimed. The reclamation itself
    * (directories gone, live version untouched, referenced ancestors
    * surviving while the chain exists) is spec-pinned in SnapshotSpec;
    * this query certifies VALUES — the post-GC table must still read
    * exactly the delete's survivors, which DuckDB replays as a NOT
    * BETWEEN filter. */
  def vacuumDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    // footer probe feeds both the delete bound and the commit width
    // (r14: exact metadata, no probe job)
    val (hi, rows) = Layout.footerMaxLong(
        spark, s"$sfDir/lineitem.parquet", "l_orderkey") match {
      case Some(mx) =>
        (mx / 5, Layout.footerRowCount(spark, s"$sfDir/lineitem.parquet"))
      case None =>
        val probe = li.agg(floor(max(col("l_orderkey")) / 5),
          count(lit(1))).head()
        (probe.getLong(0), probe.getLong(1))
    }
    val root = graft.util.Scratch.dir("graft_vacuum_")
    commitWithStats(
      li.repartitionByRange(derivedCommitFiles(rows), col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      root, Seq("l_orderkey"))
    deleteWhere(spark, root, "l_orderkey", lit(1L), lit(hi))
    compact(spark, root) // width from the referenced bytes
    vacuum(spark, root)
    readCurrent(spark, root)
      .groupBy((col("l_orderkey") % 9).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double")
          .as("sum_price"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
      .orderBy("bucket")
  }

  /** The oracle-certified [[readAsOf]] venue (`of15_time_travel`):
    * commit orders (v1), damage it with a key-range delete (v2), then
    * read the table AS OF an instant strictly between the two commit
    * timestamps and AS OF the second commit's own timestamp — Delta's
    * `TIMESTAMP AS OF` on both sides of a change. The probe instant is
    * the midpoint of the two recorded markers, deterministic because
    * marker timestamps are strictly increasing (enforced under the
    * pointer lock). DuckDB replays the 'before' slice as the plain
    * fixture and the 'current' slice as the delete's survivors. */
  def timeTravelDemo(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    // footer probe feeds both the delete bound and the commit width
    // (r14: exact metadata, no probe job)
    val (hi, rows) = Layout.footerMaxLong(
        spark, s"$sfDir/orders.parquet", "o_orderkey") match {
      case Some(mx) =>
        (mx / 3, Layout.footerRowCount(spark, s"$sfDir/orders.parquet"))
      case None =>
        val probe = o.agg(floor(max(col("o_orderkey")) / 3),
          count(lit(1))).head()
        (probe.getLong(0), probe.getLong(1))
    }
    val root = graft.util.Scratch.dir("graft_asof_")
    commitWithStats(
      o.repartitionByRange(derivedCommitFiles(rows), col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      root, Seq("o_orderkey"))
    deleteWhere(spark, root, "o_orderkey", lit(1L), lit(hi))
    val h = commitHistory(spark, root).toMap
    def slice(tsMillis: Long, tag: String): DataFrame =
      readAsOf(spark, root, tsMillis)
        .groupBy(lit(tag).as("snap"), (col("o_orderkey") % 11).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(14,2)")).cast("double")
            .as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
    slice((h(1L) + h(2L)) / 2, "before")
      .unionAll(slice(h(2L), "current"))
      .orderBy("snap", "bucket")
  }

  /** Orphan GC: delete unreferenced `v=*` snapshot directories (old
    * superseded versions beyond the `retain` newest — the time-travel
    * window — AND crashed writers' never-pointed orphans) plus decided
    * claims (≤ pointer). The pointer
    * and its target are never touched. Claims ABOVE the pointer are
    * kept by default — they may be a live writer's in-flight commit —
    * and so are THEIR data directories (the writer's pointer swap must
    * not publish a deleted path); `clearStaleClaims = true` removes
    * both (admin asserts no live writers; unblocks merges stalled on a
    * crashed writer's `pointer+1` claim). Deleting a DECIDED claim is
    * safe even against a delayed writer still racing for that version:
    * [[claimVersion]] refuses any version whose data directory exists
    * or that the pointer has reached, so a vacuumed claim number can
    * never be re-won for committed content. Like any GC, vacuum
    * assumes no reader is still walking an unreferenced snapshot's
    * files. Returns deleted names. */
  def vacuum(spark: SparkSession, root: String,
             clearStaleClaims: Boolean = false,
             retain: Int = 1): Seq[String] = {
    require(retain >= 1, "retain must keep at least the live version")
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"snapshot table $root has no committed version; nothing to vacuum"))
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, rootPath)
    val claims = new org.apache.hadoop.fs.Path(root, ClaimsDir)
    // A claim above the pointer may be a LIVE writer mid-commit: its
    // fully-written-but-not-yet-pointed v=N directory must survive the
    // sweep, or the writer's imminent pointer swap would publish a
    // deleted directory. clearStaleClaims (admin asserts no live
    // writers) sweeps both the claim and its data directory.
    val inFlight: Set[Long] =
      if (clearStaleClaims || !fs.exists(claims)) Set.empty
      else fs.listStatus(claims).toSeq.map(_.getPath.getName)
        .collect { case n if n.matches("\\d+") => n.toLong }
        .filter(_ > cur).toSet
    val onDisk = fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("v=\\d+") => n.drop(2).toLong }
    // Retention window for time travel: the newest `retain` committed
    // versions (the pointer target always among them) stay readable
    // via [[readVersion]].
    val retained = onDisk.filter(_ <= cur).sorted.takeRight(retain).toSet
    // A surviving version with a file MANIFEST ([[deleteWhere]]) may
    // reference files living in OLDER version directories: those
    // directories must outlive their own retention or the survivor
    // dangles. (An in-flight delete between claim and manifest write
    // is invisible here — the same "no reader mid-walk" caveat as the
    // rest of vacuum; [[compact]] collapses chains when reclamation
    // matters more than rewrite cost.)
    val referenced: Set[Long] = {
      val mRoot = new org.apache.hadoop.fs.Path(root, ManifestDir)
      if (!fs.exists(mRoot)) Set.empty
      else fs.listStatus(mRoot).toSeq.map(_.getPath)
        .filter { p =>
          p.getName.matches("v=\\d+") && {
            val v = p.getName.drop(2).toLong
            retained.contains(v) || inFlight.contains(v)
          }
        }
        .flatMap(p => spark.read.parquet(p.toString)
          .select("file").collect().map(_.getString(0)))
        .flatMap(f => "v=(\\d+)/".r.findAllMatchIn(f).toSeq.lastOption
          .map(_.group(1).toLong))
        .toSet
    }
    val deadDirs = fs.listStatus(rootPath).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.matches("v=\\d+") && {
          val v = n.drop(2).toLong
          !retained.contains(v) && !inFlight.contains(v) &&
            !referenced.contains(v)
        }
      }
    val deadClaims =
      if (!fs.exists(claims)) Seq.empty
      else fs.listStatus(claims).toSeq.map(_.getPath).filter { p =>
        p.getName match {
          case n if n.matches("\\d+") =>
            n.toLong <= cur || clearStaleClaims
          case _ => true // abandoned .tmp claim staging
        }
      }
    // stats manifests follow their data directory's fate
    val statsRoot = new org.apache.hadoop.fs.Path(root, StatsDir)
    val deadStats =
      if (!fs.exists(statsRoot)) Seq.empty
      else fs.listStatus(statsRoot).toSeq.map(_.getPath).filter { p =>
        p.getName match {
          case n if n.matches("v=\\d+") =>
            val v = n.drop(2).toLong
            !retained.contains(v) && !inFlight.contains(v)
          case _ => true
        }
      }
    // file manifests follow their data directory's fate
    val manifestRoot = new org.apache.hadoop.fs.Path(root, ManifestDir)
    val deadManifests =
      if (!fs.exists(manifestRoot)) Seq.empty
      else fs.listStatus(manifestRoot).toSeq.map(_.getPath).filter { p =>
        p.getName match {
          case n if n.matches("v=\\d+") =>
            val v = n.drop(2).toLong
            !retained.contains(v) && !inFlight.contains(v)
          case _ => true
        }
      }
    // schema records follow their data directory's fate
    val schemaRoot = new org.apache.hadoop.fs.Path(root, SchemaDir)
    val deadSchemas =
      if (!fs.exists(schemaRoot)) Seq.empty
      else fs.listStatus(schemaRoot).toSeq.map(_.getPath).filter { p =>
        p.getName match {
          case n if n.matches("v=\\d+\\.json") =>
            val v = n.stripPrefix("v=").stripSuffix(".json").toLong
            !retained.contains(v) && !inFlight.contains(v)
          case _ => true
        }
      }
    // deletion vectors follow their data directory's fate
    val dvRoot = new org.apache.hadoop.fs.Path(root, DvDir)
    val deadDvs =
      if (!fs.exists(dvRoot)) Seq.empty
      else fs.listStatus(dvRoot).toSeq.map(_.getPath).filter { p =>
        p.getName match {
          case n if n.matches("v=\\d+") =>
            val v = n.drop(2).toLong
            !retained.contains(v) && !inFlight.contains(v)
          case _ => true
        }
      }
    (deadDirs ++ deadClaims).map { p =>
      fs.delete(p, true); p.getName
    } ++ deadStats.map { p => // disambiguate from the data dir's "v=N"
      fs.delete(p, true); s"$StatsDir/${p.getName}"
    } ++ deadManifests.map { p =>
      fs.delete(p, true); s"$ManifestDir/${p.getName}"
    } ++ deadSchemas.map { p =>
      fs.delete(p, true); s"$SchemaDir/${p.getName}"
    } ++ deadDvs.map { p =>
      fs.delete(p, true); s"$DvDir/${p.getName}"
    }
  }

  /** Write a snapshot directory WITHOUT swapping the pointer — the
    * "crashed after data write, before commit" state, exposed so the
    * spec can construct it deterministically. */
  private[graft] def writeOrphan(df: DataFrame, root: String,
                                 v: Long): Unit =
    df.write.mode("overwrite").parquet(s"$root/v=$v")
}
