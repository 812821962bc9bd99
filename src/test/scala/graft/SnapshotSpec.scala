package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** Crash anatomy of the snapshot-commit protocol: readers must never
  * observe a half-merge, whichever step a writer dies at. */
class SnapshotSpec extends SparkSuite {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_").toString

  private def rows(root: String): Set[(Long, String)] =
    Snapshot.readCurrent(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("commit then merge: readers follow the pointer through versions") {
    import spark.implicits._
    val root = freshTable()
    val v1 = Snapshot.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    assert(v1 == 1L && Snapshot.currentVersion(spark, root).contains(1L))
    assert(rows(root) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    val v2 = Snapshot.mergeCommit(spark, root,
      Seq((2L, "B"), (9L, "i")).toDF("k", "v"), "k")
    assert(v2 == 2L)
    assert(rows(root) == Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i")))
  }

  test("change feed recovers exactly the merge's insert/update/delete classification") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v"), root)
    // merge: update k=2, insert k=9, and delete k=4 by committing the
    // post-merge state minus that key (full commit = upsert+delete mix)
    val merged = Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i"))
      .toDF("k", "v")
    Snapshot.commit(merged, root)
    val feed = Snapshot.changeFeed(spark, root, "k", fromV = 1L, toV = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(feed == Set(
      (2L, "update", "B"),   // post-image
      (9L, "insert", "i"),
      (4L, "delete", "d")),  // pre-image
      s"unexpected feed: $feed")
    // unchanged keys (1, 3) must NOT appear — the feed is the diff,
    // not the snapshot
  }

  test("a crash before the pointer swap leaves readers on the old snapshot") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    // the crashed merge under the claim protocol: claim won, v=2 fully
    // written, writer died before the pointer swap
    assert(Snapshot.claimVersion(spark, root, 2L))
    Snapshot.writeOrphan(
      Seq((1L, "HALF"), (2L, "MERGE")).toDF("k", "v"), root, 2L)
    assert(Snapshot.currentVersion(spark, root).contains(1L))
    assert(rows(root) == Set((1L, "a"), (2L, "b")),
      "reader saw a committed-but-unreferenced snapshot")
    // a blind commit recovers immediately: it claims a strictly higher
    // version, never re-pointing at the orphan's name while it exists
    val v = Snapshot.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    assert(v == 3L, s"recovered commit reused orphan version: $v")
    // the blind recovery moved the head past the dead claim, so merges
    // flow again (they claim pointer+1 = 4); vacuum then clears the
    // orphan dir and the decided claims
    Snapshot.vacuum(spark, root, clearStaleClaims = true)
    val v2 = Snapshot.mergeCommit(spark, root,
      Seq((2L, "B")).toDF("k", "v"), "k")
    assert(v2 == 4L)
    assert(rows(root) == Set((1L, "a"), (2L, "B")))
  }

  test("the pointer swap is replace-not-append (no stale trailing bytes)") {
    import spark.implicits._
    val root = freshTable()
    // a 2-digit version followed by a 1-digit one would corrupt a
    // pointer updated in place; the rename-over swap replaces wholesale
    (1 to 11).foreach { i =>
      Snapshot.commit(Seq((i.toLong, s"r$i")).toDF("k", "v"), root)
    }
    assert(Snapshot.currentVersion(spark, root).contains(11L))
    Snapshot.setPointer(spark, root, 9L)
    assert(Snapshot.currentVersion(spark, root).contains(9L))
    assert(rows(root) == Set((9L, "r9")))
  }

  test("racing merge commits serialize: one claim winner, loser retries, no lost update") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    // two concurrent read-modify-write committers with DISJOINT changes:
    // under the old protocol both compute next=2 and the second silently
    // overwrites the first's data dir and pointer; under the claim
    // protocol exactly one wins v2, the other observes the conflict,
    // re-reads, and commits v3 ON TOP of the winner's merge.
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(Seq((2L, "X")), Seq((9L, "Y"))).map { change =>
      new Thread(() =>
        try results.add(
          Snapshot.mergeCommit(spark, root, change.toDF("k", "v"), "k"))
        catch { case t: Throwable => errs.add(t) })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"merge commit failed: ${errs.peek()}")
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSet == Set(2L, 3L),
      s"expected serialized versions 2 and 3, got ${results.asScala.toSeq}")
    assert(Snapshot.currentVersion(spark, root).contains(3L))
    // BOTH changes present — the retry recomputed on the winner's head
    assert(rows(root) == Set((1L, "a"), (2L, "X"), (3L, "c"), (9L, "Y")))
    // and the intermediate v2 holds exactly one of the two changes
    val v2 = spark.read.parquet(s"$root/v=2").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v2 == Set((1L, "a"), (2L, "X"), (3L, "c"))
      || v2 == Set((1L, "a"), (2L, "b"), (3L, "c"), (9L, "Y")))
  }

  test("a held claim blocks its version: blind commits skip it, vacuum recovers it") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate an in-flight/crashed writer holding v2
    assert(Snapshot.claimVersion(spark, root, 2L))
    assert(!Snapshot.claimVersion(spark, root, 2L), "claim must be exclusive")
    // a blind commit never reuses the claimed name — it goes above it
    val v = Snapshot.commit(Seq((1L, "b")).toDF("k", "v"), root)
    assert(v == 3L, s"blind commit must skip the held claim, got $v")
    assert(rows(root) == Set((1L, "b")))
    // a merge against head 3 claims 4 — unaffected by the stale v2 claim
    assert(Snapshot.mergeCommit(spark, root,
      Seq((5L, "e")).toDF("k", "v"), "k") == 4L)
    // admin recovery: clearStaleClaims drops the dead claim; the pointer
    // target survives and the table keeps working
    val deleted = Snapshot.vacuum(spark, root, clearStaleClaims = true)
    assert(deleted.contains("2"), s"stale claim not vacuumed: $deleted")
    assert(rows(root) == Set((1L, "b"), (5L, "e")))
  }

  test("vacuum deletes unreferenced snapshots and decided claims, never the live one") {
    import spark.implicits._
    val root = freshTable()
    (1 to 3).foreach { i =>
      Snapshot.commit(Seq((i.toLong, s"r$i")).toDF("k", "v"), root)
    }
    // a crashed writer's orphan above the pointer is garbage too
    Snapshot.writeOrphan(Seq((99L, "orphan")).toDF("k", "v"), root, 5L)
    val before = rows(root)
    val deleted = Snapshot.vacuum(spark, root)
    assert(deleted.toSet.intersect(Set("v=1", "v=2", "v=5")) == Set("v=1", "v=2", "v=5"),
      s"expected old + orphan dirs deleted, got $deleted")
    assert(!deleted.contains("v=3"), "vacuum must leave the pointer target")
    assert(Snapshot.currentVersion(spark, root).contains(3L))
    assert(rows(root) == before, "live snapshot must survive vacuum intact")
    // version numbers are not reused after GC
    assert(Snapshot.commit(Seq((7L, "g")).toDF("k", "v"), root) == 4L)
  }

  test("a vacuumed decided claim cannot be re-won (no committed-version reuse)") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshot.commit(Seq((2L, "b")).toDF("k", "v"), root)
    // vacuum removes the decided claim files for v1 and v2
    Snapshot.vacuum(spark, root)
    // a delayed writer racing for an already-committed version must be
    // refused even though the claim FILE is gone: v=2 is the live
    // pointer target, v=1 is decided by pointer position
    assert(!Snapshot.claimVersion(spark, root, 2L),
      "reclaimed the live version — would overwrite committed data")
    assert(!Snapshot.claimVersion(spark, root, 1L),
      "reclaimed a superseded version below the pointer")
    assert(rows(root) == Set((2L, "b")))
    // fresh versions are still claimable
    assert(Snapshot.claimVersion(spark, root, 3L))
  }

  test("vacuum spares an in-flight writer's fully-written data directory") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // a live writer mid-commit: claim held, v=2 written, pointer not yet
    // swapped — default vacuum must not delete the directory its
    // imminent pointer swap will publish
    assert(Snapshot.claimVersion(spark, root, 2L))
    Snapshot.writeOrphan(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root, 2L)
    val deleted = Snapshot.vacuum(spark, root)
    assert(!deleted.contains("v=2"),
      s"vacuum deleted an in-flight writer's data dir: $deleted")
    assert(!deleted.contains("2"), "vacuum deleted a live claim")
    // admin recovery sweeps both the stale claim and its directory
    val swept = Snapshot.vacuum(spark, root, clearStaleClaims = true)
    assert(swept.contains("v=2") && swept.contains("2"), s"got $swept")
    assert(rows(root) == Set((1L, "a")))
  }

  test("a stale pointer lock is broken by lease age, not waited on forever") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // a dead writer's abandoned _ptrlock, older than the lease
    val lock = new org.apache.hadoop.fs.Path(root, "_ptrlock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lock, true)
    try out.write("9\n".getBytes("UTF-8")) finally out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 120000L, -1L)
    // the next commit must break the lease and land, not hang
    assert(Snapshot.commit(Seq((2L, "b")).toDF("k", "v"), root) == 2L)
    assert(rows(root) == Set((2L, "b")))
    assert(!fs.exists(lock), "lock must be released after the swap")
  }

  test("compaction rewrites files without changing content, under the claim protocol") {
    import spark.implicits._
    val root = freshTable()
    // an incrementally-ingested table: several small merge batches,
    // each leaving its own files
    Snapshot.commit(Seq((1L, "a")).toDF("k", "v").repartition(4), root)
    (2 to 4).foreach { i =>
      Snapshot.mergeCommit(spark, root,
        Seq((i.toLong, s"r$i")).toDF("k", "v").repartition(3), "k")
    }
    val before = rows(root)
    def fileCount(v: Long): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$root/v=$v")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    assert(fileCount(4L) > 1, "precondition: fragmented current version")
    val v = Snapshot.compact(spark, root, numFiles = 1)
    assert(v == 5L && Snapshot.currentVersion(spark, root).contains(5L))
    assert(fileCount(5L) == 1, "compaction must coalesce the files")
    assert(rows(root) == before, "compaction must not change content")
    // the default (DerivedWidth) rewrite width is the target-file-size
    // policy as code: bytes/128MB ceiling, clamped to
    // [1, shuffle.partitions] — a fixture-scale table derives 1 file,
    // a 10-GB referenced set derives 80 writers (or the cap if lower)
    assert(Snapshot.compactWidthFor(0L, 32) == 1)
    assert(Snapshot.compactWidthFor(128L * 1024 * 1024, 32) == 1)
    assert(Snapshot.compactWidthFor(128L * 1024 * 1024 + 1, 32) == 2)
    assert(Snapshot.compactWidthFor(10L << 30, 200) == 80)
    assert(Snapshot.compactWidthFor(10L << 30, 32) == 32,
      "width must clamp to the session's shuffle parallelism")
    val dv = Snapshot.compact(spark, root)
    assert(fileCount(dv) == 1,
      "fixture-scale derived width must stay single-file")
    assert(rows(root) == before)
  }

  test("time travel: retained versions stay readable, vacuumed ones fail fast") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshot.mergeCommit(spark, root, Seq((2L, "b")).toDF("k", "v"), "k")
    Snapshot.mergeCommit(spark, root, Seq((1L, "A")).toDF("k", "v"), "k")
    def at(v: Long): Set[(Long, String)] =
      Snapshot.readVersion(spark, root, v).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at(1L) == Set((1L, "a")))
    assert(at(2L) == Set((1L, "a"), (2L, "b")))
    assert(at(3L) == Set((1L, "A"), (2L, "b")))
    // keep a 2-version time-travel window: v1 goes, v2 and v3 stay
    val deleted = Snapshot.vacuum(spark, root, retain = 2)
    assert(deleted.contains("v=1") && !deleted.contains("v=2"),
      s"retain=2 must keep the two newest versions, deleted $deleted")
    assert(at(2L) == Set((1L, "a"), (2L, "b")), "retained version readable")
    val e = intercept[java.util.NoSuchElementException](at(1L))
    assert(e.getMessage.contains("retained: v=2, v=3"), e.getMessage)
  }

  test("stats manifest prunes files by range, never changes results, and vacuums with its version") {
    import spark.implicits._
    val root = freshTable()
    // 0..799 range-laid-out over 8 files: each file covers a ~100-key band
    val df = spark.range(0, 800).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    // one manifest row per data file
    val nFiles = spark.read.parquet(s"$root/v=1")
      .select(input_file_name()).distinct().count()
    val manifest = spark.read.parquet(s"$root/_stats/v=1").collect()
    assert(manifest.length == nFiles)
    assert(manifest.map(r => r.getAs[Long]("n_rows")).sum == 800L)
    // a narrow range touches a strict subset of files...
    val sel = Snapshot.prunedFiles(spark, root, 1L, "k", lit(100L), lit(150L))
    assert(sel.nonEmpty && sel.length < nFiles,
      s"expected pruning: ${sel.length} of $nFiles files")
    // ...and the pruned read equals the logical filter exactly
    val pruned = Snapshot.readCurrentPruned(spark, root, "k",
      lit(100L), lit(150L)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Snapshot.readCurrent(spark, root)
      .filter(col("k") >= 100L && col("k") <= 150L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == full && pruned.size == 51)
    // a range beyond every file bound: empty result, correct schema
    val none = Snapshot.readCurrentPruned(spark, root, "k",
      lit(5000L), lit(6000L))
    assert(none.count() == 0L && none.columns.toSeq == Seq("k", "v"))
    // a stats-less table falls back to the plain filtered scan
    val plain = freshTable()
    Snapshot.commit(df, plain)
    assert(Snapshot.readCurrentPruned(spark, plain, "k",
      lit(100L), lit(150L)).count() == 51L)
    // superseding commit + vacuum sweeps the old version's manifest too
    Snapshot.commitWithStats(df.filter(col("k") < 100), root, Seq("k"))
    val deleted = Snapshot.vacuum(spark, root)
    assert(deleted.contains("v=1"))
    val statsLeft = new java.io.File(s"$root/_stats").list().toSeq
    assert(statsLeft == Seq("v=2"), s"stale manifests: $statsLeft")
    // the surviving version still prunes
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(0L), lit(10L)).count() == 11L)
    // maintenance must not kill the data-skipping index: compaction and
    // merge both re-derive the manifest for the version they write
    val cv = Snapshot.compact(spark, root, numFiles = 4)
    assert(new java.io.File(s"$root/_stats/v=$cv").exists(),
      "compact dropped the stats manifest")
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(0L), lit(10L)).count() == 11L)
    Snapshot.mergeCommit(spark, root, Seq((5L, 99L)).toDF("k", "v"), "k")
    val mv = Snapshot.currentVersion(spark, root).get
    assert(new java.io.File(s"$root/_stats/v=$mv").exists(),
      "mergeCommit dropped the stats manifest")
    val after = Snapshot.readCurrentPruned(spark, root, "k",
      lit(5L), lit(5L)).collect()
    assert(after.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 99L)))
  }

  test("deleteWhere rewrites only overlapping files; the rest ride by reference") {
    import spark.implicits._
    val root = freshTable()
    // 0..799 range-laid-out over 8 files: each file covers a ~100-key band
    val df = spark.range(0, 800).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    val v1Files = spark.read.parquet(s"$root/v=1")
      .select(input_file_name()).distinct().count()
    // delete one ~1.5-file band
    val dv = Snapshot.deleteWhere(spark, root, "k", lit(100L), lit(150L))
    assert(dv == 2L)
    // values: exactly the logical filter
    val kept = Snapshot.readCurrent(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (0L until 800L).filterNot(k => k >= 100L && k <= 150L)
      .map(k => (k, k % 7)).toSet
    assert(kept == expect)
    // file granularity: most v1 files are REFERENCED, not rewritten
    val mf = Snapshot.manifestFiles(spark, root, 2L).get
    val referenced = mf.count(_.contains("/v=1/"))
    val rewritten = mf.count(_.contains("/v=2/"))
    assert(referenced > 0 && referenced >= v1Files - 2,
      s"expected ~all-but-overlapping files referenced: " +
        s"$referenced of $v1Files referenced, $rewritten rewritten")
    assert(rewritten <= 2, s"delete rewrote $rewritten files")
    // time travel: the pre-delete version is intact
    assert(Snapshot.readVersion(spark, root, 1L).count() == 800L)
    // data skipping survives: carried + fresh stats still prune
    val pruned = Snapshot.readCurrentPruned(spark, root, "k",
      lit(200L), lit(210L)).collect().map(_.getLong(0)).toSet
    assert(pruned == (200L to 210L).toSet)
    // and a pruned read over the DELETED band is empty
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(110L), lit(140L)).count() == 0L)
    // the change feed sees the delete as row deletes
    val feed = Snapshot.changeFeed(spark, root, "k", 1L, 2L).collect()
    assert(feed.length == 51 &&
      feed.forall(_.getAs[String]("_change") == "delete"))
    // vacuum(retain=1) must SPARE v=1: the live manifest references it
    val swept = Snapshot.vacuum(spark, root)
    assert(!swept.contains("v=1"),
      s"vacuum deleted a referenced version dir: $swept")
    assert(kept == Snapshot.readCurrent(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // compaction collapses the reference chain; then vacuum reclaims v1
    val cv = Snapshot.compact(spark, root, numFiles = 4)
    val swept2 = Snapshot.vacuum(spark, root)
    assert(swept2.contains("v=1") && swept2.contains("v=2"),
      s"expected v1/v2 reclaimed after compaction: $swept2")
    assert(Snapshot.readCurrent(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == kept)
    assert(Snapshot.currentVersion(spark, root).contains(cv))
    // delete-everything edge: schema survives an empty table
    val all = Snapshot.deleteWhere(spark, root, "k", lit(0L), lit(10000L))
    val empty = Snapshot.readCurrent(spark, root)
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("k", "v"))
    // a no-overlap delete is a metadata-only commit, still readable
    Snapshot.deleteWhere(spark, root, "k", lit(90000L), lit(99999L))
    assert(Snapshot.readCurrent(spark, root).count() == 0L)
    assert(Snapshot.currentVersion(spark, root).contains(all + 1))
  }

  test("mergeCommit rewrites only key-overlapping files; the rest ride by reference") {
    import spark.implicits._
    val root = freshTable()
    // 0..799 range-laid-out over 8 files: each file covers a ~100-key band
    val df = spark.range(0, 800).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    val v1Files = spark.read.parquet(s"$root/v=1")
      .select(input_file_name()).distinct().count()
    // change batch: update one ~half-file band + insert keys beyond
    // every file's range
    val changes = ((100L to 150L).map(k => (k, 1000L + k)) ++
      (10000L until 10005L).map(k => (k, -k))).toDF("k", "v")
    val mv = Snapshot.mergeCommit(spark, root, changes, "k")
    assert(mv == 2L)
    // values: exactly the logical upsert
    val got = Snapshot.readCurrent(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = ((0L until 800L).filterNot(k => k >= 100L && k <= 150L)
      .map(k => (k, k % 7)) ++ (100L to 150L).map(k => (k, 1000L + k)) ++
      (10000L until 10005L).map(k => (k, -k))).toSet
    assert(got == expect)
    // file granularity: the band lives in at most 2 of the 8 files —
    // everything else is REFERENCED into v=2, not rewritten
    val mf = Snapshot.manifestFiles(spark, root, 2L).get
    val referenced = mf.count(_.contains("/v=1/"))
    assert(referenced >= v1Files - 2,
      s"expected ~all-but-overlapping files referenced: " +
        s"$referenced of $v1Files")
    // insert-only merge (keys beyond every bound): ZERO files rewritten —
    // the merge degenerates to an append, v=2's files all carried
    val v2Inventory = mf.toSet
    val iv = Snapshot.mergeCommit(spark, root,
      (20000L until 20010L).map(k => (k, k)).toDF("k", "v"), "k")
    val mf3 = Snapshot.manifestFiles(spark, root, iv).get
    assert(v2Inventory.subsetOf(mf3.toSet),
      "insert-only merge rewrote carried files")
    assert(Snapshot.readCurrent(spark, root).count() == 800L + 5 + 10)
    // data skipping survives the manifest merge: pruned point read
    // sees the merged value through carried + fresh stats
    val after = Snapshot.readCurrentPruned(spark, root, "k",
      lit(120L), lit(120L)).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(after.toSeq == Seq((120L, 1120L)))
    // time travel: the pre-merge version is intact
    assert(Snapshot.readVersion(spark, root, 1L).count() == 800L)
    // change feed across the pruned merge: updates + inserts only
    val feed = Snapshot.changeFeed(spark, root, "k", 1L, 2L).collect()
    assert(feed.length == 51 + 5, s"feed rows: ${feed.length}")
    // NULL-key base rows survive any merge (never equal to a change
    // key), whether their file is touched or carried
    val nroot = freshTable()
    val ndf = Seq((Option(1L), "a"), (Option.empty[Long], "n1"),
      (Option(2L), "b")).toDF("k", "v")
    Snapshot.commitWithStats(ndf.coalesce(1), nroot, Seq("k"))
    Snapshot.mergeCommit(spark, nroot, Seq((1L, "A")).toDF("k", "v"), "k")
    val nvals = Snapshot.readCurrent(spark, nroot).collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(nvals == Set((Some(1L), "A"), (None, "n1"), (Some(2L), "b")))
    // add-column evolution through the pruned path: carried files
    // surface the new column as NULL via the recorded schema
    val ev = Snapshot.mergeCommit(spark, root,
      Seq((100L, 7777L, "fresh")).toDF("k", "v", "note"), "k")
    val evolved = Snapshot.readCurrent(spark, root)
    assert(evolved.columns.toSeq == Seq("k", "v", "note"))
    val byKey = evolved.filter(col("k").isin(100L, 700L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .toSet
    assert(byKey == Set((100L, 7777L, Some("fresh")),
      (700L, 0L, None)), s"evolution rows: $byKey")
    assert(Snapshot.currentVersion(spark, root).contains(ev))
  }

  test("compactSmall bin-packs only the small files; settled files ride by reference") {
    val root = freshTable()
    // 80k rows over 8 range files (~10k rows each); three narrow
    // deletes leave three nearly-empty rewritten files beside the
    // settled full-size ones — the delete-churn shape compactSmall is for
    val df = spark.range(0, 80000).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    Snapshot.deleteWhere(spark, root, "k", lit(0L), lit(9500L))
    Snapshot.deleteWhere(spark, root, "k", lit(10000L), lit(19500L))
    Snapshot.deleteWhere(spark, root, "k", lit(20000L), lit(29500L))
    val expect = Snapshot.readCurrent(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = Snapshot.currentVersion(spark, root).get
    // threshold between the rewritten slivers and the settled files
    val inv = Snapshot.fileInventory(spark, root, base)
    val thr = inv.map(_._2).sorted.apply(inv.size / 2) // median splits them
    val smallBefore = inv.count(_._2 < thr)
    val largePaths = inv.filter(_._2 >= thr).map(_._1).toSet
    assert(smallBefore >= 2, s"venue broken: $smallBefore small files")
    val cv = Snapshot.compactSmall(spark, root, smallBytes = thr)
    assert(cv == base + 1)
    // content identical
    assert(Snapshot.readCurrent(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    // the small files merged into one; the settled files are the SAME
    // paths, by reference
    val after = Snapshot.fileInventory(spark, root, cv)
    assert(after.size == inv.size - smallBefore + 1,
      s"expected ${inv.size - smallBefore + 1} files, got ${after.size}")
    assert(largePaths.subsetOf(after.map(_._1).toSet),
      "a settled file was rewritten instead of referenced")
    // data skipping survives the pack (carried + fresh stats)
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(40000L), lit(40010L)).count() == 11L)
    // idempotent: one merged file left under the threshold is a no-op
    assert(Snapshot.compactSmall(spark, root, smallBytes = thr) == cv)
    assert(Snapshot.currentVersion(spark, root).contains(cv))
  }

  test("restore rolls back by reference: metadata-only, history forward, skipping intact") {
    val root = freshTable()
    val df = spark.range(0, 8000).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    Snapshot.deleteWhere(spark, root, "k", lit(0L), lit(2500L))
    assert(Snapshot.readCurrent(spark, root).count() == 5499L)
    val rv = Snapshot.restore(spark, root, 1L)
    assert(rv == 3L, "restore must commit a NEW version, not rewind")
    // full content is back
    assert(Snapshot.readCurrent(spark, root).count() == 8000L)
    // metadata-only: every data-bearing file is a v=1 reference; the
    // only v=3 entry is the 0-row schema anchor
    val inv = Snapshot.fileInventory(spark, root, rv)
    val refs = inv.map(_._1).filter(_.contains("/v=1/"))
    assert(refs.size >= 4, s"expected v1 files referenced, got: $inv")
    // the damaged version stays readable for forensics
    assert(Snapshot.readVersion(spark, root, 2L).count() == 5499L)
    // the feed from damage to restore is pure re-inserts
    val feed = Snapshot.changeFeed(spark, root, "k", 2L, 3L).collect()
    assert(feed.length == 2501 &&
      feed.forall(_.getAs[String]("_change") == "insert"))
    // stats carried from the restore target still prune
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(100L), lit(110L)).count() == 11L)
    // restoring to the current version is a no-op
    assert(Snapshot.restore(spark, root, 3L) == 3L)
  }

  test("per-file bloom index skips files a range layout cannot, and survives maintenance") {
    val root = freshTable()
    // layout on a scrambled key so `v` (unique ids) scatters: every
    // file's [min_v, max_v] spans ~the whole domain — min/max skipping
    // is useless on v, membership skipping is not
    val df = spark.range(0, 8000).select(
        ((col("id") * 2654435761L) % 8000).as("k"), col("id").as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k", "v"),
      bloomCols = Seq("v"))
    val nFiles = Snapshot.fileInventory(spark, root, 1L).size
    // min/max on v touches ~every file...
    val mm = Snapshot.prunedFiles(spark, root, 1L, "v",
      lit(4242L), lit(4242L))
    assert(mm.size >= nFiles - 1,
      s"scrambled layout should defeat min/max: ${mm.size} of $nFiles")
    // ...the bloom touches ~one
    val bf = Snapshot.filesForPoint(spark, root, 1L, "v", 4242L)
    assert(bf.nonEmpty && bf.size <= 2,
      s"bloom should pick ~1 file, got ${bf.size} of $nFiles")
    val got = Snapshot.readCurrentPoint(spark, root, "v", 4242L).collect()
    assert(got.length == 1 && got.head.getLong(1) == 4242L)
    // a value outside the domain: definitively absent, empty + schema
    val none = Snapshot.readCurrentPoint(spark, root, "v", 999999L)
    assert(none.count() == 0L && none.columns.toSeq == Seq("k", "v"))
    // the index survives a file-granular delete (carried stats rows
    // keep their bloom columns) and a full compaction (re-derived)
    Snapshot.deleteWhere(spark, root, "k", lit(0L), lit(500L))
    val afterDel = Snapshot.readCurrentPoint(spark, root, "v", 4242L)
      .collect()
    assert(afterDel.length <= 1) // 4242's row survives unless its k deleted
    Snapshot.compact(spark, root, numFiles = 4)
    val afterCompact = Snapshot.readCurrentPoint(spark, root, "v", 4242L)
      .collect()
    assert(afterCompact.map(_.getLong(1)).toSeq ==
      afterDel.map(_.getLong(1)).toSeq)
  }

  test("appendCommit lands only the batch's files; stats and reads span the union") {
    val root = freshTable()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(mk(0L, 1000L), root, Seq("k"))
    val v1Files = Snapshot.fileInventory(spark, root, 1L).map(_._1).toSet
    val av = Snapshot.appendCommit(mk(1000L, 2000L), root)
    assert(av == 2L)
    // the append carried v1 by reference and added only its own files
    val inv2 = Snapshot.fileInventory(spark, root, 2L).map(_._1).toSet
    assert(v1Files.subsetOf(inv2), "append must reference the base files")
    val added = inv2 -- v1Files
    assert(added.nonEmpty && added.forall(_.contains("/v=2/")),
      s"append leaked non-batch files: $added")
    // content is the union, and carried+fresh stats prune across it
    assert(Snapshot.readCurrent(spark, root).count() == 2000L)
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(500L), lit(1500L)).count() == 1001L)
    // append on an empty table is the first commit
    val fresh = freshTable()
    assert(Snapshot.appendCommit(mk(0L, 10L), fresh) == 1L)
    assert(Snapshot.readCurrent(spark, fresh).count() == 10L)
  }

  test("racing append and delete serialize through the claim protocol") {
    val root = freshTable()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(mk(0L, 1000L), root, Seq("k"))
    // disjoint targets: the delete removes [0,100] from the base, the
    // append adds [2000,2100) — BOTH serial orders converge to the
    // same row set, so the assert pins serialization, not luck
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(Snapshot.appendCommit(mk(2000L, 2100L), root))
    val fd = Future(
      Snapshot.deleteWhere(spark, root, "k", lit(0L), lit(100L)))
    val (va, vd) = (Await.result(fa, 120.seconds),
      Await.result(fd, 120.seconds))
    // both landed, on distinct versions, and nothing was lost
    assert(Set(va, vd) == Set(2L, 3L), s"got versions $va/$vd")
    val ks = Snapshot.readCurrent(spark, root)
      .collect().map(_.getLong(0)).toSet
    val expect = ((101L until 1000L) ++ (2000L until 2100L)).toSet
    assert(ks == expect,
      s"racing commits lost rows: ${(expect -- ks).take(5)}... or " +
        s"phantoms: ${(ks -- expect).take(5)}...")
  }

  test("readCurrentPruned's stats-less fallback resolves the manifest, not the bare directory") {
    val root = freshTable()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    // plain commit (NO stats) then an append: v2 has a file MANIFEST
    // referencing v1's files but no stats manifest — the fallback that
    // read the v=2 directory directly would silently return only the
    // appended batch
    Snapshot.commit(mk(0L, 1000L), root)
    Snapshot.appendCommit(mk(1000L, 2000L), root)
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(0L), lit(5000L)).count() == 2000L,
      "fallback dropped manifest-referenced rows")
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(500L), lit(1500L)).count() == 1001L)
    // the degenerate anchor case: a stats-less RESTORE's directory is
    // an EMPTY schema anchor — the directory fallback returns nothing
    Snapshot.commit(mk(0L, 10L), root)
    Snapshot.restore(spark, root, 1L)
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(0L), lit(5000L)).count() == 1000L,
      "fallback returned the restore's empty anchor instead of the table")
  }

  test("DELETE WHERE does not delete NULL-key rows, wherever they live") {
    val root = freshTable()
    // one file mixing NULL keys with in-range keys (so the file is
    // rewritten) — SQL DELETE semantics: a NULL predicate does not
    // delete, so the NULLs must survive the rewrite exactly as they
    // would survive in a carried file
    val df = spark.range(0L, 20L)
      .select(when(col("id") < 5, lit(null).cast("long"))
          .otherwise(col("id")).as("k"),
        (col("id") % 7).as("v"))
      .coalesce(1)
    Snapshot.commitWithStats(df, root, Seq("k"))
    Snapshot.deleteWhere(spark, root, "k", lit(5L), lit(9L))
    val ks = Snapshot.readCurrent(spark, root).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(ks == (Set(-1L) ++ (10L until 20L)),
      s"NULL-key rows were deleted by a NULL predicate: $ks")
  }

  test("racing appendCommits on an EMPTY table both land (bootstrap serializes)") {
    val root = freshTable()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    // the old bootstrap degraded to two blind full-replace commits —
    // the pointer ended on one batch and the other append's rows were
    // silently lost despite append's additive contract
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(Snapshot.appendCommit(mk(0L, 100L), root))
    val fb = Future(Snapshot.appendCommit(mk(100L, 200L), root))
    val (va, vb) = (Await.result(fa, 120.seconds),
      Await.result(fb, 120.seconds))
    assert(Set(va, vb) == Set(1L, 2L), s"got versions $va/$vb")
    val ks = Snapshot.readCurrent(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(ks == (0L until 200L).toSet,
      s"bootstrap race lost rows: ${((0L until 200L).toSet -- ks).take(5)}...")
  }

  test("add-column evolution: old files read NULL, old versions keep the old schema") {
    val root = freshTable()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(mk(0L, 100L), root, Seq("k"))
    // the evolved batch adds `flag`; carried v1 files never rewrite
    Snapshot.appendCommit(
      mk(100L, 200L).withColumn("flag", col("k") % 2), root)
    val cur = Snapshot.readCurrent(spark, root)
    assert(cur.columns.toSeq == Seq("k", "v", "flag"),
      s"union schema expected, got ${cur.columns.toSeq}")
    val byFlag = cur.groupBy("flag").count().collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1))
      .toMap
    assert(byFlag == Map(-1L -> 100L, 0L -> 50L, 1L -> 50L),
      s"old rows must read NULL flag: $byFlag")
    // time travel: the OLD version still reads with the OLD schema
    assert(Snapshot.readVersion(spark, root, 1L).columns.toSeq
      == Seq("k", "v"))
    // pruning still works across the boundary (old files carry stats)
    assert(Snapshot.readCurrentPruned(spark, root, "k",
      lit(50L), lit(150L)).count() == 101L)
    // maintenance crossing the boundary: a delete whose touched files
    // are OLD-generation must not drop the new column from the table,
    // and a full compact re-materializes the union schema
    Snapshot.deleteWhere(spark, root, "k", lit(0L), lit(9L))
    val afterDel = Snapshot.readCurrent(spark, root)
    assert(afterDel.columns.toSeq == Seq("k", "v", "flag"))
    assert(afterDel.count() == 190L)
    Snapshot.compact(spark, root, numFiles = 2)
    val afterCompact = Snapshot.readCurrent(spark, root)
    assert(afterCompact.columns.toSeq == Seq("k", "v", "flag"))
    assert(afterCompact.filter(col("flag").isNull).count() == 90L)
    // a retype is NOT an append — fail fast, not silent corruption
    intercept[IllegalArgumentException] {
      Snapshot.appendCommit(
        mk(200L, 210L).withColumn("flag", lit("not-a-long")), root)
    }
  }

  test("change feed crosses an add-column boundary with NULL pre-images") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    // v2 adds `flag`: k=1 unchanged (flag stays NULL), k=2 updated
    // (flag appears), k=3 inserted
    Snapshot.commit(
      Seq((1L, "a", None: Option[Long]), (2L, "b", Some(7L)),
        (3L, "c", Some(1L))).toDF("k", "v", "flag"), root)
    val feed = Snapshot.changeFeed(spark, root, "k", fromV = 1L, toV = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(feed == Set((2L, "update", 7L), (3L, "insert", 1L)),
      s"feed across the evolution boundary: $feed")
  }

  test("zorder commit: the 2-D box prune opens strictly fewer files than either 1-D prune on a linear layout") {
    import spark.implicits._
    // the full 64×64 grid, one row per cell — every a-slice carries
    // every b value, so a single-column sort serves one axis and
    // scatters the other
    val df = (0 until 4096).map { i =>
      (i.toLong, (i / 64).toLong, (i % 64).toLong)
    }.toDF("id", "a", "b")
    val zRoot = freshTable()
    Snapshot.commitClustered(df, zRoot, "a", "b", 16)
    val linRoot = freshTable()
    Snapshot.commitWithStats(
      df.repartitionByRange(16, col("a")).sortWithinPartitions("a"),
      linRoot, Seq("a", "b"))
    def filesFor(root: String, c: String, lo: Long, hi: Long): Set[String] =
      Snapshot.prunedFiles(spark, root, 1L, c, lit(lo), lit(hi)).toSet
    // a quarter-box on each axis
    val zBox = filesFor(zRoot, "a", 0, 15)
      .intersect(filesFor(zRoot, "b", 0, 15))
    val linA = filesFor(linRoot, "a", 0, 15)
    val linB = filesFor(linRoot, "b", 0, 15)
    val total = filesFor(zRoot, "a", Long.MinValue, Long.MaxValue).size
    assert(total == 16, s"expected 16 clustered files, got $total")
    // the linear layout's scattered dimension prunes nothing
    assert(linB.size == 16,
      s"linear layout pruned the scattered dimension: ${linB.size}")
    assert(zBox.size < linA.size && zBox.size < linB.size,
      s"box prune (${zBox.size}) not better than 1-D prunes " +
        s"(a=${linA.size}, b=${linB.size})")
    // values: the box read equals the plain filter, both layouts
    val want = df.filter(col("a").between(0, 15) && col("b").between(0, 15))
      .select("id").as[Long].collect().sorted.toSeq
    val got = Snapshot.readCurrentPrunedBox(spark, zRoot,
        "a", lit(0L), lit(15L), "b", lit(0L), lit(15L))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want, s"box read mismatch: ${got.size} vs ${want.size}")
  }

  test("vacuum keeps manifest-referenced ancestors until compact collapses the chain") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commitWithStats(
      Seq.tabulate(100)(i => (i.toLong, s"r$i")).toDF("k", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      root, Seq("k"))
    Snapshot.deleteWhere(spark, root, "k", lit(0L), lit(24L))
    val before = rows(root)
    // v2's manifest still references v1's carried files: retention
    // would reclaim v1, reference-tracking must keep it
    val d1 = Snapshot.vacuum(spark, root)
    assert(!d1.contains("v=1"),
      s"vacuum reclaimed a manifest-referenced ancestor: $d1")
    assert(rows(root) == before, "chain read broken after vacuum")
    // compact re-materializes v3 self-contained; now v1 AND v2 are
    // unreferenced and reclaimable
    Snapshot.compact(spark, root, 2)
    val d2 = Snapshot.vacuum(spark, root)
    assert(d2.contains("v=1") && d2.contains("v=2"),
      s"collapsed chain not reclaimed: $d2")
    assert(rows(root) == before, "content changed across compact+vacuum")
    val ex = intercept[java.util.NoSuchElementException] {
      Snapshot.readVersion(spark, root, 1L).collect()
    }
    assert(ex.getMessage.contains("vacuumed"),
      s"vacuumed-version read must fail fast: ${ex.getMessage}")
  }

  test("time travel: as-of instants resolve to the version live at that instant") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    Snapshot.commit(Seq((1L, "A"), (3L, "c")).toDF("k", "v"), root)
    Snapshot.commit(Seq((9L, "z")).toDF("k", "v"), root)
    val h = Snapshot.commitHistory(spark, root)
    assert(h.map(_._1) == Seq(1L, 2L, 3L), s"history versions: $h")
    val ts = h.toMap
    // markers are strictly increasing even when commits land within
    // the same millisecond
    assert(ts(1L) < ts(2L) && ts(2L) < ts(3L), s"non-monotonic: $h")
    assert(Snapshot.versionAsOf(spark, root, ts(1L)) == 1L)
    assert(Snapshot.versionAsOf(spark, root, (ts(1L) + ts(2L)) / 2) == 1L)
    assert(Snapshot.versionAsOf(spark, root, ts(2L)) == 2L)
    assert(Snapshot.versionAsOf(spark, root, ts(3L) + 1000000L) == 3L)
    val mid = Snapshot.readAsOf(spark, root, ts(2L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mid == Set((1L, "A"), (3L, "c")), s"as-of v2 read: $mid")
    intercept[java.util.NoSuchElementException] {
      Snapshot.versionAsOf(spark, root, ts(1L) - 1)
    }
    val bare = freshTable()
    intercept[java.util.NoSuchElementException] {
      Snapshot.versionAsOf(spark, bare, System.currentTimeMillis())
    }
  }

  test("of4 upsert-merge through snapshots equals the logical merge") {
    val got = graft.operators.Etl.upsertMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val orders = graft.sources.Tables.orders(spark, sf)
    val want = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the merge batch only reprices (no key add/drop): per-status counts
    // must survive the snapshot roundtrip untouched
    assert(got == want)
  }

  test("shallow clone: zero-copy reference, independent evolution, source untouched") {
    import spark.implicits._
    val base = freshTable()
    val src = s"$base/src"
    val dst = s"$base/clone"
    Snapshot.commitWithStats(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
        .toDF("k", "v").repartitionByRange(2, col("k"))
        .sortWithinPartitions("k"),
      src, Seq("k"))
    Snapshot.shallowClone(spark, src, dst)
    // the clone's v=1 holds NO data files of its own — pure reference
    val cloned = Snapshot.manifestFiles(spark, dst, 1L)
    assert(cloned.nonEmpty && cloned.get.nonEmpty)
    assert(cloned.get.forall(_.contains("/src/")),
      s"clone manifest should reference source files: ${cloned.get}")
    assert(rows(dst) == rows(src))
    // delete a band on the CLONE: only overlapping files rewrite (under
    // the clone's root); the rest keep riding the source's files
    Snapshot.deleteWhere(spark, dst, "k", lit(1L), lit(2L))
    assert(rows(dst) == Set((3L, "c"), (4L, "d")))
    val after = Snapshot.manifestFiles(spark, dst, 2L).get
    assert(after.exists(_.contains("/src/")),
      "untouched files must still ride the source cross-root")
    // the source never noticed
    assert(Snapshot.currentVersion(spark, src).contains(1L))
    assert(rows(src) == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // a second clone into a used root is refused
    intercept[IllegalArgumentException] {
      Snapshot.shallowClone(spark, src, dst)
    }
    // compact self-contains the clone (drops the cross-root dependency)
    Snapshot.compact(spark, dst)
    val selfFiles = Snapshot.manifestFiles(spark, dst,
      Snapshot.currentVersion(spark, dst).get)
    assert(selfFiles.isEmpty || selfFiles.get.forall(!_.contains("/src/")))
    assert(rows(dst) == Set((3L, "c"), (4L, "d")))
  }

  test("merge-side schema evolution: new column lands, kept rows read NULL, old version keeps old schema") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    // change batch carries a NEW column: update k=2, insert k=9
    Snapshot.mergeCommit(spark, root,
      Seq((2L, "B", 20L), (9L, "i", 90L)).toDF("k", "v", "extra"), "k")
    val cur = Snapshot.readCurrent(spark, root)
    assert(cur.columns.toSeq == Seq("k", "v", "extra"))
    val byK = cur.collect().map(r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(byK == Map(1L -> ("a", None), 2L -> ("B", Some(20L)),
      3L -> ("c", None), 9L -> ("i", Some(90L))))
    // pre-merge version is untouched: old schema, old rows
    val v1 = Snapshot.readVersion(spark, root, 1L)
    assert(v1.columns.toSeq == Seq("k", "v") && v1.count() == 3)
    // a follow-up merge WITHOUT the evolved column still works and
    // reads NULL there (the symmetric allowMissingColumns direction)
    Snapshot.mergeCommit(spark, root, Seq((1L, "A")).toDF("k", "v"), "k")
    val after = Snapshot.readCurrent(spark, root)
    assert(after.columns.toSeq == Seq("k", "v", "extra"))
    assert(after.filter(col("k") === 1L).head().isNullAt(2))
    assert(after.filter(col("k") === 2L).head().getLong(2) == 20L)
  }

  test("CHECK constraints gate every commit path atomically; NULL passes; drop lifts") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "qty"), root)
    // metadata-only add: carries files by reference, validates existing
    val vC = Snapshot.addCheckConstraint(spark, root, "qty_pos", "qty > 0")
    assert(vC == 2L)
    assert(Snapshot.checkConstraintsOf(spark, root, vC)
      == Seq(("qty_pos", "qty > 0")))
    // ...and v1's constraint set is empty (versioned resolution)
    assert(Snapshot.checkConstraintsOf(spark, root, 1L).isEmpty)
    // a constraint the data violates is refused WITHOUT burning a version
    val refused = intercept[Snapshot.ConstraintViolation] {
      Snapshot.addCheckConstraint(spark, root, "qty_small", "qty < 25")
    }
    assert(refused.nViolations == 1L
      && Snapshot.currentVersion(spark, root).contains(vC))
    // append with one bad row: rejected atomically, pointer parked
    val rej = intercept[Snapshot.ConstraintViolation] {
      Snapshot.appendCommit(Seq((4L, 40L), (5L, -5L)).toDF("k", "qty"), root)
    }
    assert(rej.constraint == "qty_pos" && rej.nViolations == 1L)
    assert(Snapshot.currentVersion(spark, root).contains(vC))
    assert(Snapshot.readCurrent(spark, root).count() == 3L)
    // merge with a bad change row: rejected before the merge write
    intercept[Snapshot.ConstraintViolation] {
      Snapshot.mergeCommit(spark, root,
        Seq((2L, -1L)).toDF("k", "qty"), "k")
    }
    assert(Snapshot.currentVersion(spark, root).contains(vC))
    // NULL predicate rows PASS (SQL CHECK semantics)
    Snapshot.appendCommit(
      Seq((6L, Some(60L)), (7L, None)).toDF("k", "qty"), root)
    assert(Snapshot.readCurrent(spark, root).count() == 5L)
    // the constraint survives unrelated commits (resolution ≤ v)
    val rej2 = intercept[Snapshot.ConstraintViolation] {
      Snapshot.appendCommit(Seq((8L, 0L)).toDF("k", "qty"), root)
    }
    assert(rej2.constraint == "qty_pos")
    // drop lifts enforcement going forward
    Snapshot.dropCheckConstraint(spark, root, "qty_pos")
    Snapshot.appendCommit(Seq((8L, 0L)).toDF("k", "qty"), root)
    assert(Snapshot.readCurrent(spark, root).count() == 6L)
    // historical versions still REPORT the constraint they ran under
    assert(Snapshot.checkConstraintsOf(spark, root, vC).nonEmpty)
  }

  test("column rename is metadata-only: files frozen, every path speaks logical names, renames compose") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commitWithStats(
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
        .toDF("k", "qty", "v").repartition(2),
      root, Seq("k"))
    val inv1 = Snapshot.fileInventory(spark, root, 1L).map(_._1).toSet
    Snapshot.renameColumn(spark, root, "qty", "amount")
    // zero data I/O: version 2 references exactly version 1's files
    assert(Snapshot.fileInventory(spark, root, 2L).map(_._1).toSet == inv1)
    assert(Snapshot.readCurrent(spark, root).columns.toSeq
      == Seq("k", "amount", "v"))
    // the old version still reads under the name it was committed with
    assert(Snapshot.readVersion(spark, root, 1L).columns.toSeq
      == Seq("k", "qty", "v"))
    // writers speak the NEW name: append, then merge
    Snapshot.appendCommit(Seq((4L, 40L, "d")).toDF("k", "amount", "v"), root)
    Snapshot.mergeCommit(spark, root,
      Seq((2L, 200L, "B")).toDF("k", "amount", "v"), "k")
    val byK = Snapshot.readCurrent(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK == Map(1L -> 10L, 2L -> 200L, 3L -> 30L, 4L -> 40L))
    // pruned read addressed by the logical STATS column still skips
    val pruned = Snapshot.readCurrentPruned(spark, root, "k",
      org.apache.spark.sql.functions.lit(1L),
      org.apache.spark.sql.functions.lit(2L))
    assert(pruned.columns.contains("amount"))
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // deleteWhere by logical name
    Snapshot.deleteWhere(spark, root, "k",
      org.apache.spark.sql.functions.lit(4L),
      org.apache.spark.sql.functions.lit(4L))
    assert(Snapshot.readCurrent(spark, root).count() == 3L)
    // renames COMPOSE to one map entry; renaming back drops the map
    Snapshot.renameColumn(spark, root, "amount", "price")
    assert(Snapshot.readCurrent(spark, root).columns.toSeq
      == Seq("k", "price", "v"))
    val vNow = Snapshot.currentVersion(spark, root).get
    assert(Snapshot.columnMapOf(spark, root, vNow)
      == Seq(("qty", "price")))
    Snapshot.renameColumn(spark, root, "price", "qty")
    assert(Snapshot.columnMapOf(spark, root,
      Snapshot.currentVersion(spark, root).get).isEmpty)
    // refusals: unknown source, taken target, constraint-referenced
    intercept[IllegalArgumentException] {
      Snapshot.renameColumn(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      Snapshot.renameColumn(spark, root, "qty", "v")
    }
    Snapshot.addCheckConstraint(spark, root, "qty_pos", "qty > 0")
    intercept[IllegalArgumentException] {
      Snapshot.renameColumn(spark, root, "qty", "amount")
    }
  }

  test("change feed crosses a rename boundary as updates, not a delete+insert storm") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, 10L), (2L, 20L)).toDF("k", "qty"), root)
    Snapshot.renameColumn(spark, root, "qty", "amount")
    Snapshot.mergeCommit(spark, root,
      Seq((2L, 200L), (5L, 50L)).toDF("k", "amount"), "k")
    val feed = Snapshot.changeFeed(spark, root, "k", 1L,
      Snapshot.currentVersion(spark, root).get).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // k=1 unchanged (same physical value through the rename); k=2
    // updated; k=5 inserted — the rename itself is invisible to rows
    assert(feed == Set((2L, "update", 200L), (5L, "insert", 50L)))
  }

  test("generated column: base-range reads prune via the derived bucket's stats") {
    import spark.implicits._
    val root = freshTable()
    val df = (1L to 8000L).map(i => (i, s"v$i")).toDF("k", "v")
    Snapshot.commitGenerated(df, root, "k", 1000L, "kb", nFiles = 8)
    // rule recorded and resolvable
    assert(Snapshot.genRuleOf(spark, root, 1L)
      .contains(("kb", "k", 1000L)))
    // a one-bucket base range opens a strict subset of the files even
    // though stats exist only on the GENERATED column
    val all = Snapshot.prunedFiles(spark, root, 1L, "kb",
      lit(Long.MinValue), lit(Long.MaxValue)).toSet
    val hit = Snapshot.prunedFiles(spark, root, 1L, "kb",
      lit(2L), lit(2L)).toSet
    assert(all.size == 8 && hit.size < all.size,
      s"expected a strict prune: ${hit.size} of ${all.size}")
    // values: base semantics exactly (bucket-boundary edges included)
    val got = Snapshot.readCurrentWhereBase(spark, root, "k", 1999L, 3001L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == (1999L to 3001L).toSet)
    // rule mismatch refuses rather than scanning everything silently
    intercept[IllegalArgumentException] {
      Snapshot.readCurrentWhereBase(spark, root, "v", 1L, 2L)
    }
  }

  test("generated column: unsafe names refused at commit, corrupt sidecar loud at read") {
    import spark.implicits._
    val root = freshTable()
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
    // a name the sidecar's fixed-format JSON could not round-trip is
    // rejected BEFORE anything commits (quote, space, backtick)
    for (bad <- Seq("""k"b""", "k b", "`kb`")) {
      intercept[IllegalArgumentException] {
        Snapshot.commitGenerated(df, root, "k", 1000L, bad)
      }
    }
    intercept[IllegalArgumentException] {
      Snapshot.commitGenerated(df, root, """base"col""", 1000L, "kb")
    }
    // a sidecar that EXISTS but doesn't parse is corruption, not
    // "no rule": the reader must fail loudly with the evidence rather
    // than degrade into the misleading no-rule NoSuchElementException
    Snapshot.commitGenerated(df, root, "k", 1000L, "kb", nFiles = 2)
    val sidecar = new java.io.File(root, "_gencol/v=1.json")
    assert(sidecar.isFile, s"no rule sidecar at $sidecar")
    java.nio.file.Files.write(sidecar.toPath,
      """{"gen":bogus}""".getBytes("UTF-8"))
    // drop the local-FS checksum shadow so the corruption reaches the
    // PARSER (a CRC mismatch is the other, already-loud failure mode)
    new java.io.File(sidecar.getParent, s".${sidecar.getName}.crc").delete()
    val e = intercept[IllegalStateException] {
      Snapshot.readCurrentWhereBase(spark, root, "k", 1L, 5L)
    }
    assert(e.getMessage.contains("malformed") &&
      e.getMessage.contains("bogus"), e.getMessage)
  }

  // ---- merge-on-read deletes (deletion-vector sidecar) ----

  private def dataFiles(root: String, v: Long): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(root, s"v=$v"))
      .iterator().asScala.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .toSet
  }

  test("deleteWhereMor erases scattered rows with ZERO data files rewritten") {
    import spark.implicits._
    val root = freshTable()
    val df = spark.range(0, 800).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    val v1Files = dataFiles(root, 1L)
    // every 10th key: one row in EVERY file — the shape whose COW
    // delete would rewrite the whole table
    val v2 = Snapshot.deleteWhereMor(spark, root, col("k") % 10 === 0)
    assert(v2 == 2L)
    // values: exactly the filtered table
    val got = Snapshot.readCurrent(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 800L).filterNot(_ % 10 == 0).toSet)
    // granularity: the new version holds NO data rows of its own —
    // every base file rides by reference, only the sidecar is new
    val mf = Snapshot.manifestFiles(spark, root, v2).get
    assert(v1Files.subsetOf(mf.map(_.stripPrefix("file://")).toSet)
      || mf.count(_.contains("/v=1/")) == v1Files.size,
      "MOR delete failed to carry every base file by reference")
    val freshInV2 = mf.filter(_.contains(s"/v=$v2/"))
    assert(freshInV2.isEmpty ||
      spark.read.parquet(freshInV2: _*).isEmpty,
      "MOR delete wrote data rows into its own version dir")
    // time travel: the pre-delete version still shows the rows
    assert(Snapshot.readVersion(spark, root, 1L).count() == 800L)
    // composition: a second MOR delete unions into the sidecar
    val v3 = Snapshot.deleteWhereMor(spark, root, col("k") === 1L)
    assert(Snapshot.readCurrent(spark, root).count() == 800L - 80 - 1)
    // NULL predicate deletes nothing (SQL DELETE semantics)
    Snapshot.deleteWhereMor(spark, root,
      when(col("k") < 0, true).otherwise(lit(null).cast("boolean")))
    assert(Snapshot.readCurrent(spark, root).count() == 800L - 80 - 1)
    assert(v3 == 3L)
  }

  test("MOR tombstones survive appends, die under compact, and never resurrect through rewrites") {
    import spark.implicits._
    val root = freshTable()
    val df = spark.range(0, 400).select(col("id").as("k"),
        (col("id") % 5).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    Snapshot.deleteWhereMor(spark, root, col("k") % 10 === 0) // -40
    // append: new rows visible, tombstones still applied to carried files
    Snapshot.appendCommit(
      (1000L until 1010L).map(k => (k, k)).toDF("k", "v"), root)
    assert(Snapshot.readCurrent(spark, root).count() == 400 - 40 + 10)
    // pruned range read applies the sidecar
    val pruned = Snapshot.readCurrentPruned(spark, root, "k",
      lit(0L), lit(39L)).collect().map(_.getLong(0)).toSet
    assert(pruned == (0L until 40L).filterNot(_ % 10 == 0).toSet,
      s"pruned read resurrected tombstoned rows: $pruned")
    // file-granular COW delete of a band: its rewrite must not
    // resurrect the band's tombstoned rows, and carried files keep
    // their tombstones
    Snapshot.deleteWhere(spark, root, "k", lit(100L), lit(149L))
    val after = Snapshot.readCurrent(spark, root)
      .collect().map(_.getLong(0)).toSet
    val expect = ((0L until 400L).filterNot(_ % 10 == 0)
      .filterNot(k => k >= 100L && k <= 149L) ++
      (1000L until 1010L)).toSet
    assert(after == expect)
    // keyed merge re-inserting a tombstoned key: the fresh row wins
    // (tombstones pin (file, row_index), never keys)
    Snapshot.mergeCommit(spark, root,
      Seq((30L, -30L)).toDF("k", "v"), "k")
    val k30 = Snapshot.readCurrent(spark, root)
      .filter(col("k") === 30L).collect().map(_.getLong(1)).toSeq
    assert(k30 == Seq(-30L), s"re-inserted tombstoned key read $k30")
    // compact re-materializes the survivors and CLEARS the sidecar
    val cv = Snapshot.compact(spark, root, numFiles = 2)
    assert(!new java.io.File(root, s"_dv/v=$cv").exists(),
      "compact must clear the deletion-vector sidecar")
    assert(Snapshot.readCurrent(spark, root)
      .filter(col("k") % 10 === 0 && col("k") < 400).count() == 1L)
    // (k=30 is the one re-inserted multiple-of-10 under 400)
  }

  test("purgeDv rewrites only tombstoned files, clears the sidecar, and no-ops when clean") {
    import spark.implicits._
    val root = freshTable()
    val df = spark.range(0, 400).select(col("id").as("k"),
        (col("id") % 5).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    // clustered delete: tombstones land in the low-key file(s) only
    Snapshot.deleteWhereMor(spark, root, col("k") < 50)
    val pv = Snapshot.purgeDv(spark, root)
    assert(pv == 3L)
    assert(!new java.io.File(root, s"_dv/v=$pv").exists,
      "purge left the sidecar behind")
    // only the tombstoned file(s) rewrote; the rest carried by reference
    val mfp = Snapshot.manifestFiles(spark, root, pv).get
    assert(mfp.count(_.contains("/v=1/")) >= 2,
      s"purge rewrote clean files: $mfp")
    assert(Snapshot.readCurrent(spark, root).count() == 350L)
    // the purged bytes really dropped the rows (read the fresh files raw)
    val freshP = mfp.filter(_.contains(s"/v=$pv/"))
    if (freshP.nonEmpty)
      assert(spark.read.parquet(freshP: _*)
        .filter(col("k") < 50).count() == 0L)
    // a clean table no-ops without burning a version
    assert(Snapshot.purgeDv(spark, root) == pv)
  }

  test("change feed classifies MOR-deleted rows as deletes (no write-path logging needed)") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(spark.range(0, 50)
      .select(col("id").as("k"), col("id").as("v")), root)
    Snapshot.deleteWhereMor(spark, root, col("k") % 10 === 0)
    val feed = Snapshot.changeFeed(spark, root, "k", fromV = 1L, toV = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the feed derives from version reads, and version reads apply the
    // sidecar — so a metadata-only MOR delete surfaces as exactly its
    // row deletes, nothing else
    assert(feed == (0L until 50L by 10L).map(_ -> "delete").toSet, feed)
  }

  test("a zero-match MOR delete on a DV-less table writes NO sidecar (no read tax)") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(spark.range(0, 50)
      .select(col("id").as("k"), col("id").as("v")), root)
    val v2 = Snapshot.deleteWhereMor(spark, root, col("k") < 0)
    assert(v2 == 2L)
    assert(!new java.io.File(root, s"_dv/v=$v2").exists(),
      "an empty tombstone set must not write a sidecar — every read " +
        "would pay the anti-join plus the inventory-hash check for nothing")
    assert(Snapshot.readCurrent(spark, root).count() == 50L)
  }

  test("MOR tombstones survive a carry through a table root containing a space") {
    import spark.implicits._
    // the URL-encoding trap: `_metadata.file_path` and Path.toString may
    // disagree on how a space in the root is spelled; a byte-wise
    // mismatch would silently drop every tombstone at carry time and
    // resurrect the deleted rows. The carry now asserts membership
    // loudly; this pins the whole path end-to-end.
    val dir = java.nio.file.Files.createTempDirectory("graft_snap spaced_")
    val root = dir.resolve("tbl with space").toString
    Snapshot.commit(spark.range(0, 60)
      .select(col("id").as("k"), col("id").as("v")), root)
    Snapshot.deleteWhereMor(spark, root, col("k") % 10 === 0)
    assert(Snapshot.readCurrent(spark, root).count() == 54L)
    // append → writeManifestAndStats carry (the drop site)
    Snapshot.appendCommit(Seq((1000L, 1L)).toDF("k", "v"), root)
    val got = Snapshot.readCurrent(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(!got.exists(k => k < 60 && k % 10 == 0),
      s"carried tombstones were dropped through the spaced root: $got")
    assert(got.size == 55)
  }

  test("an oversized sidecar auto-purges at commit (README's COW-vs-MOR rule, self-executing)") {
    import spark.implicits._
    val root = freshTable()
    val df = spark.range(0, 400).select(col("id").as("k"),
        (col("id") % 5).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    Snapshot.commitWithStats(df, root, Seq("k"))
    spark.conf.set("graft.snapshot.dvAutoPurgeBytes", "1")
    try {
      // opted out: the delete commits MOR-style and the sidecar stays
      spark.conf.set("graft.snapshot.dvAutoPurge", "false")
      val v2 = Snapshot.deleteWhereMor(spark, root, col("k") < 20)
      assert(v2 == 2L && new java.io.File(root, "_dv/v=2").exists(),
        "opt-out must leave the sidecar in place (logged recommendation only)")
      // default: the follow-on purge runs and clears it
      spark.conf.unset("graft.snapshot.dvAutoPurge")
      val v = Snapshot.deleteWhereMor(spark, root, col("k") >= 20 && col("k") < 40)
      assert(v == 4L, s"expected the returned version to be the purge's (v=4), got $v")
      assert(!new java.io.File(root, s"_dv/v=$v").exists(),
        "auto-purge must clear the sidecar")
      assert(Snapshot.readCurrent(spark, root).count() == 360L)
    } finally {
      spark.conf.unset("graft.snapshot.dvAutoPurgeBytes")
      spark.conf.unset("graft.snapshot.dvAutoPurge")
    }
  }

  test("MOR sidecars ride shallow clones and follow vacuum retention") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commitWithStats(spark.range(0, 100)
      .select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(2, col("k")), root, Seq("k"))
    Snapshot.deleteWhereMor(spark, root, col("k") < 10)
    // clone inherits the tombstones with the referenced files
    val cloneRoot = freshTable() + "/clone"
    Snapshot.shallowClone(spark, root, cloneRoot)
    assert(Snapshot.readCurrent(spark, cloneRoot).count() == 90L)
    // vacuum with retain=1: v=1's sidecar-less dir dies, v=2's sidecar
    // stays (it belongs to the live version)
    Snapshot.deleteWhereMor(spark, root, col("k") === 50L) // v=3
    val swept = Snapshot.vacuum(spark, root, retain = 1)
    assert(new java.io.File(root, "_dv/v=3").exists(),
      "vacuum swept the live version's deletion vector")
    assert(swept.exists(_.startsWith("_dv/")) ||
      !new java.io.File(root, "_dv/v=2").exists(),
      "vacuum left a dead version's deletion vector behind")
    assert(Snapshot.readCurrent(spark, root).count() == 89L)
  }
}
