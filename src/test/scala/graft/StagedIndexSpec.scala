package graft

import graft.operators.Similarity
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The staged ANN index contract (round-10 design: the N×k corpus
  * assignment is index MAINTENANCE — committed once to disk — and
  * queries are probe-only):
  *   - derived geometry follows the documented integer formulas and
  *     floors at the historical (stride 1, k 8) through oracle scales;
  *   - the staged probe path is byte-identical to the inline path over
  *     the same codebook;
  *   - a second session reuses the PUBLISHED index (no rebuild — the
  *     on-disk root is untouched by later readers);
  *   - a fixture whose files change gets a fresh fingerprint and a
  *     fresh index root (stale state can never be read).
  */
class StagedIndexSpec extends SparkSuite {

  private def indexRoots: Seq[Path] = {
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_annindex")
    if (!Files.exists(base)) Seq.empty
    else Files.list(base).iterator().asScala.toSeq
  }

  test("derived ANN geometry: integer formulas, floored at (1, 8) through oracle scales") {
    // oracle-scale floors: sf0.001/sf0.01 (500 vecs) and sf0.1 (2000)
    assert(Similarity.annGeometry(500) == (1L, 8))
    assert(Similarity.annGeometry(2000) == (1L, 8))
    // the k floor releases exactly at n = 81*32 = 2592
    assert(Similarity.annGeometry(2591) == (1L, 8))
    assert(Similarity.annGeometry(2592) == (1L, 9))
    // soak scales: k follows sqrt(n/32); stride engages past 65536
    assert(Similarity.annGeometry(20000) == (1L, 25))
    assert(Similarity.annGeometry(200000) == (4L, 79))
    // degenerate corpora stay well-defined
    assert(Similarity.annGeometry(0) == (1L, 8))
    assert(Similarity.annGeometry(1) == (1L, 8))
  }

  test("staged probe path is byte-identical to the inline path over the same codebook") {
    val staged = Similarity.ivfTopKLearned(spark, sf).collect().map(_.toSeq).toSeq
    val inline = Similarity.ivfTopK(spark, sf,
      cells = Some(Similarity.kmeansSums(spark, sf))).collect().map(_.toSeq).toSeq
    assert(staged == inline)
    assert(staged.nonEmpty)
  }

  test("a second session reads the published index without rebuilding it") {
    Similarity.stagedIvfIndex(spark, sf) // ensure published
    val fpRoots = indexRoots
    assert(fpRoots.nonEmpty, "publishing must create an index root")
    val root = fpRoots.maxBy(p => Files.getLastModifiedTime(p).toMillis)
    assert(Files.exists(root.resolve("_COMPLETE")))
    // mtime snapshot EXCLUDING the `_COMPLETE` marker: a reader
    // refreshes that one file on open by design (retention measures
    // idle time, so a hot index is never swept) — everything else must
    // stay byte- and mtime-untouched
    def tree() = Files.walk(root).iterator().asScala
      .filterNot(_.getFileName.toString == "_COMPLETE")
      .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis)).toSet
    val before = tree()
    val markBefore =
      Files.getLastModifiedTime(root.resolve("_COMPLETE")).toMillis
    Thread.sleep(5) // let the refresh be observable on coarse mtime clocks
    // a FRESH session (separate SessionMemo) must open, not rebuild:
    // the on-disk tree is untouched and results match the first session
    val s2 = spark.newSession()
    val viaS2 = Similarity.ivfTopKLearned(s2, sf).collect().map(_.toSeq).toSeq
    assert(tree() == before, "second session must not rewrite the index")
    assert(Files.getLastModifiedTime(root.resolve("_COMPLETE")).toMillis
      >= markBefore, "open must refresh the retention clock")
    assert(viaS2 == Similarity.ivfTopKLearned(spark, sf)
      .collect().map(_.toSeq).toSeq)
  }

  test("a changed fixture gets a fresh fingerprint, geometry probe, and index root") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_annfp_")
    try {
      val src = spark.read.parquet(s"$sf/embeddings.parquet")
      src.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out1 = Similarity.ivfTopKLearned(spark, dir.toString)
        .collect().map(_.toSeq).toSeq
      val n1 = indexRoots.size
      // rewrite the fixture with HALF the corpus: same dir, new bytes —
      // the fingerprint memo key must miss and a new index must stage
      src.filter(col("vec_id") < 250)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out2 = Similarity.ivfTopKLearned(spark, dir.toString)
        .collect().map(_.toSeq).toSeq
      assert(indexRoots.size == n1 + 1, "rewritten fixture must restage")
      assert(out1 != out2, "the halved corpus must change the result")
      // and the half-corpus result is self-consistent with inline
      assert(out2 == Similarity.ivfTopK(spark, dir.toString,
        cells = Some(Similarity.kmeansSums(spark, dir.toString)))
        .collect().map(_.toSeq).toSeq)
    } finally {
      Files.walk(dir).iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  private def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(q => Files.deleteIfExists(q))

  private def freshFixture(): Path = {
    val dir = Files.createTempDirectory("graft_annlease_")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("a LIVE heartbeating builder is never reclaimed; the loser takes the exit-GC'd local path") {
    // Simulate a slow competing builder: claim this fixture's exact
    // root and hold a live lease on it — the r10 defect was a >30-min
    // LIVE build losing its root because subdirectory writes never
    // bump the root's own mtime; liveness is now the heartbeat, so a
    // short stale window plus an old root mtime must still NOT reclaim.
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = freshFixture()
    val s2 = spark.newSession()
    s2.conf.set("graft.ann.leaseStaleMs", "800")
    try {
      val root = Similarity.indexRootFor(s2, dir.toString)
      Files.createDirectories(root)
      val lease = new org.apache.hadoop.fs.Path(
        "file://" + root.resolve("_lease").toAbsolutePath)
      val hb = graft.util.Lease.heartbeat(conf, lease, 100)
      try {
        // age the root itself well past the stale window: only the
        // heartbeat may keep this claim alive
        Files.setLastModifiedTime(root,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 60000))
        Thread.sleep(1200) // outlive the stale window while heartbeating
        val before = graft.util.Lease.exitGcPaths
        val idx = Similarity.stagedIvfIndex(s2, dir.toString)
        assert(idx.assign.count() > 0, "loser path must yield a live index")
        assert(Files.exists(root) && !Files.exists(root.resolve("_COMPLETE")),
          "a live builder's claimed root must survive un-reclaimed")
        val enrolled = graft.util.Lease.exitGcPaths -- before
        assert(enrolled.exists(_.contains("graft_annindex_local_")),
          "the loser's session-local copy must be enrolled for exit GC")
        // the exit sweep (what the shutdown hook runs) reclaims it now
        graft.util.Lease.runExitGcNow()
        assert(enrolled.forall(p => !Files.exists(Paths.get(p))),
          "exit GC must delete the local copy")
      } finally hb.close()
    } finally { rmTree(Similarity.indexRootFor(s2, dir.toString)); rmTree(dir) }
  }

  test("a DEAD builder's residue is reclaimed once both clocks go stale") {
    val dir = freshFixture()
    val s2 = spark.newSession()
    s2.conf.set("graft.ann.leaseStaleMs", "500")
    try {
      val root = Similarity.indexRootFor(s2, dir.toString)
      // a crashed builder: claimed root, stale lease, no _COMPLETE
      Files.createDirectories(root)
      Files.write(root.resolve("_lease"), Array.emptyByteArray)
      Files.write(root.resolve("junk"), "torn build".getBytes("UTF-8"))
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000)
      Files.setLastModifiedTime(root.resolve("_lease"), old)
      Files.setLastModifiedTime(root, old)
      val idx = Similarity.stagedIvfIndex(s2, dir.toString)
      assert(idx.assign.count() > 0)
      assert(Files.exists(root.resolve("_COMPLETE")),
        "the reclaimer must rebuild and publish at the SHARED root")
      assert(!Files.exists(root.resolve("junk")),
        "the dead build's torn state must be gone")
    } finally { rmTree(Similarity.indexRootFor(s2, dir.toString)); rmTree(dir) }
  }

  test("publish-time retention sweep: idle complete siblings go, hot and live-incomplete stay") {
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_annindex")
    Files.createDirectories(base)
    val idleOld = base.resolve("idx-sweepspec-idle-s1-k8-pq")
    val liveBuild = base.resolve("idx-sweepspec-live-s1-k8-pq")
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = freshFixture()
    val s2 = spark.newSession()
    s2.conf.set("graft.ann.leaseStaleMs", "60000")
    s2.conf.set("graft.ann.indexRetentionMs", "1000")
    try {
      // an idle COMPLETE root (stale fingerprint, no reader in 10 s)
      Files.createDirectories(idleOld)
      Files.write(idleOld.resolve("_COMPLETE"), Array.emptyByteArray)
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000)
      Files.setLastModifiedTime(idleOld.resolve("_COMPLETE"), old)
      // a live INCOMPLETE sibling (another corpus mid-build)
      Files.createDirectories(liveBuild)
      val hb = graft.util.Lease.heartbeat(conf,
        new org.apache.hadoop.fs.Path(
          "file://" + liveBuild.resolve("_lease").toAbsolutePath), 100)
      try {
        Similarity.stagedIvfIndex(s2, dir.toString) // winner build + sweep
        assert(!Files.exists(idleOld),
          "an idle complete root past retention must be swept")
        assert(Files.exists(liveBuild),
          "a live in-flight sibling must survive the sweep")
        val mine = Similarity.indexRootFor(s2, dir.toString)
        assert(Files.exists(mine.resolve("_COMPLETE")),
          "the just-published root must survive its own sweep")
      } finally hb.close()
    } finally {
      rmTree(idleOld); rmTree(liveBuild)
      rmTree(Similarity.indexRootFor(s2, dir.toString)); rmTree(dir)
    }
  }
}
