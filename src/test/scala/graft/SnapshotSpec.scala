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

  test("a crash before the pointer swap leaves readers on the old snapshot") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    // the crashed merge: v=2 fully written, pointer never swapped
    Snapshot.writeOrphan(
      Seq((1L, "HALF"), (2L, "MERGE")).toDF("k", "v"), root, 2L)
    assert(Snapshot.currentVersion(spark, root).contains(1L))
    assert(rows(root) == Set((1L, "a"), (2L, "b")),
      "reader saw a committed-but-unreferenced snapshot")
    // recovery: the next real commit must NOT re-point at the orphan's
    // name with different content — it claims a strictly higher version
    val v = Snapshot.mergeCommit(spark, root,
      Seq((2L, "B")).toDF("k", "v"), "k")
    assert(v == 3L, s"recovered commit reused orphan version: $v")
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
}
