package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** Pins for metadata-only DROP COLUMN: current reads lose the column,
  * time travel keeps it, appends work without it, the tombstone guard
  * refuses reintroduction, and the refusal preconditions hold. */
class DropColumnSpec extends SparkSuite {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_dropspec_").toString

  test("drop: current loses the column, v1 keeps it, zero data rewritten") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "x"), root)
    val filesBefore =
      Snapshot.fileInventory(spark, root, 1L).toSet
    Snapshot.dropColumn(spark, root, "x")
    // metadata-only: version 2 carries the identical physical files
    assert(Snapshot.fileInventory(spark, root, 2L).toSet == filesBefore)
    assert(Snapshot.readCurrent(spark, root).columns.toSeq == Seq("k", "v"))
    val v1 = Snapshot.readVersion(spark, root, 1L)
    assert(v1.columns.toSeq == Seq("k", "v", "x"))
    assert(v1.agg(sum("x")).head().getLong(0) == 60L)
  }

  test("append after drop works; reintroducing the retired name refuses") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a", 10L)).toDF("k", "v", "x"), root)
    Snapshot.dropColumn(spark, root, "x")
    Snapshot.appendCommit(Seq((2L, "b")).toDF("k", "v"), root)
    assert(Snapshot.readCurrent(spark, root).collect().map(_.getLong(0))
      .toSet == Set(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      Snapshot.appendCommit(Seq((3L, "c", 99L)).toDF("k", "v", "x"), root)
    }
    assert(e.getMessage.contains("retired"))
    // the refused batch never became visible
    assert(Snapshot.readCurrent(spark, root).count() == 2L)
  }

  test("drop composes with rename: tombstone keys the PHYSICAL name") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a", 10L)).toDF("k", "v", "x"), root)
    Snapshot.renameColumn(spark, root, "x", "y")
    Snapshot.dropColumn(spark, root, "y")
    assert(Snapshot.readCurrent(spark, root).columns.toSeq == Seq("k", "v"))
    // the PHYSICAL name x is what's retired — a batch whose logical
    // name maps back onto it is refused under either spelling
    intercept[IllegalArgumentException] {
      Snapshot.appendCommit(Seq((2L, "b", 1L)).toDF("k", "v", "x"), root)
    }
    // a genuinely fresh logical name is fine (add-column evolution)
    Snapshot.appendCommit(Seq((2L, "b", 5L)).toDF("k", "v", "z"), root)
    val cur = Snapshot.readCurrent(spark, root)
    assert(cur.columns.toSeq == Seq("k", "v", "z"))
    assert(cur.filter(col("k") === 1L).head().isNullAt(2)) // old row: NULL z
  }

  test("stats-pruned and point reads honor the drop (no resurrection)") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commitWithStats(
      (1L to 40L).map(i => (i, s"v$i", i * 10L)).toDF("k", "v", "x")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      root, Seq("k"), bloomCols = Seq("k"))
    Snapshot.dropColumn(spark, root, "x")
    // the file-granular read paths bypass readResolved — each must
    // still pin the recorded schema, or the files' physical x leaks
    val pruned = Snapshot.readCurrentPruned(
      spark, root, "k", lit(5L), lit(15L))
    assert(pruned.columns.toSeq == Seq("k", "v"))
    assert(pruned.count() == 11L)
    val point = Snapshot.readCurrentPoint(spark, root, "k", 7L)
    assert(point.columns.toSeq == Seq("k", "v"))
    assert(point.count() == 1L)
  }

  test("drop refusals: last column, constraint-referenced, stats key") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commitWithStats(
      Seq((1L, 10L)).toDF("k", "x"), root, Seq("k"))
    intercept[IllegalArgumentException] {
      Snapshot.dropColumn(spark, root, "k") // stats key
    }
    Snapshot.addCheckConstraint(spark, root, "x_pos", "x > 0")
    intercept[IllegalArgumentException] {
      Snapshot.dropColumn(spark, root, "x") // constraint references it
    }
    Snapshot.dropCheckConstraint(spark, root, "x_pos")
    Snapshot.dropColumn(spark, root, "x")
    intercept[IllegalArgumentException] {
      Snapshot.dropColumn(spark, root, "k") // now the last column
    }
  }

  test("restore to a pre-drop version revives the column consistently") {
    import spark.implicits._
    val root = freshTable()
    Snapshot.commit(Seq((1L, "a", 10L)).toDF("k", "v", "x"), root)
    Snapshot.dropColumn(spark, root, "x")
    Snapshot.appendCommit(Seq((2L, "b")).toDF("k", "v"), root)
    Snapshot.restore(spark, root, 1L)
    // the restored version's schema HAS x again — the tombstone must
    // not refuse appends of a column that is live in the base schema
    // (every carried file holds real values for it)
    val cur = Snapshot.readCurrent(spark, root)
    assert(cur.count() == 1L && cur.columns.contains("x"))
    Snapshot.appendCommit(Seq((9L, "z", 7L)).toDF("k", "v", "x"), root)
    assert(Snapshot.readCurrent(spark, root)
      .agg(sum("x")).head().getLong(0) == 17L)
  }
}
