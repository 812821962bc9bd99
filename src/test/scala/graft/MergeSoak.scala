package graft

import graft.operators.Snapshot
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only scale soak (test scope): certify the FILE-GRANULAR keyed
  * MERGE (`Snapshot.mergeCommit` through the stats manifest) at soak
  * scales, A/B'd against the stats-less full-rewrite path on the same
  * data and change batch.
  *
  *   sbt "Test/runMain graft.MergeSoak [sfDir]"
  *
  * Reports, per leg: layout-commit time (one-time setup, not the
  * operator), pruned-merge time + files rewritten vs carried, full-
  * rewrite-merge time, and an exact-arithmetic value cross-check that
  * both paths produced the same logical table. The claim under test is
  * the commit message's: a merge touching one narrow key band costs
  * O(matching files) of data I/O, never a table rewrite — so the
  * pruned/full ratio should widen with the table while the pruned wall
  * tracks the BAND, not the corpus.
  */
object MergeSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def sec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = java.nio.file.Files.createTempDirectory("graft_msoak_")
    val orders = Tables.orders(spark, sfDir)
    val nRows = orders.count()
    // one contiguous ~0.1%-of-keyspace band repriced + 5 inserts beyond
    // every file's range (the insert-only degenerate rides along)
    val maxKey = orders.agg(max("o_orderkey")).first().getLong(0)
    val bandLo = maxKey / 2
    val bandHi = bandLo + math.max(1000L, maxKey / 1000L)
    def changesOf(src: org.apache.spark.sql.DataFrame) = {
      val repriced = src.filter(col("o_orderkey").between(bandLo, bandHi))
        .withColumn("o_totalprice",
          (col("o_totalprice").cast(DecimalType(12, 2)) + 500)
            .cast("double"))
      val inserts = src.limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + lit(maxKey) * 2 + 1)
      repriced.unionByName(inserts)
    }
    val laid = orders.repartitionByRange(
        Snapshot.derivedCommitFiles(nRows), col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")

    // ---- leg A: stats-backed table, file-granular merge ----
    val tA = s"$base/pruned"
    val (_, commitA) = sec(Snapshot.commitWithStats(laid, tA, Seq("o_orderkey")))
    val changes = changesOf(orders).cache()
    val nChanges = changes.count()
    val (vA, mergeA) = sec(Snapshot.mergeCommit(spark, tA, changes, "o_orderkey"))
    val mf = Snapshot.manifestFiles(spark, tA, vA).get
    val carried = mf.count(!_.contains(s"/v=$vA/"))
    val rewritten = mf.length - carried

    // ---- leg B: stats-less table, full-rewrite merge (the A/B) ----
    val tB = s"$base/full"
    val (_, commitB) = sec(Snapshot.commit(laid, tB))
    val (_, mergeB) = sec(Snapshot.mergeCommit(spark, tB, changes, "o_orderkey"))

    // ---- value cross-check: both paths read as the same table ----
    def digest(root: String) = Snapshot.readCurrent(spark, root)
      .agg(count(lit(1)), sum(col("o_orderkey")),
        graft.functions.Exact.dsum(col("o_totalprice")))
      .first()
    val (dA, dB) = (digest(tA), digest(tB))
    require(dA == dB, s"pruned/full digests diverge: $dA vs $dB")

    println(f"[msoak] sfDir=$sfDir rows=$nRows changes=$nChanges " +
      f"band=[$bandLo,$bandHi]")
    println(f"[msoak] layout_commit=$commitA%.2f s (full-path commit " +
      f"$commitB%.2f s)")
    println(f"[msoak] pruned_merge=$mergeA%.2f s rewritten=$rewritten " +
      f"carried=$carried of ${mf.length} files")
    println(f"[msoak] full_merge=$mergeB%.2f s ratio=${mergeB / mergeA}%.1f x")
    spark.stop()
  }
}
