package graft

import graft.operators.Snapshot
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only one-off probe (test scope): decompose the pruned
  * mergeCommit's wall at a given scale — stats read, touched decision,
  * survivors anti-join, the width-coalesced write, and the manifest
  * tail are timed separately so a surprising merge wall is attributable
  * to ONE piece. Mirrors MergeSoak's leg-A setup exactly.
  *
  *   tools/runmain.sh graft.MergeProbe <sfDir> [width]
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/sf10")
    val forceWidth = args.lift(1).map(_.toInt)
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
    def sec[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mprobe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("graft_mprobe_")
    val orders = Tables.orders(spark, sfDir)
    val nRows = orders.count()
    val maxKey = orders.agg(max("o_orderkey")).first().getLong(0)
    val qs = orders.stat.approxQuantile("o_orderkey",
      Array(0.5, 0.501), 0.00005)
    val (bandLo, bandHi) = (qs(0).toLong, math.max(qs(1).toLong, qs(0).toLong + 1))
    val changes = {
      val repriced = orders.filter(col("o_orderkey").between(bandLo, bandHi))
        .withColumn("o_totalprice",
          (col("o_totalprice").cast(DecimalType(12, 2)) + 500).cast("double"))
      repriced.unionByName(orders.limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + lit(maxKey) * 2 + 1))
    }.cache()
    println(s"[mprobe] rows=$nRows changes=${changes.count()}")
    val laid = orders.repartitionByRange(
        Snapshot.derivedCommitFiles(nRows), col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    val tA = s"$base/t"
    sec("layout_commit")(Snapshot.commitWithStats(laid, tA, Seq("o_orderkey")))

    // ---- decomposed pruned merge (mirrors mergeCommit's prunable leg)
    val stats = sec("stats_read")(
      spark.read.parquet(s"$tA/_stats/v=1")
        .select(col("file"), col("min_o_orderkey").as("kmin"),
          col("max_o_orderkey").as("kmax")))
    val touched = sec("touched_bnlj")(
      changes.select(col("o_orderkey").as("k")).filter(col("k").isNotNull)
        .distinct()
        .join(broadcast(stats),
          col("k") >= col("kmin") && col("k") <= col("kmax"), "inner")
        .select("file").distinct().collect().map(_.getString(0)).toSeq)
    println(s"[mprobe] touched=${touched.size} files")
    val survivors = spark.read.parquet(touched: _*)
      .join(changes.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    val nSurv = sec("survivors_count")(survivors.count())
    println(s"[mprobe] survivors=$nSurv")
    val merged = changes.unionByName(survivors)
    sec("merged_count")(merged.count())
    val width = forceWidth.getOrElse(1)
    sec(s"write_coalesce_$width")(
      merged.coalesce(width).write.mode("overwrite").parquet(s"$base/out1"))
    sec(s"write_nocoalesce")(
      merged.write.mode("overwrite").parquet(s"$base/out2"))
    val ck = sec("checkpoint_merged")(merged.localCheckpoint())
    sec(s"write_ck_coalesce_$width")(
      ck.coalesce(width).write.mode("overwrite").parquet(s"$base/out3"))
    spark.stop()
    // scratch under /tmp, removed by the soak runner
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
  }
}
