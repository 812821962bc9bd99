package graft

import graft.operators.Etl
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** O5/O11 storage policy (reference `server.py:49-50,135-136`): per-write
  * Hadoop conf must reach the physical writer. `dfs.*` keys are inert on
  * the local FS, so the observable proof uses `parquet.block.size`
  * through the same option channel — if the row-group size lands, the
  * replication/blocksize keys land on HDFS too. */
class StoragePolicySpec extends SparkSuite {

  private def rowGroups(dir: String): Int = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty, s"no parquet part files under $dir")
    files.map { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try rd.getFooter.getBlocks.size
      finally rd.close()
    }.sum
  }

  test("per-write options reach the parquet writer's Hadoop conf") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet").coalesce(1)
    val defDir = java.nio.file.Files.createTempDirectory("graft_pol_def_").toString
    val tinyDir = java.nio.file.Files.createTempDirectory("graft_pol_tiny_").toString
    Etl.writeWithStoragePolicy(df, defDir, Etl.MainFilePolicy)
    Etl.writeWithStoragePolicy(df, tinyDir,
      Etl.MainFilePolicy ++ Map(
        "parquet.block.size" -> "16384", "parquet.page.size" -> "4096"))
    val (defRg, tinyRg) = (rowGroups(defDir), rowGroups(tinyDir))
    assert(defRg == 1, s"default write should be one row group, got $defRg")
    assert(tinyRg > defRg,
      s"16 KiB parquet.block.size should split row groups ($tinyRg vs $defRg) " +
        "— per-write conf did not reach the writer")
  }

  test("compaction collapses a many-file directory, preserving rows") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    // simulate 5 incremental batches → many small files
    for (i <- 0 until 5)
      df.filter(col("l_orderkey") % 5 === i).repartition(8)
        .write.mode("append").parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 20, s"expected many small files, got $before")
    val rows = spark.read.parquet(dir).count()
    val sum = spark.read.parquet(dir)
      .agg(graft.functions.Exact.dsum(col("l_extendedprice"))).head().getDouble(0)
    val after = Etl.compactDir(spark, dir)
    assert(after < before / 2, s"compaction ineffective: $before -> $after")
    assert(spark.read.parquet(dir).count() == rows)
    val sum2 = spark.read.parquet(dir)
      .agg(graft.functions.Exact.dsum(col("l_extendedprice"))).head().getDouble(0)
    assert(sum == sum2, "compaction must preserve content exactly")
  }

  test("dfs replication/blocksize keys merge into the per-write conf") {
    // The exact channel DataFrameWriter uses for file sinks: any option
    // is merged into that write's Hadoop Configuration. On HDFS these
    // two keys drive block placement (reference: repl 2 main / 1
    // partitions, 1 MiB blocks).
    val conf = spark.sessionState.newHadoopConfWithOptions(Etl.MainFilePolicy)
    assert(conf.get("dfs.replication") == "2")
    assert(conf.get("dfs.blocksize") == "1048576")
    val pconf = spark.sessionState.newHadoopConfWithOptions(Etl.PartitionPolicy)
    assert(pconf.get("dfs.replication") == "1")
  }
}
