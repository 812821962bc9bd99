package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: why doesn't the XML read leg of of1 parallelize?
  * Prints the scan's partition count and per-leg timings under
  * different file layouts and maxPartitionBytes. */
object XmlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Any): Unit = {
      val s = System.nanoTime
      val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime - s) / 1e9}%8.2f s ($r)")
    }
    val base = graft.operators.Etl.extractUnsorted(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .cache()
    t("cache") { base.count() }
    val out = java.nio.file.Files.createTempDirectory("graft_xmlprobe_").toString
    t("xml write 16") {
      base.coalesce(16).write.mode("overwrite")
        .option("rowTag", "row").xml(s"$out/xml16") }
    val rd = spark.read.option("rowTag", "row").schema(base.schema)
      .xml(s"$out/xml16")
    println("[probe] xml16 scan partitions = " + rd.rdd.getNumPartitions)
    t("xml16 count") { rd.count() }
    t("xml16 count again") { rd.count() }
    t("xml16 agg") {
      rd.groupBy("l_returnflag").agg(count(lit(1))).collect().length }
    spark.stop()
  }
}
