package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: split of1's cost into cache materialization, the four
  * format writes, and the four read+aggregate legs at an arbitrary
  * fixture — under Bench's conf (8 MB scan splits) so the phase times
  * decompose the bench line, not a different venue. */
object FormatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Any): Unit = {
      val s = System.nanoTime
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime - s) / 1e9}%8.2f s ($r)")
    }
    val base = graft.operators.Etl.extractUnsorted(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .cache()
    t("cache materialize (count)") { base.count() }
    val out = java.nio.file.Files.createTempDirectory("graft_fmtprobe_").toString
    val w = base.repartition(12)
    t("csv write (12)") {
      w.write.mode("overwrite").option("header", "true").csv(s"$out/csv") }
    t("json write (12)") { w.write.mode("overwrite").json(s"$out/json") }
    t("orc write (12)") { w.write.mode("overwrite").orc(s"$out/orc") }
    t("xml write (12)") {
      w.write.mode("overwrite").option("rowTag", "row").xml(s"$out/xml") }
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(count(lit(1)), graft.functions.Exact.dsum(col("l_extendedprice")))
        .collect().length
    t("csv read+agg") {
      agg(spark.read.option("header", "true").schema(base.schema).csv(s"$out/csv")) }
    t("json read+agg") { agg(spark.read.schema(base.schema).json(s"$out/json")) }
    t("orc read+agg") { agg(spark.read.orc(s"$out/orc")) }
    t("xml read+agg") {
      agg(spark.read.option("rowTag", "row").schema(base.schema).xml(s"$out/xml")) }
    spark.stop()
  }
}
