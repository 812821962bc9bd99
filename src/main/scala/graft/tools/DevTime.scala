package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway micro-bench (dev only). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[devtime] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  n=$n")
    }
    for (parts <- Seq("32", "8", "4", "8", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"x12d parts=$parts") {
        graft.streaming.Streaming.streamStreamJoin(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
