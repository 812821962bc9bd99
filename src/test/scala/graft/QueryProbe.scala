package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic runner: time one `SparkEntry.queries` entry against a
  * fixture dir and print its row count — the per-query drill-down the
  * soak analyses in BENCH_NOTES use (`Test/runMain graft.QueryProbe
  * <query> <sfDir> [reps]`). Counting instead of dumping keeps the
  * probe free of sink cost, so the number isolates the operator. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name rep$r: $n%d rows in $sec%.2f s")
    }
    spark.stop()
  }
}
