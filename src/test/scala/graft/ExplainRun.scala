package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor (test scope): run one SparkEntry query under
  * the Bench session shape, print the FINAL adaptive plan and wall
  * time. The soak's super-linear diagnosis tool.
  *
  *   sbt "Test/runMain graft.ExplainRun <query> [sfDir]"
  */
object ExplainRun {
  def main(args: Array[String]): Unit = {
    val qname = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    val df = SparkEntry.queries(qname)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[explain] $qname rows=$n time=$dt%.2f s")
    // AFTER the action: the adaptive plan is final
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
