package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the shuffle/broadcast shape of each query's physical
  * plan — the at-a-glance audit for "did this operator keep its scale
  * shape" (exchanges that appear unexpectedly, single-partition stages,
  * joins that fell off broadcast). Usage:
  *
  *   sbt "runMain graft.PlanAudit <sfDir> [name,name,...]"
  *
  * Counts only — PlanSpec pins the load-bearing assertions; this is the
  * exploratory view over ALL queries. Caveat: plans print BEFORE
  * execution, so under AQE the codegen stars (`*(n)`) are not yet
  * annotated — codegen=0 here means "not finalized", not "interpreted".
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only: Option[Set[String]] =
      args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val p = fn(spark, sfDir).queryExecution.executedPlan.toString
          println(f"$name%-26s shuffle=${count(p, "Exchange hashpartitioning")}%2d " +
            f"single=${count(p, "Exchange SinglePartition")}%2d " +
            f"bcast=${count(p, "BroadcastExchange")}%2d " +
            f"smj=${count(p, "SortMergeJoin")}%2d " +
            f"bhj=${count(p, "BroadcastHashJoin")}%2d " +
            f"codegen=${count(p, "*(")}%2d")
        } catch {
          case e: Throwable =>
            println(f"$name%-26s PLAN FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
