package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: split x27's cost into the shared pair build, the linked
  * edge fold, and the three rank iterations at an arbitrary fixture. */
object GraphProbe {
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
      println(f"[probe] $label%-28s ${(System.nanoTime - s) / 1e9}%8.2f s ($r)")
    }
    t("tradePairs build+count") {
      graft.operators.Graph.tradePairs(spark, dir).count()
    }
    t("pageRank (edges fold + 3 it)") {
      graft.operators.Graph.pageRank(spark, dir).count()
    }
    t("trustRank (reuses edges)") {
      graft.operators.Graph.trustRank(spark, dir).count()
    }
    t("pageRank again (all cached)") {
      graft.operators.Graph.pageRank(spark, dir).count()
    }
    spark.stop()
  }
}
