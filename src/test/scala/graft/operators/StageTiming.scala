package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev-only stage timer for the x09 first-run cost (test scope):
  * attribute the session's one-time staging (tokenize → classes →
  * grams → strategy probe → pair build) stage by stage.
  *
  *   sbt "Test/runMain graft.operators.StageTiming [sfDir]"
  */
object StageTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    t("docs count")(graft.sources.Tables.documents(spark, sfDir).count())
    t("tokArrShared")(Dedup.tokArrShared(spark, sfDir))
    t("arrClasses")(Dedup.arrClasses(spark, sfDir))
    t("classGrams w2")(Dedup.classGrams(spark, sfDir, 2))
    // CountJoin mass diagnostics: candidate pair volume Σ df² over the
    // kept (sub-ceiling) grams — the hot stage's true input size
    import org.apache.spark.sql.functions._
    val cg = Dedup.classGrams(spark, sfDir, 2)
    t("gram df stats") {
      val dfreq = cg.groupBy("gid").agg(sum("w").as("df"))
      val r = dfreq.agg(count(lit(1)), sum(when(col("df") <= 300, col("df") * col("df"))),
        sum(when(col("df") <= 300, lit(1)))).head()
      println(s"[stage]   grams=${r.getLong(0)} kept=${r.get(2)} sum_df2_kept=${r.get(1)}")
    }
    t("x09e full")(graft.SparkEntry.queries("x09e_ngram_jaccard")(spark, sfDir).count())
    t("x09e warm")(graft.SparkEntry.queries("x09e_ngram_jaccard")(spark, sfDir).count())
    spark.stop()
  }
}
