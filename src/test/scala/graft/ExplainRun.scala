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
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // trailing `key=value` args become session confs (A/B switches,
    // e.g. graft.neardup.strategy=hash)
    args.drop(2).filter(_.contains('=')).foreach { a =>
      val Array(k, v) = a.split("=", 2)
      println(s"[explain] conf $k=$v")
      spark.conf.set(k, v)
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val ioR = new java.util.concurrent.atomic.AtomicLong
    val ioW = new java.util.concurrent.atomic.AtomicLong
    val ioS = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            ioR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            ioW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ioS.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
            cpuNs.addAndGet(m.executorCpuTime)
            runNs.addAndGet(m.executorRunTime * 1000000L)
          }
        }
      })
    // Bench's calibration probe, before and after: a measurement with
    // elevated probes is a contention wave, not the query's cost.
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("id % 99991 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .selectExpr("count(*)", "sum(k)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val pBefore = probe()
    // Time CONSTRUCTION + action together: memoized builders (the x09
    // family) materialize their staged relations eagerly inside the
    // queries() call, so timing only the count under-reports them.
    val t0 = System.nanoTime()
    // the same venue-side derived shuffle width Bench applies
    // (SPARK_GRAFT_SHUFFLE still wins when set — A/B override)
    if (sys.env.get("SPARK_GRAFT_SHUFFLE").isEmpty)
      SparkEntry.shuffleWidthHint(qname, spark, sfDir)
        .foreach { w =>
          println(s"[explain] derived shuffle width: $w")
          spark.conf.set("spark.sql.shuffle.partitions", w)
        }
    val df = SparkEntry.queries(qname)(spark, sfDir)
    val n = df.count()
    val dt = (System.nanoTime() - t0) / 1e9
    val pAfter = probe()
    // one-time infra builds that ran INSIDE this leg (same ledger the
    // bench drains per query) — a solo-cold wall that conflates a
    // staged-index/memo build with the operator decomposes right here
    val builds = graft.util.SessionMemo.drainBuildLog().filter(_._2 >= 0.05)
      .map { case (k, s) => f"${k.split('|').head}=$s%.1f" }.mkString(" ")
    println(f"[explain] $qname rows=$n time=$dt%.2f s " +
      f"probes=$pBefore%.2f/$pAfter%.2f " +
      f"shufr=${ioR.get / 1e6}%.0fMB shufw=${ioW.get / 1e6}%.0fMB " +
      f"spill=${ioS.get / 1e6}%.0fMB cpu=${cpuNs.get / 1e9}%.0fs " +
      f"run=${runNs.get / 1e9}%.0fs" +
      (if (builds.nonEmpty) s" memo_builds: $builds" else ""))
    // AFTER the action: the adaptive plan is final
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
