package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe-self-load profiler (test scope, not product surface):
  * reproduce Bench's calibration probe around a heavy query and print
  * per-probe GC / JIT / codegen deltas, to attribute the documented
  * ~1.0-1.3 s mid-run probe elevation (BENCH_NOTES band) to a
  * mechanism. Bench's END probes are median-of-3 while the TIMELINE
  * probes are single-shot taken immediately after a query — if the
  * first post-query probe is slow and the train decays, the band is a
  * per-query transient; if all stay high, it is sustained state
  * (code-cache, heap residency, external load).
  *
  *   sbt "Test/runMain graft.ProbeProfile [sfDir] [queryName]"
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val qname = args.lift(1).getOrElse("x09e_ngram_jaccard")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // A/B the async-cleanup hypothesis: with referenceTracking off,
      // the ContextCleaner never runs, so if the post-query probe
      // elevation vanishes the mechanism is the cleaner's trailing
      // shuffle/broadcast deletion work.
      .config("spark.cleaner.referenceTracking",
        sys.env.getOrElse("PROBE_CLEANER", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.toSeq
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    def gcMs(): Long = gcBeans.map(_.getCollectionTime).sum
    def jitMs(): Long = jit.getTotalCompilationTime
    // Spark's codegen metrics: source-compile time and generated-class
    // load counts — a probe that recompiles its generated code shows up
    // here; one that re-JITs already-loaded classes shows in jitMs.
    // METRIC_COMPILATION_TIME records each sample ALREADY in
    // milliseconds (spark-catalyst 4.1.2: nanoTime delta / 1e6 before
    // Histogram.update) — no unit conversion. Caveat: the histogram is
    // a decaying SAMPLED reservoir, not a monotonic counter, so a
    // delta is approximate and can be negative/lossy when old samples
    // age out; getCount (monotonic #compilations) disambiguates "new
    // compile happened" from reservoir churn.
    def codegenMs(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    def codegenCount(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount

    def sec[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probeOnce(tag: String): Double = {
      val (g0, j0, c0, n0) = (gcMs(), jitMs(), codegenMs(), codegenCount())
      val t = sec(spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("id % 99991 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .selectExpr("count(*)", "sum(k)").collect())
      println(f"[probe] $tag%-12s ${t}%6.3f s  gc=+${gcMs() - g0}%4d ms" +
        f"  jit=+${jitMs() - j0}%5d ms  codegen=+${codegenMs() - c0}%4d ms" +
        f" (n=+${codegenCount() - n0}, reservoir-approx)")
      t
    }

    println(s"[probe] === baseline train (idle JVM) ===")
    (1 to 5).foreach(i => probeOnce(s"idle-$i"))
    println(s"[probe] === heavy query: $qname ===")
    val fn = SparkEntry.queries(qname)
    val tq = sec(fn(spark, sfDir).count())
    println(f"[probe] query $qname: $tq%.2f s")
    println(s"[probe] === post-query train ===")
    (1 to 6).foreach(i => probeOnce(s"post-$i"))
    println(s"[probe] === second heavy run + train ===")
    val tq2 = sec(fn(spark, sfDir).count())
    println(f"[probe] query $qname (warm): $tq2%.2f s")
    (1 to 6).foreach(i => probeOnce(s"post2-$i"))
    spark.stop()
  }
}
