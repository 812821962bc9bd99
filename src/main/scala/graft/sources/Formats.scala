package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-format source/sink surface (beyond the reference's
  * parquet-only pipeline): CSV, JSON, ORC, and XML writers/readers with the
  * same DataFrame semantics. A user switching from the reference gets
  * interchange formats (CSV/JSON for ingest/export boundaries) and ORC
  * as the alternative columnar store — all partition-parallel, all
  * behind the same declarative plan (pushdown/pruning apply to ORC like
  * parquet; CSV/JSON scan costs are why they're boundaries, not stores).
  */
object Formats {

  /** Round-trip the ETL extract through CSV, JSON, and ORC and prove all
    * three preserve the data: per-format per-flag row counts and exact
    * decimal sums, stacked into one comparable result. (Doubles survive
    * textual round-trips — Spark emits shortest-roundtrip literals.)
    */
  def roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.operators.Etl.extractUnsorted(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    val dir = graft.util.Scratch.dir("graft_formats_")

    // Size the writer task count to the DATA, not the shuffle width —
    // and size it for the least-splittable format in the fan-out: XML
    // reads whole files (one file = one read task), so file size IS the
    // read-side parallelism unit. Derived from the SOURCE table's leaf
    // bytes (fs metadata — r14 dropped the extra full extract pass a
    // row-count probe cost here; at ~120 B/row of parquet the old
    // ~250k-rows/file rule is ~8 MB of source bytes per file, and the
    // extract's ~50% selectivity only halves file sizes, the safe
    // direction for the unsplittable XML read). Floor 4 avoids
    // single-file sinks at toy SF, cap 32 = local core count (a
    // cluster would cap at its width). repartition, NOT coalesce: the
    // extract's width is venue-dependent (a broadcast join rides the
    // scan width — 1-2 partitions at fixture scale), and coalesce can
    // only narrow. The measured cost of widening here was a 539 MB
    // single XML file whose unsplittable read ran one-task serial:
    // 8.6 s where 12-wide parallel parse takes <2 s (sf1).
    val srcBytes = {
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/lineitem.parquet")
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
      catch { case _: java.io.FileNotFoundException => 0L }
    }
    val nFiles =
      math.max(4L, math.min(32L, (srcBytes + (8L << 20) - 1) / (8L << 20)))
        .toInt
    // Cache ABOVE the repartition, so the exchange runs once: four
    // sinks consume the same 12-or-so in-memory partitions instead of
    // each replaying cache-scan + 200 MB shuffle (measured 3× that
    // cost at sf1 with the cache below the exchange).
    val w = base.repartition(nFiles).cache()
    // The first write materializes the cache; the remaining three are
    // INDEPENDENT jobs over the now-cached partitions, so they run
    // concurrently from a small thread pool (guide §2.6: overlap
    // independent jobs — each sink's straggling tail backfills with the
    // next sink's tasks instead of idling the cores). Format writers
    // are separate committers on separate directories; results are
    // unchanged, only the idle tail goes away (measured r14 at sf0.1:
    // the three overlapped writes take ~max instead of ~sum).
    w.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val writes = Seq(
        scala.concurrent.Future {
          w.write.mode("overwrite").json(s"$dir/json") },
        scala.concurrent.Future {
          w.write.mode("overwrite").orc(s"$dir/orc") },
        // XML is a native data source since Spark 4 — no external module.
        scala.concurrent.Future {
          w.write.mode("overwrite").option("rowTag", "row").xml(s"$dir/xml") })
      writes.foreach(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration(10, "min")))
    } finally pool.shutdown()

    w.unpersist() // downstream reads come from the written files

    val csv = spark.read.option("header", "true")
      .schema(base.schema).csv(s"$dir/csv")
    val json = spark.read.schema(base.schema).json(s"$dir/json")
    val orc = spark.read.orc(s"$dir/orc")
    val xml = spark.read.option("rowTag", "row")
      .schema(base.schema).xml(s"$dir/xml")

    Seq("csv" -> csv, "json" -> json, "orc" -> orc, "xml" -> xml)
      .map { case (fmt, df) =>
        df.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            graft.functions.Exact.dsum(col("l_extendedprice")).as("sum_price"))
          .withColumn("format", lit(fmt))
      }
      .reduce(_ union _)
      .select("format", "l_returnflag", "n", "sum_price")
      .orderBy("format", "l_returnflag")
  }
}
