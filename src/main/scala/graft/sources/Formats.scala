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
    // Cache the extract: three sinks consume it, and without the cache
    // each write replays the join from the source (3× the scan+shuffle).
    val base = graft.operators.Etl.extractUnsorted(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .cache()
    val dir = java.nio.file.Files.createTempDirectory("graft_formats_").toString

    // Size the writer task count to the data, not the shuffle width: at
    // fixture scale 4 formats × 32 shuffle partitions is 128 writer
    // tasks emitting 128 tiny files — task/commit overhead, not I/O. At
    // 100 TB the same line targets file size (rows/target per file).
    val w = base.coalesce(4)
    w.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    w.write.mode("overwrite").json(s"$dir/json")
    w.write.mode("overwrite").orc(s"$dir/orc")
    // XML is a native data source since Spark 4 — no external module.
    w.write.mode("overwrite").option("rowTag", "row").xml(s"$dir/xml")

    base.unpersist() // downstream reads come from the written files

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
