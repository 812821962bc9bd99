package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver fixture tables (`TESTDATA.md`) plus a generic
  * JDBC source mirroring the reference's MySQL scan
  * (reference `server.py:29-39`, SURVEY §2.1 O1).
  *
  * Scale notes: all fixture reads are plain parquet scans — Catalyst's
  * `ColumnPruning` / `PushDownPredicates` reach the scan automatically, so
  * callers should express filters/projections declaratively and never
  * pre-materialize. On a real cluster the same code reads
  * `hdfs://…/table.parquet` unchanged (path is config, not code).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects; read it as raw nanos (`nanosAsLong`) and convert to a
    * µs timestamp with integer division (the fixture has no sub-µs digits,
    * and DuckDB reads the same file at µs — so both engines agree).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** O1: JDBC source scan (reference `server.py:29-39` reads MySQL via
    * SQLAlchemy). Fixture runs use parquet; this is the cluster-mode entry
    * for an RDBMS source. Spark pushes predicates and column pruning into
    * the JDBC query; `partitionColumn`/`numPartitions` options shard the
    * scan across executors (the reference reads single-threaded into
    * driver RAM — the anti-pattern this replaces).
    */
  def jdbc(spark: SparkSession, url: String, dbtable: String,
           options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
    options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }
}
