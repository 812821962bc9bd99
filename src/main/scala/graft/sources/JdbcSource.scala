package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** O1: the JDBC source scan exercised end-to-end against a real RDBMS —
  * embedded Apache Derby, which ships with Spark's jars — mirroring the
  * reference's MySQL extract (reference `server.py:29-39`: SQLAlchemy
  * scan into a single-process DataFrame; the anti-pattern this replaces
  * with a sharded, pushdown-capable distributed scan).
  *
  * The demo loads the `nation` fixture into a Derby table (per-write
  * column types keep strings VARCHAR — Derby's default CLOB mapping
  * cannot be compared/aggregated), then reads it back through
  * [[Tables.jdbc]] with `partitionColumn` sharding so the scan arrives
  * as 4 parallel JDBC partitions, with the filter pushed into the
  * generated SQL (asserted in JdbcSourceSpec). Each call builds its own
  * throwaway database directory, so the query is idempotent.
  */
object JdbcSource {
  val DriverClass = "org.apache.derby.jdbc.EmbeddedDriver"

  /** of3: parquet → Derby → sharded JDBC scan → filtered aggregate.
    * Oracle: the same aggregate over the parquet `nation` table.
    */
  def jdbcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.util.Scratch.dir("graft_jdbc_")
    val url = s"jdbc:derby:$dir/db;create=true"

    val props = new java.util.Properties()
    props.setProperty("driver", DriverClass)
    props.setProperty("createTableColumnTypes",
      "n_name VARCHAR(64)")
    Tables.nation(spark, sfDir)
      .write.mode(SaveMode.Overwrite).jdbc(url, "nation", props)

    // Materialize eagerly (localCheckpoint) so the returned DataFrame no
    // longer depends on the database, then shut the embedded engine down
    // — Derby otherwise keeps every booted database's page cache and
    // lock tables alive for the JVM lifetime.
    val result = scanSharded(spark, url)
      .filter(col("n_regionkey") <= 2)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"),
        min(col("n_nationkey")).as("min_key"),
        min(col("n_name")).as("first_name"))
      .orderBy("n_regionkey")
      .localCheckpoint()
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;shutdown=true")
    catch { case _: java.sql.SQLException => () } // shutdown always throws
    result
  }

  /** The sharded scan itself (also plan-asserted by JdbcSourceSpec):
    * 4 range partitions on the numeric key — each executor opens its own
    * connection and reads one slice, vs the reference's single-threaded
    * full materialization into driver RAM. */
  def scanSharded(spark: SparkSession, url: String): DataFrame =
    Tables.jdbc(spark, url, "nation", Map(
      "driver" -> DriverClass,
      "partitionColumn" -> "n_nationkey",
      "lowerBound" -> "0",
      "upperBound" -> "25",
      "numPartitions" -> "4"))
}
