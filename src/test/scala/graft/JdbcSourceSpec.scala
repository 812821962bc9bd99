package graft

import graft.sources.JdbcSource
import org.apache.spark.sql.functions._

/** O1 JDBC source against embedded Derby: values survive the roundtrip,
  * the scan is sharded, and predicates reach the generated SQL. */
class JdbcSourceSpec extends SparkSuite {

  test("parquet -> Derby -> sharded JDBC scan roundtrips the values") {
    val got = JdbcSource.jdbcRoundtrip(spark, sf).collect()
    val want = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_regionkey") <= 2)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), min(col("n_nationkey")).as("min_key"),
        min(col("n_name")).as("first_name"))
      .orderBy("n_regionkey").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("JDBC scan shards into range partitions and pushes filters down") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc_").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", JdbcSource.DriverClass)
    props.setProperty("createTableColumnTypes",
      "n_name VARCHAR(64)")
    spark.read.parquet(s"$sf/nation.parquet")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).jdbc(url, "nation", props)

    val scan = JdbcSource.scanSharded(spark, url)
      .filter(col("n_regionkey") <= 2)
      .select("n_nationkey", "n_regionkey")
    assert(scan.rdd.getNumPartitions == 4, "expected 4 JDBC range shards")
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("JDBCRelation"), s"not a JDBC scan:\n$p")
    assert(p.contains("numPartitions=4"), s"sharding missing from plan:\n$p")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(n_regionkey,2"),
      s"predicate not pushed into JDBC source:\n$p")
  }
}
