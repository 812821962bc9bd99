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

  test("MySQL dialect readiness: URL resolves the dialect, quoting and pushdown text are MySQL's") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    // the engine's generated URL alone selects the MySQL dialect —
    // Spark keys dialects on the URL prefix, so every piece of SQL text
    // the source generates (quoting, WHERE, type DDL) is MySQL-form
    // with zero engine code: first contact with a live server is
    // config-only
    val url = graft.sources.Tables.mysqlUrl("mysql", 3306, "testdb")
    assert(url == "jdbc:mysql://mysql:3306/testdb")
    val my = JdbcDialects.get(url)
    val derby = JdbcDialects.get("jdbc:derby:/tmp/db")
    // identifier quoting: backticks vs ANSI double quotes
    assert(my.quoteIdentifier("n_name") == "`n_name`")
    assert(derby.quoteIdentifier("n_name") == "\"n_name\"")
    // pushdown WHERE text: the same predicate compiles to each
    // dialect's SQL — this is the text that travels to the server
    val pred = new Predicate("<=",
      Array(Expressions.column("n_regionkey"), Expressions.literal(2)))
    assert(my.compileExpression(pred).contains("`n_regionkey` <= 2"),
      s"mysql pushdown text: ${my.compileExpression(pred)}")
    assert(derby.compileExpression(pred).contains("\"n_regionkey\" <= 2"),
      s"derby pushdown text: ${derby.compileExpression(pred)}")
    // the wired entry fails FAST naming the missing connector class in
    // this jar-less sandbox (never a silent fallback to another driver)
    val e = intercept[Throwable] {
      graft.sources.Tables.mysql(spark, "mysql", 3306, "testdb",
        "nation", "root", "pw").collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("") + x.getClass.getName)
      .mkString(" ")
    assert(chain.contains("com.mysql"),
      s"expected the missing Connector/J class in the failure: $e")
  }
}
