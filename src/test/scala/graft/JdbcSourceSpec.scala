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

  test("live MySQL smoke (env-gated: set MYSQL_URL / MYSQL_USER / MYSQL_PASSWORD)") {
    // First contact with the reference's actual source is a CI FLAG,
    // not new code: point MYSQL_URL at any MySQL 8
    // (jdbc:mysql://host:3306/db, Connector/J on the classpath) and
    // this round-trips the fixture's nation table through the server —
    // write, sharded read-back with a pushed predicate, value
    // equality. Without the env (this sandbox has no broker and no
    // connector jar) the test is CANCELED, never silently green.
    val urlOpt = sys.env.get("MYSQL_URL")
    assume(urlOpt.isDefined,
      "no MYSQL_URL in the environment — live-MySQL smoke skipped")
    val url = urlOpt.get
    val props = Map(
      "driver" -> graft.sources.Tables.MySqlDriverClass,
      "user" -> sys.env.getOrElse("MYSQL_USER", "root"),
      "password" -> sys.env.getOrElse("MYSQL_PASSWORD", ""))
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val writer = nation.write.format("jdbc")
      .option("url", url).option("dbtable", "graft_smoke_nation")
    props.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }
      .mode("overwrite").save()
    val back = graft.sources.Tables.jdbc(spark, url, "graft_smoke_nation",
      props ++ Map("partitionColumn" -> "n_nationkey",
        "lowerBound" -> "0", "upperBound" -> "24", "numPartitions" -> "4"))
      .filter(col("n_regionkey") <= 2)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), s"not a JDBC scan:\n$plan")
    assert(plan.contains("PushedFilters"), s"predicate not pushed:\n$plan")
    val expect = nation.filter(col("n_regionkey") <= 2)
      .collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == expect,
      "live MySQL round-trip must return the exact fixture rows")
  }
}
