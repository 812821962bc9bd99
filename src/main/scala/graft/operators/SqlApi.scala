package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: the engine's capabilities are equally reachable as
  * ANSI SQL over registered views (`spark.sql`). The flagship proof is a
  * TPC-H Q3-shaped query whose text is BYTE-IDENTICAL between Spark and
  * the DuckDB oracle — same decimal-exact arithmetic conventions, same
  * result hash.
  */
object SqlApi {

  /** Shared ANSI text (runs unmodified on Spark SQL and DuckDB). */
  val q3Sql: String =
    """SELECT o_orderkey,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |            (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-01-01'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  def tpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(q3Sql)
  }

  /** TPC-H Q6 shape (the forecast-revenue-change scan-heavy query):
    * single-table selective scan + decimal-exact product aggregate —
    * the query class where pushdown + vectorized scan IS the plan.
    * Shared ANSI text. */
  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |            CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN CAST(0.03 AS DECIMAL(12,2))
      |                     AND CAST(0.07 AS DECIMAL(12,2))
      |  AND l_quantity < 24""".stripMargin

  def tpchQ6(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.table(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(q6Sql)
  }

  /** TPC-H Q10 shape (returned-item reporting): 4-table join, grouped
    * decimal-exact revenue, top-20 by revenue with a total tiebreak.
    * Shared ANSI text. */
  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |            (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  def tpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(q10Sql)
  }

  /** TPC-H Q1 shape (the pricing-summary report — THE canonical
    * scan+aggregate benchmark query): one full-table scan, grouped
    * decimal-exact sums/averages over derived pricing expressions.
    * Averages divide the exact decimal sum by the row count in DOUBLE
    * (both engines perform the identical double division, so the
    * result hashes stably — AVG() over DECIMAL has engine-specific
    * result scales). Shared ANSI text. */
  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |            (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |            (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) *
      |            (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-08-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def tpchQ1(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.table(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(q1Sql)
  }

  /** TPC-H Q18 shape (large-volume customers): HAVING subquery over a
    * grouped sum feeding a 3-table join — the group-then-semijoin plan
    * where Spark's AQE decides the probe side at runtime. Threshold 250
    * selects the top ~1-2% of orders on this data (the spec's >300 at
    * its quantity distribution). Shared ANSI text. */
  val q18Sql: String =
    """SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
      |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin

  def tpchQ18(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(q18Sql)
  }

  /** TPC-H Q5 (local supplier volume): the 6-table snowflake join with
    * the c_nationkey = s_nationkey correlation — the canonical
    * join-ORDER stress query (the region/nation dims must broadcast
    * and the customer⋈supplier correlation must ride the fact join,
    * not a cross product). Decimal-exact revenue. Shared ANSI text. */
  val q5Sql: String =
    """SELECT n_name,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |            (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  def tpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach { t =>
        Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
      }
    spark.sql(q5Sql)
  }

  /** TPC-H Q4 SHAPE (order priority checking): EXISTS subquery that
    * Catalyst decorrelates into a LEFT SEMI join on the fact table —
    * never a per-order probe. The spec's commit-vs-receipt lateness
    * predicate uses columns this fixture lacks; shipped-after-order
    * (`l_shipdate > o_orderdate`, a CORRELATED column compare) keeps
    * the identical decorrelation shape. Shared ANSI text. */
  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def tpchQ4(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders", "lineitem").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(q4Sql)
  }

  /** Correlated scalar subquery (decorrelated by Catalyst into an
    * aggregate + join — never a per-row re-execution). Shared ANSI text. */
  val correlatedSql: String =
    """SELECT o_orderkey, o_orderstatus
      |FROM orders
      |WHERE (SELECT COUNT(*) FROM lineitem
      |       WHERE l_orderkey = o_orderkey) >= 6
      |ORDER BY o_orderkey""".stripMargin

  def correlatedSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders", "lineitem").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(correlatedSql)
  }

  /** Explicit GROUPING SETS (the general form rollup/cube compile to),
    * with GROUPING() disambiguating the all-rows from the null-key
    * stratum. Shared ANSI text. */
  val groupingSetsSql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |       COALESCE(l_linestatus, '(all)') AS linestatus,
      |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |                        (l_returnflag, l_linestatus))
      |ORDER BY returnflag, linestatus, g_flag, g_status""".stripMargin

  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.table(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(groupingSetsSql)
  }
}
