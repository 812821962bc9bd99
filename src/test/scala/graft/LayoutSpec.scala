package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {

  test("bucketed tables join without a query-time shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets_")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    Layout.writeBucketed(li, "graft_li_b", s"$wh/li", "l_orderkey", 8)
    Layout.writeBucketed(o, "graft_o_b", s"$wh/o", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_li_b")
        .join(spark.table("graft_o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not re-shuffle the fact side:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not re-shuffle the dim side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_o_b")
    }
  }

  test("salted join is row-equivalent to the plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Layout.saltedJoin(li, o, "l_orderkey", "o_orderkey", 7)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }
}
