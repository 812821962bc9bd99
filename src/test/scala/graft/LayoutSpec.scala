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
  test("z-order layout gives two-dimensional file skipping") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
    val nFiles = 16
    val zOut = java.nio.file.Files.createTempDirectory("graft_z_").toString
    Layout.zorderWrite(src, zOut, "l_partkey", "l_suppkey", nFiles)
    // baseline: clustered on an UNRELATED key (sorted ingest order - the
    // layout a pipeline gets by default)
    val linOut = java.nio.file.Files.createTempDirectory("graft_lin_").toString
    src.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linOut)

    // per-file (min, max) boxes over both filter dimensions - the stats
    // any skipping reader consults
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val (pMax, sMax) = {
      val r = src.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    // a selective 2-D query box (~quarter of each dimension)
    val (pLo, pHi) = (1L, pMax / 4)
    val (sLo, sHi) = (1L, sMax / 4)
    def touched(bs: Array[(Long, Long, Long, Long)]): Int =
      bs.count { case (plo, phi, slo, shi) =>
        plo <= pHi && phi >= pLo && slo <= sHi && shi >= sLo }

    val zT = touched(boxes(zOut))
    val linT = touched(boxes(linOut))
    assert(linT >= nFiles - 1,
      s"unrelated-key layout should leave ~every file matching, got $linT")
    assert(zT * 2 < linT,
      s"z-order should skip most files: touched $zT of $nFiles vs $linT")
    // and the layout loses no rows
    assert(spark.read.parquet(zOut).count() == src.count())
  }

}
