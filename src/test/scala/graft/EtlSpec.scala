package graft

import graft.operators.{Etl, PartitionCache}
import org.apache.spark.sql.functions._

class EtlSpec extends SparkSuite {

  test("extract respects the exclusive price band and joins every row") {
    val df = Etl.extract(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    val Array(row) = df
      .agg(min("l_extendedprice"), max("l_extendedprice")).collect()
    assert(row.getDouble(0) > 30000.0 && row.getDouble(1) < 80000.0)
    assert(Etl.rowCount(spark, sf).head().getLong(0) == n)
    df.unpersist()
  }

  test("sink roundtrip preserves per-flag counts") {
    val fromSink = Etl.sinkRoundtrip(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Etl.extract(spark, sf).groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromSink == direct)
  }

  test("pruned avg matches an independently computed truncating mean") {
    val got = Etl.prunedAvg(spark, sf, "R").head().getLong(0)
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .select("l_extendedprice").collect().map(_.getDouble(0))
    val expected = math.floor(
      rows.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / rows.length).toLong
    assert(got == expected)
  }

  test("observe() reports in-flight metrics without a second scan") {
    val df = Etl.extractObserved(spark, sf)
    df.collect()
    val m = df.queryExecution.observedMetrics("etl_metrics")
    assert(m.getAs[Long]("rows_out") == Etl.extract(spark, sf).count())
    assert(m.getAs[Double]("sum_price") > 0)
  }

  test("avg over an empty group returns null, not a crash (pinned semantics)") {
    // The reference crashes on an empty county (int(NaN), server.py:128);
    // our engine defines the behavior: SQL-standard NULL.
    val row = Etl.prunedAvg(spark, sf, "Z").head()
    assert(row.isNullAt(0))
  }

  test("partition cache falls back to recreate when the partition is corrupt") {
    val cacheDir =
      java.nio.file.Files.createTempDirectory("graft_corrupt_").toString
    val (v1, s1) = PartitionCache.calcAvg(spark, sf, cacheDir, "A")
    assert(s1 == "create")
    // Corrupt the materialized partition: replace its parquet files with
    // garbage (the reference's DataNode-loss scenario, server.py:118-121).
    val dir = new java.io.File(s"$cacheDir/l_returnflag=A")
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.write(f.toPath, "not a parquet file".getBytes)
    }
    val (v2, s2) = PartitionCache.calcAvg(spark, sf, cacheDir, "A")
    assert(s2 == "recreate", s"expected recreate, got $s2")
    assert(v1 == v2, "recreate must recompute the same value")
    val (_, s3) = PartitionCache.calcAvg(spark, sf, cacheDir, "A")
    assert(s3 == "reuse", "cache must be healthy again after recreate")
  }

  test("upsert merge replaces changed keys and keeps the rest intact") {
    import org.apache.spark.sql.functions._
    val merged = Etl.upsertMerge(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val clean = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.dsum(col("o_totalprice")).as("s"),
        sum((col("o_orderkey") % 10 === 0).cast("long")).as("n_changed"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(merged.keySet == clean.keySet)
    merged.foreach { case (status, (n, sumPrice)) =>
      val (cn, cs, changed) = clean(status)
      assert(n == cn, "merge must not change row counts")
      assert(math.abs(sumPrice - (cs + 1000.0 * changed)) < 1e-6,
        s"$status: each changed key must be repriced exactly once")
    }
  }

  test("partition cache runs create on pass 1 and reuse on pass 2, same values") {
    val rows = PartitionCache.protocolTrace(spark, sf).collect()
    assert(rows.length == 6)
    val byKey = rows.groupBy(_.getString(0))
    byKey.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getString(3)).toSeq == Seq("create", "reuse"))
      assert(sorted.map(_.getLong(2)).distinct.length == 1,
        "create and reuse paths must agree on the value")
    }
  }
}
