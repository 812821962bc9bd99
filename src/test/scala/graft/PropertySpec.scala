package graft

import graft.functions.Exact
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): results must be independent of
  * physical layout — the core 100 TB guarantee that decimal-exact
  * aggregation buys us. (Plain ScalaCheck generators with a fixed seed;
  * no scalatest bridge in the offline dep cache.)
  */
class PropertySpec extends SparkSuite
  with org.scalatest.BeforeAndAfterAll {

  // The cached scan must not leak into other suites' plans (Spark's
  // cache manager substitutes InMemoryTableScan by plan match, which
  // would defeat PlanSpec's pushdown assertions).
  override def afterAll(): Unit = {
    li.unpersist(blocking = true)
    super.afterAll()
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private lazy val li =
    spark.read.parquet(s"$sf/lineitem.parquet").cache()

  test("decimal-exact filtered sum is invariant under repartitioning") {
    samples(Gen.choose(1000.0, 100000.0), 8).foreach { th =>
      val base = li.filter(col("l_extendedprice") > th)
      val a = base.agg(Exact.dsum(col("l_extendedprice"))).head().get(0)
      val b = base.repartition(17)
        .agg(Exact.dsum(col("l_extendedprice"))).head().get(0)
      val c = base.repartition(3, col("l_suppkey"))
        .agg(Exact.dsum(col("l_extendedprice"))).head().get(0)
      assert(a == b && b == c, s"threshold $th broke layout invariance")
    }
  }

  test("salted join equals plain join for any salt count") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    samples(Gen.choose(1, 12), 4).foreach { n =>
      assert(Layout.saltedJoin(li, o, "l_orderkey", "o_orderkey", n).count()
        == plain, s"salt count $n broke join equivalence")
    }
  }

  test("truncating avg equals filter-then-avg for every partition key") {
    val keys = li.select("l_returnflag").distinct()
      .collect().map(_.getString(0))
    keys.foreach { k =>
      val direct = li.filter(col("l_returnflag") === k)
        .agg(Exact.avgFloorLong(col("l_extendedprice"))).head().getLong(0)
      val viaOp = graft.operators.Etl.prunedAvg(spark, sf, k).head().getLong(0)
      assert(direct == viaOp)
    }
  }
  test("every query is invariant to input sharding and row order") {
    // The determinism contract at the physical-data level: re-shard
    // every fixture table into a different file count with a different
    // row order, and every declared query must return IDENTICAL rows.
    // This is what makes results reproducible across cluster sizes and
    // ingest layouts at 100 TB. Excluded by design: o13 (filesystem
    // metadata IS layout), x05d (GK sketch is merge-order-dependent —
    // the documented reason it is rows-only in the driver gate), and
    // the readStream-based queries (the file-stream source addresses
    // the events table by its exact fixture file name via
    // pathGlobFilter, which a re-sharded DIRECTORY copy cannot satisfy;
    // their value determinism is covered by the batch-equivalence
    // oracles and the batch twins x12c's SQL oracle / x16b, which run
    // here).
    val dirPath = java.nio.file.Files.createTempDirectory("graft_shard_")
    val dir = dirPath.toString
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tables = new java.io.File(sf).list().filter(_.endsWith(".parquet"))
      tables.foreach { t =>
        spark.read.parquet(s"$sf/$t")
          .repartition(7) // round-robin: different sharding AND row order
          .write.mode("overwrite").parquet(s"$dir/$t")
      }
      val skip = Set("o13_block_locations", "x05d_approx_quantiles",
        // readStream/pathGlobFilter-based (see header comment):
        "x12a_stream_tumbling", "x12b_stream_sliding", "x12c_stream_static",
        "x12d_stream_stream", "x12e_stream_outer", "x12f_chained_stateful",
        "x13a_stream_dedup", "x13b_sessionize",
        "x13c_stateful_stats", "x13d_active_hours", "x13e_value_state")
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
           if !skip(name)) {
        val a = fn(spark, sf).collect().map(_.toSeq).toSeq
        val b = fn(spark, dir).collect().map(_.toSeq).toSeq
        assert(a == b, s"$name differs across input sharding")
      }
    } finally { // don't leak a full fixture copy per run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

}
