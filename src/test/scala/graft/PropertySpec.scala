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
}
