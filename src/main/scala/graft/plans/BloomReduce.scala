package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's native bloom-filter expression pair —
  * `BloomFilterAggregate` (a `TypedImperativeAggregate` building an
  * `org.apache.spark.util.sketch.BloomFilter` with map-side partial
  * merge) and `BloomFilterMightContain` (a codegen'd probe predicate).
  *
  * Spark ships both for its own runtime-filter injection
  * (`InjectRuntimeFilter`) but registers neither as a SQL-callable
  * function; injection is also gated on size thresholds
  * (`spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
  * defaults to 10 GB) and only fires on shuffle-join shapes the rule
  * recognizes. Registering the pair makes the semi-join reduction an
  * EXPLICIT, certifiable library operator ([[graft.operators.Layout
  * .bloomReducedJoin]]) that works at any scale and on any join shape,
  * with the exact same machinery the optimizer would inject.
  *
  * `BloomFilterMightContain` requires its sketch input to be foldable
  * or a scalar subquery (never a per-row column), so the operator feeds
  * it an uncorrelated scalar subquery — Spark executes that once and
  * embeds the result, which is precisely `InjectRuntimeFilter`'s own
  * shape. Both sides hash through the builtin `xxhash64` (the sketch
  * stores 64-bit hashes, not values).
  */
object BloomReduce {
  val aggName = "graft_bloom_agg"
  val probeName = "graft_bloom_probe"

  private def aggBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c)            => new BloomFilterAggregate(c)
    case Seq(c, est)       => new BloomFilterAggregate(c, est)
    case Seq(c, est, bits) => new BloomFilterAggregate(c, est, bits)
    case _ => throw new IllegalArgumentException(
      s"$aggName takes (xxhash64_value[, est_items[, num_bits]])")
  }

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      aggName, aggBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      probeName, exprs => BloomFilterMightContain(exprs.head, exprs(1)),
      "scala_udf")
  }
}
