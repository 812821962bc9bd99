package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** X14: typed user-defined aggregates via the public
  * `Aggregator[IN, BUF, OUT]` API (SURVEY §2.4) — the supported way to
  * add custom aggregation to Spark: the buffer is merged map-side
  * (partial aggregation) exactly like builtin aggregates, so a custom
  * aggregate costs one shuffle of per-partition buffers, never of rows.
  */
object TypedAggs {

  /** L2 norm: sqrt of the sum of squares. The buffer (a running sum of
    * squares) is exact for the fixture's integer-valued quantities
    * (< 2^53), so merge order cannot change the result.
    */
  val l2Norm: Aggregator[Double, Double, Double] =
    new Aggregator[Double, Double, Double] {
      override def zero: Double = 0.0
      override def reduce(b: Double, a: Double): Double = b + a * a
      override def merge(b1: Double, b2: Double): Double = b1 + b2
      override def finish(b: Double): Double = math.sqrt(b)
      override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Per-returnflag L2 norm of quantities through the typed UDAF. */
  def l2Query(spark: SparkSession, sfDir: String): DataFrame = {
    val l2 = udaf(l2Norm)
    graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(l2(col("l_quantity")).as("qty_l2norm"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }
}
