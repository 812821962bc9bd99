package graft

import graft.functions.VectorOps
import graft.plans.QuantizedDot
import org.apache.spark.sql.functions._

/** Pins the native codegen'd [[QuantizedDot]] expression to the
  * composed higher-order form it replaces — over every fixture vector
  * pair actually scored, plus adversarial values. */
class QuantizedDotSpec extends SparkSuite {

  test("fused expression equals quantize+dotQ over all fixture pairs") {
    QuantizedDot.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val diff = e.crossJoin(q)
      .select(
        expr("quantized_dot(qv, embedding)").as("fused"),
        VectorOps.dotQ(VectorOps.quantize(col("qv")),
          VectorOps.quantize(col("embedding"))).as("hof"))
      .filter(col("fused") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("fused expression handles negatives, zeros, and interpreted eval") {
    QuantizedDot.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(-0.5f, 0.0f, 1.25f), Array(0.5f, -2.0f, 4.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    val rows = df.select(expr("quantized_dot(a, b)")).collect()
    assert(rows(0).getLong(0) ==
      (-500000L * 500000L) + 0L + (1250000L * 4000000L))
    assert(rows(1).getLong(0) == 0L)
    // interpreted path (no codegen) must agree
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val interp = QuantizedDot(
      Literal.create(Array(-0.5f, 0.0f, 1.25f), ArrayType(FloatType)),
      Literal.create(Array(0.5f, -2.0f, 4.0f), ArrayType(FloatType)))
      .eval(null).asInstanceOf[Long]
    assert(interp == rows(0).getLong(0))
  }
}
