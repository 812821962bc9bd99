package graft

import graft.plans.MinHashAgg
import org.apache.spark.sql.functions._

/** Pins the TypedImperativeAggregate MinHash sketch to the composed
  * 16×min() expression form it replaces. */
class MinHashAggSpec extends SparkSuite {

  test("minhash16 sketch equals sixteen independent min() aggregates") {
    MinHashAgg.register(spark)
    import spark.implicits._
    // Deterministic synthetic (doc, sid) relation with shared ids
    val ds = (for (d <- 0L until 50L; s <- 0L until 40L if (d + s) % 3 != 0)
      yield (d, (d * 7 + s * 13) % 997)).toDF("doc_id", "sid")

    val sketch = ds.groupBy("doc_id")
      .agg(expr("minhash16(sid)").as("mh"))
      .select(col("doc_id") +: (0 until 16).map(i =>
        element_at(col("mh"), i + 1).as(s"mh$i")): _*)

    val composed = ds.groupBy("doc_id").agg(
      min((lit(MinHashAgg.A(0)) * col("sid") + lit(MinHashAgg.B(0)))
        % MinHashAgg.P).as("mh0"),
      (1 until 16).map(i =>
        min((lit(MinHashAgg.A(i)) * col("sid") + lit(MinHashAgg.B(i)))
          % MinHashAgg.P).as(s"mh$i")): _*)

    assert(sketch.except(composed).count() == 0)
    assert(composed.except(sketch).count() == 0)
  }
}
