package graft.operators

import graft.functions.VectorOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X10: similarity search over the `embeddings` table
  * (`ArrayType(FloatType)`, 64-dim).
  *
  * Two plans for the same query ("top-k nearest by cosine for each query
  * vector"), both over int-quantized vectors (see [[VectorOps]]):
  *  - [[cosineTopK]] — brute force: broadcast the (small) query set and
  *    score every corpus vector with codegen'd higher-order functions.
  *    Exact recall; total cost O(|Q|·N·d), embarrassingly parallel, no
  *    shuffle until the final per-query top-k. Right when |Q| is small
  *    or recall must be 1.0.
  *  - [[annLsh]] — random-hyperplane LSH: each vector gets an 8-bit
  *    bucket signature; candidates are an equi-join on the bucket key,
  *    so the scored pair count drops ~256× and the shuffle is keyed,
  *    not all-pairs. The 100 TB scale path (same structure as an
  *    IVF probe, with deterministic data-independent "centroids").
  *
  * Hyperplane weights are pseudo-random rationals from a fixed LCG
  * formula, used in integer-numerator form so the bucket-sign test is
  * exact integer arithmetic — deterministic and replayable in the DuckDB
  * oracle, no RNG state and no float comparisons anywhere.
  */
object Similarity {
  private val NQueries = 8
  private val Dims = 64

  /** vec_id, float vector, exact integer squared norm — norm and all
    * pair dots use the fused native [[graft.plans.QuantizedDot]]
    * expression (single codegen'd loop, no intermediate arrays);
    * bit-equal to the HOF quantize/dotQ form (QuantizedDotSpec). */
  private def quantized(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.QuantizedDot.register(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("n2", expr("quantized_dot(embedding, embedding)"))
  }

  private def topkOf(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "cosine")
      .orderBy("query_id", "rnk")
  }

  /** Brute-force exact cosine top-k per query vector (vec_id < 8, k=5). */
  def cosineTopK(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val all = quantized(spark, sfDir)
    val q = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"))
    val scored = all.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineFromQ(expr("quantized_dot(q_emb, embedding)"),
          col("q_n2"), col("n2")).as("cosine"))
    topkOf(scored, k)
  }

  /** X9/X10: embedding-cosine near-duplicate pairs — ALL same-bucket
    * pairs (not just the query set) scored with the fused dot and
    * thresholded. This is vector-level corpus dedup: at 100 TB the
    * bucket key partitions the similarity join so each task scores one
    * bucket's O(k²) pairs instead of the corpus's O(N²).
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String,
                       threshold: Double = 0.45): DataFrame = {
    val all = quantized(spark, sfDir).join(bucketsOf(spark, sfDir), "vec_id")
    val a = all.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("n2").as("n2_a"))
    val b = all.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("n2").as("n2_b"))
    a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        VectorOps.cosineFromQ(expr("quantized_dot(emb_a, emb_b)"),
          col("n2_a"), col("n2_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** LSH-bucketed approximate top-k (k=3): sign-of-projection onto 8
    * fixed pseudo-random hyperplanes → bucket key → candidates share the
    * bucket → exact cosine within candidates only.
    *
    * The hyperplane weight for (plane j, dim pos) is
    * `r/1000003 - 0.5` with `r = (1103515245*(j*64+pos)+12345) mod
    * 1000003`; the projection sign is evaluated on the integer numerator
    * `sum(qv * (2r - 1000003))` — exact.
    */
  /** LSH bucket signature per vector: sign of the projection onto 8
    * fixed pseudo-random hyperplanes, evaluated in exact integer
    * arithmetic (weight numerators `2r - 1000003`). */
  private def bucketsOf(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(VectorOps.quantize(col("embedding"))).as(Seq("pos0", "qv")))
      .select(col("vec_id"), (col("pos0") + 1).cast(LongType).as("pos"),
        col("qv"))
    val hyper = spark.range(0, 8).select(col("id").as("j"))
      .crossJoin(spark.range(1, Dims + 1).select(col("id").as("pos")))
      .withColumn("wnum",
        lit(2L) * ((lit(1103515245L) * (col("j") * Dims + col("pos"))
          + lit(12345L)) % lit(1000003L)) - lit(1000003L))
    ex.join(broadcast(hyper), "pos")
      .groupBy("vec_id", "j").agg(sum(col("qv") * col("wnum")).as("p"))
      .groupBy("vec_id")
      .agg(sum(when(col("p") >= 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
        .otherwise(0L)).as("bucket"))
  }

  def annLsh(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val all = quantized(spark, sfDir).join(bucketsOf(spark, sfDir), "vec_id")
    val q = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("bucket"))
    val scored = all.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineFromQ(expr("quantized_dot(q_emb, embedding)"),
          col("q_n2"), col("n2")).as("cosine"))
    topkOf(scored, k)
  }
}
