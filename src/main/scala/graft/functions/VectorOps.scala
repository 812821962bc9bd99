package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType)` embedding columns, built on
  * Spark's codegen'd higher-order functions (`zip_with`/`aggregate`) —
  * no UDF, no serialization boundary, whole-stage-codegen eligible.
  *
  * Exactness strategy: embeddings are quantized to a 1e-6 grid as BIGINTs
  * (`ROUND(v * 1e6)` — the int-quantization trick production ANN systems
  * use anyway), and dot products / norms are then computed in exact
  * 64-bit integer arithmetic: order-independent, engine-independent, and
  * bit-stable under any partitioning. Only the final cosine division
  * happens in floating point (single deterministic double op chain).
  * A 64-dim dot of 1e-6-quantized unit vectors stays ≤ ~2^45 — far from
  * BIGINT overflow. (A first cut accumulated double products in
  * DECIMAL(28,14); that died on cross-engine double→decimal cast
  * rounding at the 1e-15 edge — integers have no such edge.)
  */
object VectorOps {
  /** Quantization scale: 6 decimal digits ≈ float32's precision for
    * unit-norm embedding values. */
  val Q: Long = 1000000L

  /** Float array → quantized BIGINT array.
    * Oracle twin: list_transform / per-element
    * CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT). */
  def quantize(a: Column): Column =
    transform(a, x => round(x.cast(DoubleType) * Q).cast(LongType))

  /** Exact integer dot product of two quantized BIGINT arrays.
    * Oracle twin: SUM(qa_i * qb_i) over the unnested vectors. */
  def dotQ(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Column ⇄ Catalyst-expression bridge (the Spark 4 classic-API
    * helper): lets the fused native expressions below construct
    * directly — no function-registry round-trip, no registration
    * ordering concerns at analysis time. (SQL registration still
    * exists for SQL-text use; see each expression's `register`.) */
  private def ofExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def exprOf(c: Column) =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** [[dotQ]] through the fused native expression
    * ([[graft.plans.LongDot]]) — identical integers, a tight codegen
    * loop instead of the interpreted per-element HOF lambdas (measured
    * ~7 µs → sub-0.1 µs per 64-dim pair; the N×k ANN assignment plane
    * is built from exactly this call). */
  def ldotQ(qa: Column, qb: Column): Column =
    ofExpr(graft.plans.LongDot(exprOf(qa), exprOf(qb)))

  /** Exact integer squared L2 of two quantized BIGINT arrays through
    * the fused native expression ([[graft.plans.LongL2]]) — the PQ
    * assignment/LUT distance. */
  def ll2Q(qa: Column, qb: Column): Column =
    ofExpr(graft.plans.LongL2(exprOf(qa), exprOf(qb)))

  /** Count of positions where two BIGINT arrays agree, through the
    * fused native expression ([[graft.plans.LongMatch]]) — the MinHash
    * signature-agreement count (Jaccard-estimate numerator). */
  def lmatch(a: Column, b: Column): Column =
    ofExpr(graft.plans.LongMatch(exprOf(a), exprOf(b)))

  /** [[quantize]] through the fused native expression
    * ([[graft.plans.QuantizeVec]]) — the same `ROUND(v·1e6)`
    * half-away-from-zero grid in one primitive loop with one output
    * allocation, vs the HOF `transform`'s interpreted per-element
    * lambda. Bit-equal to [[quantize]] (QuantizedDotSpec pins it over
    * the fixture vectors). */
  def quantizeFast(a: Column): Column =
    ofExpr(graft.plans.QuantizeVec(exprOf(a)))

  /** Exact integer squared norm of a quantized array. */
  def norm2Q(qa: Column): Column = dotQ(qa, qa)

  /** Cosine from integer dot and norms (exact until the final division;
    * the integer values convert to double exactly — they are < 2^53). */
  def cosineFromQ(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast(DoubleType) / (sqrt(n2a.cast(DoubleType)) * sqrt(n2b.cast(DoubleType)))
}
