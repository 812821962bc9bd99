package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent ("exact") aggregate helpers.
  *
  * The driver verifies every query by hash-comparing our result against
  * DuckDB running equivalent ANSI SQL (SURVEY §5). Floating-point SUM/AVG
  * is order-dependent in the last ulps, and Spark and DuckDB will not sum
  * partitions in the same order — so every money/measure aggregate is
  * routed through exact `DECIMAL` arithmetic (associative, commutative)
  * and only converted to `DOUBLE` at the very end. This also makes results
  * stable under repartitioning at 100 TB scale: the answer does not change
  * when the cluster size or AQE plan changes.
  *
  * DuckDB oracle twins (documented per helper) use the same decimal cast
  * chain so both engines compute bit-identical doubles.
  */
object Exact {
  /** 2-decimal money type — fixture measures are generated with 2dp. */
  val Dec2: DecimalType = DecimalType(12, 2)

  /** SUM(x) via decimal. Oracle: CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE) */
  def dsum(c: Column): Column = sum(c.cast(Dec2)).cast(DoubleType)

  /** SUM(a*b) with both factors cast to decimal first (exact product).
    * Oracle: CAST(SUM(CAST(a AS DECIMAL(12,2)) * CAST(b AS DECIMAL(12,2))) AS DOUBLE) */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(Dec2) * b.cast(Dec2)).cast(DoubleType)

  /** 1 - x in exact decimal. Oracle: (CAST(1 AS DECIMAL(12,2)) - CAST(x AS DECIMAL(12,2))) */
  def oneMinus(c: Column): Column = lit(1).cast(Dec2) - c.cast(Dec2)

  /** AVG(x) as exact-decimal sum divided by count, in double.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE) / COUNT(x) */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** The reference's `int(mean(...))` truncating average
    * (`server.py:109,128` — Python `int()` truncates toward zero; all
    * fixture measures are positive so FLOOR ≡ truncation).
    * Oracle: CAST(FLOOR(CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE) / COUNT(x)) AS BIGINT) */
  def avgFloorLong(c: Column): Column = floor(davg(c)).cast(LongType)
}
