package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst-expression bridge. Spark 4's classic helpers
  * (`classic.ExpressionUtils.column/expression`) are `private[sql]`,
  * so this one-object shim lives in `org.apache.spark.sql` — the same
  * pattern every extension library that builds Columns from native
  * expressions uses (Delta, Sedona, spark-nlp). Kept to exactly these
  * two forwarders; everything graft-specific stays in `graft.*`.
  * Why not the function registry: a registry call resolves at ANALYSIS
  * time, which made every native-expression call site responsible for
  * registration ordering (a DataFrame is analyzed eagerly on
  * construction) — a whole fragility class this removes. */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
