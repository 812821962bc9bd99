package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode canonical composition (NFC).
  *
  * The canonicalization step of cross-source text dedup: the same
  * visible text arrives composed ("é" U+00E9) from one crawler and
  * decomposed ("e"+U+0301) from another, and byte hashes disagree until
  * both are mapped to one canonical form. Spark has no normalization
  * builtin, so this is the (b)-tier extension of the preference order —
  * a scalar Expression that whole-stage codegen inlines, not a UDF:
  * NULL handling, constant folding, and pushdown all behave like a
  * builtin.
  *
  * Fast paths matter at corpus scale: real training corpora are
  * overwhelmingly already-NFC, so [[NfcNormalize.nfc]] first runs the
  * allocation-free `Normalizer.isNormalized` check and returns the
  * INPUT UTF8String unchanged when it passes (the common case does no
  * copy at all); only genuinely decomposed rows pay the composition.
  *
  * Semantics are Unicode-standard NFC (java.text.Normalizer), matching
  * DuckDB's utf8proc `nfc_normalize` byte-for-byte on the certified
  * query (`x11r_unicode_canon`) — pinned in NfcNormalizeSpec together
  * with idempotence and the ASCII identity fast path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = NfcNormalize.name

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  val name = "graft_nfc"

  /** NFC with an identity fast path (called from generated code). */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  private def builder(exprs: Seq[Expression]): Expression =
    NfcNormalize(exprs.head)

  /** Idempotent per-session SQL registration (`graft_nfc(s)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** The `SparkSessionExtensions` hook form. */
  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[NfcNormalize].getName, name),
      builder _))
}
