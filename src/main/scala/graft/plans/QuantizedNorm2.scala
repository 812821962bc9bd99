package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: fused int-quantized squared norm of a
  * float-array column — `Σ q(x_i)²` with the same `ROUND(v·1e6)`
  * quantization as [[QuantizedDot]]. Semantically identical to
  * `quantized_dot(a, a)` but reads the array ONCE per row and quantizes
  * each element once instead of twice; norms are computed for every
  * corpus vector in every similarity query, so the halved array traffic
  * is on the hot path.
  *
  * Normally introduced by the [[SelfDotToNorm]] optimizer rule rather
  * than written directly — user code says `quantized_dot(emb, emb)` and
  * the rule rewrites it (the Catalyst idiom: declarative query, plan-
  * level strengthening).
  */
case class QuantizedNorm2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = QuantizedNorm2.name

  @inline private def q(v: Double): Long =
    if (v >= 0) (v * 1e6 + 0.5).toLong else (v * 1e6 - 0.5).toLong

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val qi = q(x.getFloat(i).toDouble)
      acc += qi * qi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val vx = ctx.freshName("vx")
      val qx = ctx.freshName("qx")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $vx = (double) $a.getFloat($i);
         |  long $qx = (long)($vx >= 0 ? $vx * 1e6 + 0.5 : $vx * 1e6 - 0.5);
         |  $acc += $qx * $qx;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantizedNorm2 =
    copy(child = c)
}

object QuantizedNorm2 {
  val name = "quantized_norm2"

  private def builder(exprs: Seq[Expression]): Expression =
    QuantizedNorm2(exprs.head)

  /** Idempotent per-session SQL registration (`quantized_norm2(a)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** The `SparkSessionExtensions` hook form. */
  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[QuantizedNorm2].getName, name),
      builder _))
}

/** Optimizer rule: `quantized_dot(a, a)` (a self-dot — how every norm is
  * written) strengthens to the fused [[QuantizedNorm2]] whenever both
  * sides are the same deterministic expression. Plan-level rewrite, so
  * callers keep the declarative two-argument form and every plan that
  * contains a self-dot — however it was composed — gets the single-read
  * loop. Injected via [[GraftExtensions]] for
  * `spark.sql.extensions` deployments and appended to
  * `spark.experimental.extraOptimizations` by [[QuantizedDot.register]]
  * for programmatic sessions.
  */
object SelfDotToNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case QuantizedDot(l, r)
          if l.deterministic && l.canonicalized == r.canonicalized =>
        QuantizedNorm2(l)
    }
}
