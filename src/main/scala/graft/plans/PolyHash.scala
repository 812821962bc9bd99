package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial content hash over character
  * codes, `h = fold(codePoints, (acc, c) => (acc*31 + c) mod (2^31-1))`
  * with the first code point as the seed — the token/shingle/gram id
  * function of the text pipelines (`TextAnalysis.polyHash`).
  *
  * Semantically identical to the composed higher-order form
  * `aggregate(slice(transform(split(s,''), ascii), 2, n-1), ascii(s[0]),
  * (acc,c) => (acc*31+c) % p)` and to the DuckDB oracle's
  * `list_reduce(list_transform(string_split(s,''), ascii), ...)` — but
  * the HOF form allocates a char-array and an int-array per value and
  * evaluates the lambda interpretively per character, which measurably
  * dominates the dedup pipelines (it runs once per token occurrence and
  * once per gram/shingle of the whole corpus). `doGenCode` emits a tight
  * code-point loop that whole-stage codegen inlines.
  *
  * Empty input hashes to 0 (the HOF form yields NULL there; the corpus
  * tokenizer never emits empty tokens — pinned in PolyHashSpec).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = PolyHash.name

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val first = ctx.freshName("first")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |boolean $first = true;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  if ($first) { $h = (long) $cp; $first = false; }
         |  else { $h = ($h * 31L + $cp) % 2147483647L; }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHash =
    copy(child = c)
}

object PolyHash {
  val name = "graft_polyhash"

  /** Reference implementation (also called by interpreted eval). */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    var first = true
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (first) { h = cp; first = false }
      else h = (h * 31L + cp) % 2147483647L
    }
    h
  }

  private def builder(exprs: Seq[Expression]): Expression =
    PolyHash(exprs.head)

  /** Idempotent per-session SQL registration (`graft_polyhash(s)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** The `SparkSessionExtensions` hook form. */
  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[PolyHash].getName, name),
      builder _))
}
