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
  test("fused long-array dot/L2 equal the HOF forms over fixture pairs") {
    // graft_ldot / graft_ll2 replaced the interpreted HOF lambdas on
    // the ANN training/assignment planes (r13) — identical integers by
    // contract, pinned here over real quantized fixture vectors plus
    // negative/zero adversarials and the interpreted (no-codegen) path.
    graft.plans.LongVecOps.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("qv").as("qq"))
    val bad = e.crossJoin(q)
      .select(
        VectorOps.ldotQ(col("qq"), col("qv")).as("fd"),
        VectorOps.dotQ(col("qq"), col("qv")).as("hd"),
        VectorOps.ll2Q(col("qq"), col("qv")).as("fl"),
        aggregate(zip_with(col("qq"), col("qv"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x).as("hl"))
      .filter(col("fd") =!= col("hd") || col("fl") =!= col("hl"))
      .count()
    assert(bad == 0)
    import spark.implicits._
    val adv = Seq((Array(-3L, 0L, 7L), Array(5L, -2L, 0L)))
      .toDF("a", "b")
      .select(expr("graft_ldot(a, b)"), expr("graft_ll2(a, b)"))
      .head
    assert(adv.getLong(0) == -15L)
    assert(adv.getLong(1) == 64L + 4L + 49L)
    // interpreted path must agree
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val la = Literal.create(Array(-3L, 0L, 7L), ArrayType(LongType))
    val lb = Literal.create(Array(5L, -2L, 0L), ArrayType(LongType))
    assert(graft.plans.LongDot(la, lb).eval(null) == -15L)
    assert(graft.plans.LongL2(la, lb).eval(null) == 117L)
  }

  test("fused lmatch equals the HOF agreement count over fixture pairs") {
    // graft_lmatch replaced the x09q MinHash signature-agreement HOF
    // (the last corpus-adjacent interpreted lambda, r14) — identical
    // integers pinned over real quantized fixture vectors (self-pairs
    // must score the full length), crafted partial matches, and the
    // interpreted (no-codegen) path.
    graft.plans.LongVecOps.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("qv").as("qq"))
    val bad = e.crossJoin(q)
      .select(
        VectorOps.lmatch(col("qq"), col("qv")).as("fm"),
        aggregate(zip_with(col("qq"), col("qv"),
            (x, y) => (x === y).cast("long")),
          lit(0L), (acc, x) => acc + x).as("hm"))
      .filter(col("fm") =!= col("hm"))
      .count()
    assert(bad == 0)
    val dim = e.head.getSeq[Long](1).length.toLong
    assert(e.limit(1).crossJoin(e.limit(1).select(col("qv").as("qq")))
      .select(VectorOps.lmatch(col("qq"), col("qv"))).head.getLong(0) == dim)
    import spark.implicits._
    val adv = Seq((Array(-3L, 0L, 7L, 5L), Array(-3L, -2L, 7L, 0L)))
      .toDF("a", "b").select(expr("graft_lmatch(a, b)")).head
    assert(adv.getLong(0) == 2L)
    // interpreted path + truncate-to-shorter convention
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val la = Literal.create(Array(1L, 2L, 3L), ArrayType(LongType))
    val lb = Literal.create(Array(1L, 9L, 3L, 4L), ArrayType(LongType))
    assert(graft.plans.LongMatch(la, lb).eval(null) == 2L)
  }

  test("PqArgmin rejects an empty subspace at construction") {
    // A codeword-less subspace would fall through the argmin loop and
    // return the Long.MaxValue sentinel as a real code — the invariant
    // must fail LOUDLY at plan-build time (ADVICE r13), never corrupt.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val sq = Literal.create(Array(1L, 2L), ArrayType(LongType))
    val sub = Literal.create(0L, LongType)
    val ex = intercept[IllegalArgumentException] {
      graft.plans.PqArgmin(sq, sub,
        subStarts = Array(0L, 0L, 2L), // subspace 0 owns zero codewords
        cellIds = Array(0L, 1L), cqFlat = Array(1L, 2L, 3L, 4L))
    }
    assert(ex.getMessage.contains("strictly increasing"))
    // the well-formed sibling constructs and evaluates
    val ok = graft.plans.PqArgmin(sq, sub,
      subStarts = Array(0L, 1L, 2L),
      cellIds = Array(7L, 9L), cqFlat = Array(1L, 2L, 5L, 5L))
    assert(ok.eval(null) == 7L)
  }

  test("fused quantize equals the HOF transform over every fixture vector") {
    // graft_quantize fronts every ANN plane (r13); its grid must be
    // BIT-equal to the composed round(cast·1e6) HOF form, including
    // negatives/zeros/exact-half edge shapes.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val bad = e.select(
        VectorOps.quantize(col("embedding")).as("hof"),
        VectorOps.quantizeFast(col("embedding")).as("fused"))
      .filter(col("hof") =!= col("fused")).count()
    assert(bad == 0)
    import spark.implicits._
    val adv = Seq(Array(-0.5f, 0.0f, 1.25f, -2.0000005f, 0.0000005f))
      .toDF("a")
      .select(VectorOps.quantize(col("a")).as("hof"),
        VectorOps.quantizeFast(col("a")).as("fused"))
      .head
    assert(adv.getSeq[Long](0) == adv.getSeq[Long](1))
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val interp = graft.plans.QuantizeVec(
      Literal.create(Array(-0.5f, 1.25f), ArrayType(FloatType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toLongArray().toSeq == Seq(-500000L, 1250000L))
  }

  test("self-dot rewrites to the fused norm and values are unchanged") {
    import org.apache.spark.sql.functions._
    graft.plans.QuantizedDot.register(spark)
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("quantized_dot(embedding, embedding)").as("n2"),
        expr("quantized_norm2(embedding)").as("n2f"))
    // the optimizer rule must strengthen the self-dot in the plan...
    assert(df.queryExecution.optimizedPlan.toString.contains("quantized_norm2"),
      "SelfDotToNorm rule did not fire")
    // ...and a distinct-argument dot must NOT be rewritten
    val two = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(expr("quantized_dot(embedding, reverse(embedding))").as("d"))
    assert(two.queryExecution.optimizedPlan.toString.contains("quantized_dot"),
      "rule must only rewrite self-dots")
    // bit-identical values either way
    df.collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

}
