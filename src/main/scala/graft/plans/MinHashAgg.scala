package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sketch-style custom aggregate (`TypedImperativeAggregate`): all 16
  * MinHash values of a group's shingle-id set in ONE mutable buffer —
  * the aggregation pattern HLL/quantile/theta sketches use. Buffers
  * partial-aggregate map-side and merge element-wise, so a 100 TB corpus
  * shuffles 16 longs per document instead of its shingle set.
  *
  * Hash family matches `Dedup.minhashLsh`'s expression form exactly:
  * `h_i(sid) = (a_i·sid + b_i) mod (2^31-1)`, `a_i = 1103515245(i+1) mod
  * p`, `b_i = (12345 + 2654435761·i) mod p` — so results are
  * bit-identical to the composed-expression pipeline and the DuckDB
  * oracle (pinned in MinHashAggSpec).
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinHashAgg._

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(H)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sid = v.asInstanceOf[Long]
      var i = 0
      while (i < H) {
        val h = (A(i) * sid + B(i)) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < H) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(H * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(H)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = name

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
}

object MinHashAgg {
  val name = "minhash16"
  val H = 16
  val P: Long = 2147483647L
  val A: Array[Long] = Array.tabulate(H)(i => (1103515245L * (i + 1)) % P)
  val B: Array[Long] = Array.tabulate(H)(i => (12345L + 2654435761L * i) % P)

  /** Idempotent per-session SQL registration (`minhash16(sid)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => MinHashAgg(exprs.head), "scala_udf")
}
