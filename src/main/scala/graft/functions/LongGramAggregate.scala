package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Exact-integer sibling of [[GramAggregate]]: a single-pass Gram-matrix
 * aggregate over a FIXED-POINT (array<long>) vector column, accumulating
 * the upper triangle of Σ x·xᵀ plus Σ x and n in ONE
 * d(d+1)/2 + d + 1 long buffer per partition.
 *
 * Why a separate long-buffer variant: [[GramAggregate]]'s double buffer
 * is exact only while partial sums stay under 2⁵³ — fine for its
 * corr-audit caller, but an eigen-iteration built ON TOP of the sums
 * (q242) needs the covariance matrix to be bit-identical between engines
 * at ANY row count, because every downstream iteration amplifies a
 * 1-ulp difference. With long accumulation the sums are exact integers
 * in any summation order, so the driver-side power iteration and its
 * DuckDB replay see the SAME matrix by construction.
 *
 * Same 100 TB shape as the double variant: the corpus never shuffles —
 * each partition folds into a fixed-size buffer and only ~numPartitions
 * partial buffers (≈2 k longs for d = 64) cross the wire.
 *
 * Overflow headroom: with milli-quantized unit-scale embeddings
 * (|x| ≤ ~4 → |x_m| ≤ 4 000), per-row products are ≤ 1.6e7, so the
 * signed-64 buffer holds ~5.7e11 rows before Σ x·xᵀ could wrap — past
 * that, shard the aggregate (groupBy a split key) and merge the exact
 * partials.
 *
 * Output: array<long> of length d(d+1)/2 + d + 1:
 *   [ Σ x_i·x_j for i ≤ j (row-major upper triangle) ++ Σ x_i ++ n ]
 */
case class LongGramAggregate(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val triLen = d * (d + 1) / 2
  private val bufLen = triLen + d + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == d) {
        var i = 0
        var k = 0
        while (i < d) {
          val xi = arr.getLong(i)
          var j = i
          while (j < d) {
            buf(k) += xi * arr.getLong(j)
            k += 1
            j += 1
          }
          buf(triLen + i) += xi
          i += 1
        }
        buf(triLen + d) += 1L
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def children: Seq[Expression] = Seq(vec)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): LongGramAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongGramAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "long_gram_agg"
}

object LongGramAggregate {
  import org.apache.spark.sql.GraftBridge

  /** Σ upper-triangle(x·xᵀ) ++ Σ x ++ n as one exact array<long> aggregate. */
  def gram(vec: Column, d: Int): Column =
    GraftBridge.column(
      LongGramAggregate(GraftBridge.expression(vec), d).toAggregateExpression())
}
