package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Single-pass Gram-matrix aggregate over an embedding column: accumulates
 * the upper triangle of Σ x·xᵀ (plus Σ x and n) in ONE d(d+1)/2+d+1
 * double buffer per partition.
 *
 * Why a custom `TypedImperativeAggregate` (SURVEY §2.12 shape): the
 * relational formulation (posexplode twice + self-join on row id +
 * groupBy (i,j)) shuffles n·d² rows — at 100 TB of embeddings that is
 * the corpus squared per dimension pair. Here the CORPUS NEVER SHUFFLES:
 * each partition folds its rows into a fixed-size buffer, and only the
 * ~numPartitions partial buffers (≈2 k doubles each for d=64) cross the
 * wire to the final merge. This is the classic distributed covariance
 * pattern (e.g. Spark MLlib RowMatrix.computeCovariance — public API,
 * RDD-based); re-expressed as a DataFrame aggregate it stays inside
 * whole-stage codegen's hash-agg path and composes with groupBy.
 *
 * Float parity contract: inputs are float32, so each promoted float64
 * product is EXACT (24-bit mantissas → ≤48-bit product); only the
 * summation order differs across engines, bounding drift to a few ulp —
 * callers round derived covariances to 4 dp (suite-wide convention).
 *
 * Output: array<double> of length d(d+1)/2 + d + 1:
 *   [ sums of x_i·x_j for i ≤ j (row-major upper triangle) ++ sums of x_i ++ n ]
 */
case class GramAggregate(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val triLen = d * (d + 1) / 2
  private val bufLen = triLen + d + 1

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == d) {
        var i = 0
        var k = 0
        while (i < d) {
          val xi = arr.getFloat(i).toDouble
          var j = i
          while (j < d) {
            buf(k) += xi * arr.getFloat(j).toDouble
            k += 1
            j += 1
          }
          buf(triLen + i) += xi
          i += 1
        }
        buf(triLen + d) += 1.0
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def children: Seq[Expression] = Seq(vec)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): GramAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "gram_agg"
}

object GramAggregate {
  import org.apache.spark.sql.GraftBridge

  /** Σ upper-triangle(x·xᵀ) ++ Σ x ++ n as one array<double> aggregate. */
  def gram(vec: Column, d: Int): Column =
    GraftBridge.column(
      GramAggregate(GraftBridge.expression(vec), d).toAggregateExpression())
}
