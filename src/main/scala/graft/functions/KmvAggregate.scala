package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * K-minimum-values (KMV) distinct-value sketch (Bar-Yossef et al.,
 * "Counting distinct elements in a data stream", RANDOM 2002; Beyer et
 * al., SIGMOD 2007 for the set-operation estimators): per group, the k
 * smallest DISTINCT hashed values, as a sorted ascending `array<long>`.
 *
 * The sketch composes: the k smallest of a union are computable from
 * the two sketches alone, so source×source resemblance/containment
 * (q266) comes from 20 sketch rows instead of a corpus-sized posting
 * self-join. Map-side partials keep at most k longs per group, so ONE
 * exchange moves ~groups×k longs regardless of corpus size — the same
 * bounded-heap scale story as [[TopKAggregate]].
 *
 * Values are SIGNED longs compared in signed order; the DuckDB oracle
 * recenters its unsigned HUGEINT hashes into signed range first, so
 * "k smallest" agrees across engines. The TreeSet dedups on the fly —
 * no upstream `distinct()` exchange is needed.
 */
case class KmvAggregate(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = value.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(value)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): KmvAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAggregate =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "kmv_sketch"
}

object KmvAggregate {
  import org.apache.spark.sql.GraftBridge

  /** Aggregate Column: sorted ascending array of the k smallest
    * distinct signed-long values. */
  def kmv(value: Column, k: Int): Column =
    GraftBridge.column(
      KmvAggregate(GraftBridge.expression(value), k).toAggregateExpression())
}
