package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded top-k aggregate: keeps the k largest (score, id) pairs per
 * group, ordered score DESC then id ASC (deterministic tiebreak).
 *
 * Why a custom `TypedImperativeAggregate` (SURVEY §2.12 / §7.3 candidate):
 * the window formulation (`row_number() over (partition by q order by
 * sim)` + filter) must SHUFFLE EVERY candidate row to the partition of
 * its group before ranking. This aggregate prunes map-side — each
 * partition keeps at most k rows per group in a bounded heap, and only
 * those heaps cross the wire. At 100 TB candidate volume that's the
 * difference between shuffling the corpus and shuffling k rows per query.
 *
 * Usage: `TopKAggregate.topK(scoreCol, idCol, k)` → array<struct<score,id>>
 * (descending), typically exploded with `posexplode` for (rank, id) rows.
 */
case class TopKAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  // bounded buffer of at most k entries; O(k) insert with k small.
  // (A Scala PriorityQueue's captured implicit Ordering does not survive
  // Spark's serialization — plain buffer + explicit comparisons do.)
  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty[(Double, Long)]

  override def update(
      buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def add(buf: mutable.ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) { buf += e; return }
    // find the worst kept entry; replace if the newcomer beats it
    var worst = 0
    var i = 1
    while (i < buf.size) { if (better(buf(worst), buf(i))) worst = i; i += 1 }
    if (better(e, buf(worst))) buf(worst) = e
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortWith(better)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAggregate =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "top_k"
}

object TopKAggregate {
  import org.apache.spark.sql.GraftBridge

  /** Aggregate Column: array of the k largest (score, id) structs. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKAggregate(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
}

/**
 * String-keyed bounded top-k: keeps the k largest (count, term) pairs
 * per group, ordered count DESC then term ASC (binary UTF-8 tiebreak —
 * the same collation DuckDB and Spark use for plain string ORDER BY).
 *
 * Built for vocabulary rank heads (q131/q227 Zipf fits): the window
 * formulation (`row_number() over (partition by source order by cnt
 * desc, t)`) funnels the ENTIRE per-source (term, count) vocabulary
 * through one reducer's sort just to keep 100–200 rows. This aggregate
 * prunes map-side — each partition retains at most k terms per source
 * in a bounded buffer, so only k-row heaps cross the shuffle. At a
 * 100 TB corpus a source's vocabulary is 10⁸–10⁹ terms; the window
 * plan pins one task per source, this one never materializes the tail.
 */
case class TopKTermAggregate(
    cnt: Expression,
    term: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, UTF8String)]] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, UTF8String)] =
    mutable.ArrayBuffer.empty[(Long, UTF8String)]

  override def update(
      buf: mutable.ArrayBuffer[(Long, UTF8String)],
      input: InternalRow): mutable.ArrayBuffer[(Long, UTF8String)] = {
    val c = cnt.eval(input)
    val t = term.eval(input)
    if (c != null && t != null) {
      // clone: the UTF8String may point into a reused row buffer
      add(buf, (c.asInstanceOf[Long], t.asInstanceOf[UTF8String].clone()))
    }
    buf
  }

  private def better(a: (Long, UTF8String), b: (Long, UTF8String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)

  private def add(
      buf: mutable.ArrayBuffer[(Long, UTF8String)],
      e: (Long, UTF8String)): Unit = {
    if (buf.size < k) { buf += e; return }
    var worst = 0
    var i = 1
    while (i < buf.size) { if (better(buf(worst), buf(i))) worst = i; i += 1 }
    if (better(e, buf(worst))) buf(worst) = e
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Long, UTF8String)],
      other: mutable.ArrayBuffer[(Long, UTF8String)]): mutable.ArrayBuffer[(Long, UTF8String)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, UTF8String)]): Any = {
    val sorted = buf.toSeq.sortWith(better)
    new GenericArrayData(sorted.map { case (c, t) => InternalRow(c, t) })
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, UTF8String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (c, t) =>
      out.writeLong(c)
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, UTF8String)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val c = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((c, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("c", LongType), StructField("t", StringType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(cnt, term)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(cnt = newChildren(0), term = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): TopKTermAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKTermAggregate =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "top_k_term"
}

object TopKTermAggregate {
  import org.apache.spark.sql.GraftBridge

  /** Aggregate Column: array of the k most frequent (c, t) structs. */
  def topKTerm(cnt: Column, term: Column, k: Int): Column =
    GraftBridge.column(
      TopKTermAggregate(GraftBridge.expression(cnt), GraftBridge.expression(term), k)
        .toAggregateExpression())
}
