package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{Collect, ImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/**
 * `collect_list` with a hard per-group element bound: accumulation stops
 * once the buffer holds `bound` elements — further inputs (and merge
 * tails) are dropped, so a group's buffer costs O(bound) memory no
 * matter how many rows it has.
 *
 * Built for the df-capped posting buckets of the exact dedup pair
 * engine ([[graft.operators.PostingPairs]] and its q256/q165 inline
 * variants), where plain `collect_list` + `size(lst) <= cap` first
 * MATERIALIZED the full posting list of every above-cap (boilerplate)
 * shingle before the filter discarded it — an O(df) single-task
 * aggregation buffer for exactly the hot keys the cap exists to drop
 * (guide §5 memory / §2.2 skew; round-16 verdict item 1). Called with
 * `bound = cap + 1` the semantics under the downstream `size <= cap`
 * filter are IDENTICAL: a group with ≤ cap total elements never reaches
 * the bound (its list is complete and exact), and a group with > cap
 * elements yields exactly cap+1 — still > cap, still discarded — while
 * buffering cap+1 elements instead of df.
 *
 * Like `collect_list` the result order is the (non-deterministic)
 * accumulation order; all callers aggregate over the exploded list, so
 * order never reaches results. Serialization, buffer element typing and
 * null-skipping are inherited from Spark's own `Collect` base class —
 * this class only bounds `update`/`merge`.
 */
case class BoundedCollectList(
    child: Expression,
    bound: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected lazy val bufferElementType: DataType = child.dataType

  // values may point into reused row/scan buffers — copy on collect,
  // exactly as CollectList does
  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def update(
      buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= bound) buffer else super.update(buffer, input)

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length < bound && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)
  override def prettyName: String = "bounded_collect_list"
}

object BoundedCollectList {
  import org.apache.spark.sql.GraftBridge

  /** Aggregate Column: array of at most `bound` collected values. */
  def boundedCollectList(e: Column, bound: Int): Column = {
    require(bound > 0, "bound must be positive")
    GraftBridge.column(
      BoundedCollectList(GraftBridge.expression(e), bound).toAggregateExpression())
  }
}
