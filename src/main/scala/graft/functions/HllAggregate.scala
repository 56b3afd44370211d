package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Deterministic HyperLogLog register aggregate over a LONG key column:
 * one 2^p-byte register buffer per group, mergeable by elementwise max.
 *
 * Why a second HLL next to Spark's built-in `hll_sketch_agg`
 * (Datasketches, used by q115's union path): the built-in's hash and
 * register layout are library-internal, so its estimates cannot be
 * replayed by an independent engine. This aggregate freezes the whole
 * pipeline — splitmix64 finalizer (Steele et al., "Fast Splittable
 * Pseudorandom Number Generators", OOPSLA 2014; public constants), high
 * p bits as register index, leading-zero rank of the remaining 64-p
 * bits — in exact 64-bit integer arithmetic, so a DuckDB oracle
 * reproduces every register byte-for-byte (q196). That is also the
 * property a production corpus wants from a sketch that gets PERSISTED
 * and merged across engines/runs: registers are a portable contract,
 * not an implementation detail.
 *
 * Scale shape (the [[GramAggregate]] pattern): the corpus never
 * shuffles — each partition folds its rows into the fixed 2^p-byte
 * buffer inside the hash-agg path, and only ~numPartitions partial
 * buffers cross the wire to the final elementwise-max merge. Union
 * across groups/batches is the same max, exposed via [[HllAggregate.merge]]
 * for driver-side accumulation (streaming distinct counts).
 *
 * Output: array<tinyint> of length 2^p — register j holds
 * max over keys of rho(key), 0 where no key landed.
 */
case class HllAggregate(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")

  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllAggregate.mix64(v.asInstanceOf[Long])
      val j = (h >>> (64 - p)).toInt
      val rho = HllAggregate.rho(h, p)
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "hll_registers"
}

object HllAggregate {
  import org.apache.spark.sql.GraftBridge

  /** splitmix64 finalizer — the frozen cross-engine hash contract.
    * Java long arithmetic wraps mod 2^64, matching the oracle's
    * explicit HUGEINT `% 2^64` chain. */
  def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Leading-zero rank of the low 64-p hash bits (1-based; 64-p+1 when
    * all are zero). */
  def rho(h: Long, p: Int): Int = {
    val w = h << p
    if (w == 0) 64 - p + 1
    else java.lang.Long.numberOfLeadingZeros(w) + 1
  }

  /** Registers of a LONG key column as one array<tinyint> aggregate. */
  def hllRegisters(key: Column, p: Int): Column =
    GraftBridge.column(
      HllAggregate(GraftBridge.expression(key), p).toAggregateExpression())
}

/**
 * splitmix64 of (key XOR seed) as a codegen'd scalar expression — the
 * per-row hash kernel the count-min sketch (q200) and any seeded
 * register assignment run over the corpus. The mix inlines into
 * whole-stage codegen (plain long arithmetic, no virtual call), and the
 * constants are the same frozen splitmix64 finalizer [[HllAggregate.mix64]]
 * replays — so the DuckDB oracle's HUGEINT chain reproduces every hash.
 */
case class Mix64Expression(child: Expression, seed: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HllAggregate.mix64(input.asInstanceOf[Long] ^ seed)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // fresh name: several seeded mixes can share one codegen function
    val z = ctx.freshName("z")
    nullSafeCodeGen(ctx, ev, c => s"""
      long $z = ($c ^ ${seed}L) + 0x9E3779B97F4A7C15L;
      $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
      $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
      ${ev.value} = $z ^ ($z >>> 31);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "mix64"
}

object Mix64Expression {
  import org.apache.spark.sql.GraftBridge

  def mix64(key: Column, seed: Long): Column =
    GraftBridge.column(Mix64Expression(GraftBridge.expression(key), seed))
}
