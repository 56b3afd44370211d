package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.concurrent.ThreadLocalRandom

/**
 * UUIDv7 generator — time-sortable record IDs.
 *
 * The reference stamps every record with a UUIDv7 `_airbyte_raw_id`
 * (PyAirbyte `airbyte/records.py:74,237`, rationale at
 * `airbyte/constants.py:23-33`: v7 IDs sort by arrival time). Spark has
 * `uuid()` (v4, not time-ordered), so this is a small custom
 * nondeterministic expression.
 *
 * Layout (RFC 9562): 48-bit unix-epoch millis | ver=7 (4 bits) |
 * 12 random bits | var=10 (2 bits) | 62 random bits. Runs per-row on
 * executors; no state shared across partitions, safe under task retry
 * (IDs are metadata, not compared).
 */
object Uuid7 {
  def next(): String = {
    val rnd = ThreadLocalRandom.current()
    val ms = System.currentTimeMillis()
    val hi = (ms << 16) | 0x7000L | (rnd.nextLong() & 0x0FFFL)
    val lo = 0x8000000000000000L | (rnd.nextLong() & 0x3FFFFFFFFFFFFFFFL)
    new java.util.UUID(hi, lo).toString
  }
}

/** DOCUMENTED CodegenFallback EXEMPTION (the only one left in the
  * codebase, round 16): a nondeterministic leaf needs per-partition
  * init plumbing to codegen, the expression does one clock read + two
  * PRNG draws per row (no per-element loop for the interpreter to
  * multiply), and it appears only in write-path projections (S5 id
  * stamping), never in a bench-visible scan. */
case class Uuid7Expression() extends LeafExpression
    with Nondeterministic with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    UTF8String.fromString(Uuid7.next())
  override def prettyName: String = "uuid7"
}

object functions {
  import org.apache.spark.sql.GraftBridge
  /** Column producing a fresh UUIDv7 per row. */
  def uuid7(): Column = GraftBridge.column(Uuid7Expression())
  /** Bridge: Column → Catalyst Expression (Spark 4 classic API). */
  def exprOf(c: Column): Expression = GraftBridge.expression(c)
  /** Bridge: Catalyst Expression → Column. */
  def columnOf(e: Expression): Column = GraftBridge.column(e)
}
