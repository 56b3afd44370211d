package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/**
 * Codegen'd Bloom membership probe over a broadcast 2^p-bit bitmap —
 * the map-side contamination work-filter (q73, and the batch twin of
 * [[graft.streaming.StreamingBloom]]'s `mightContain`) compiled INTO
 * whole-stage codegen. Per row, k independently seeded splitmix64
 * draws (pos_i = mix64(key XOR i·golden) AND (m−1) — the exact
 * arithmetic `StreamingBloom.processBatch` folds keys in with, so a
 * bitmap built by either side probes identically) test bits of the
 * broadcast `long[]`; all-set → possibly-benchmark, any-clear →
 * definitely clean (no false negatives).
 *
 * Why an expression and not a UDF: the probe is the hot map-side path
 * whose whole purpose is throughput at corpus scale — as a Scala UDF
 * it pays a codegen-stage break, boxing, and a virtual call per row;
 * here it inlines as plain long arithmetic + two array loads inside
 * the scan's codegen stage, and the bitmap is fetched once per
 * executor JVM through the broadcast (never serialized per task).
 */
case class BloomMightContain(
    child: Expression,
    bitmap: Broadcast[Array[Long]],
    p: Int,
    k: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(p >= 6 && p <= 26, s"p must be in [6,26], got $p")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def dataType: DataType = BooleanType

  // analysis-time contract: the key must be (implicitly castable to)
  // LONG — numeric children coerce, an incompatible child fails
  // analysis instead of class-casting at runtime (interpreted) or
  // silently mis-coercing (codegen)
  override def inputTypes = GraftBridge.longInputTypes(1)

  private def mask: Long = (1L << p) - 1

  // i-th hash seed: same golden-ratio stride as StreamingBloom.seed
  private def seed(i: Int): Long = i.toLong * 0x9E3779B97F4A7C15L

  override protected def nullSafeEval(input: Any): Any = {
    val words = bitmap.value
    val key = input.asInstanceOf[Long]
    var i = 0
    while (i < k) {
      val pos = HllAggregate.mix64(key ^ seed(i)) & mask
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: Janino has no generics; value() comes back as Object
    val bcRef = ctx.addReferenceObj("bloomBitmap", bitmap,
      "org.apache.spark.broadcast.Broadcast")
    val words = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val key = ctx.freshName("bloomKey")
      val probes = (0 until k).map { i =>
        val z = ctx.freshName("z")
        val pos = ctx.freshName("pos")
        s"""
        |if (${ev.value}) {
        |  long $z = ($key ^ ${seed(i)}L) + 0x9E3779B97F4A7C15L;
        |  $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
        |  $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
        |  $z = $z ^ ($z >>> 31);
        |  long $pos = $z & ${mask}L;
        |  if (($words[(int)($pos >>> 6)] & (1L << ($pos & 63L))) == 0L) {
        |    ${ev.value} = false;
        |  }
        |}""".stripMargin
      }.mkString("\n")
      s"""
      |final long $key = $c;
      |${ev.value} = true;
      |$probes
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  /** Column API: probe a LONG key column against a broadcast bitmap
    * built with [[graft.streaming.StreamingBloom]] (same p, k). */
  def column(key: Column, bitmap: Broadcast[Array[Long]], p: Int, k: Int): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), bitmap, p, k))
}
