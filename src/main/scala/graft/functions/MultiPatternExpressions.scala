package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho-Corasick multi-pattern occurrence counting (Aho & Corasick 1975)
 * — ONE pass over each document for the whole watchlist, replacing the
 * k-passes-per-document `replace`-length identity the canary scan
 * (q157) would otherwise run. At 100 TB the text scan IS the cost, so
 * a k-pattern watchlist must not multiply it by k.
 *
 * Counting semantics are REPLACE-EQUIVALENT per pattern: greedy
 * left-to-right non-overlapping occurrences (each pattern counted
 * independently), i.e. exactly
 * `(length(t) - length(replace(t, p, ''))) / length(p)` — so the
 * DuckDB oracle keeps the portable replace formulation while the
 * engine runs the automaton. Self-overlapping patterns ('aa' in
 * 'aaa') are where "all matches" and replace-counts diverge; the
 * per-pattern next-allowed-start gate reproduces the replace answer.
 *
 * The automaton is built ONCE per plan (it rides the expression as a
 * codegen reference object), not per row.
 */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  // dense automaton over the chars that appear in patterns; all other
  // chars go to root via the default transition
  private val alphabet: Map[Char, Int] =
    patterns.flatten.distinct.sorted.zipWithIndex.toMap
  private val k = alphabet.size

  // nodes as growable arrays: goto table, fail link, outputs
  private val gotoTbl = scala.collection.mutable.ArrayBuffer[Array[Int]](
    Array.fill(k)(-1))
  private val fail = scala.collection.mutable.ArrayBuffer[Int](0)
  private val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { ch =>
      val c = alphabet(ch)
      if (gotoTbl(node)(c) == -1) {
        gotoTbl(node)(c) = gotoTbl.size
        gotoTbl += Array.fill(k)(-1)
        fail += 0
        out += Nil
      }
      node = gotoTbl(node)(c)
    }
    out(node) = pi :: out(node)
  }

  // BFS fail links; convert goto misses into direct transitions so the
  // scan is a single array lookup per char (no fail-chain walking)
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < k) {
      val nxt = gotoTbl(0)(c)
      if (nxt == -1) gotoTbl(0)(c) = 0
      else { fail(nxt) = 0; queue += nxt }
      c += 1
    }
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      out(node) = out(node) ++ out(fail(node))
      var c2 = 0
      while (c2 < k) {
        val nxt = gotoTbl(node)(c2)
        if (nxt == -1) gotoTbl(node)(c2) = gotoTbl(fail(node))(c2)
        else { fail(nxt) = gotoTbl(fail(node))(c2); queue += nxt }
        c2 += 1
      }
    }
  }

  private val gotoFlat: Array[Array[Int]] = gotoTbl.toArray
  private val outFlat: Array[Array[Int]] = out.map(_.toArray).toArray
  private val patLen: Array[Int] = patterns.map(_.length).toArray
  // O(1) char→code for the ASCII fast path (watchlists are ASCII in
  // practice; anything else falls back to the map)
  private val asciiCode: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.foreach { case (ch, i) => if (ch < 128) a(ch) = i }
    a
  }

  /** Non-overlapping (replace-equivalent) per-pattern counts. */
  def counts(text: String): Array[Long] = {
    val n = patterns.size
    val cnt = new Array[Long](n)
    val nextStart = new Array[Int](n)
    var node = 0
    var i = 0
    val len = text.length
    while (i < len) {
      val ch = text.charAt(i)
      val c =
        if (ch < 128) asciiCode(ch)
        else alphabet.getOrElse(ch, -1)
      node = if (c == -1) 0 else gotoFlat(node)(c)
      val hits = outFlat(node)
      var h = 0
      while (h < hits.length) {
        val p = hits(h)
        val start = i - patLen(p) + 1
        if (start >= nextStart(p)) { cnt(p) += 1; nextStart(p) = i + 1 }
        h += 1
      }
      i += 1
    }
    cnt
  }

  /** Codegen entry point: UTF8String in, Spark array out. */
  def countsArray(text: UTF8String): ArrayData =
    new GenericArrayData(counts(text.toString))
}

/** `multi_pattern_count(text)` → Array[Long] of per-pattern
  * non-overlapping occurrence counts, in watchlist order. */
case class MultiPatternCountExpression(child: Expression,
    patterns: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def nullSafeEval(input: Any): Any =
    ac.countsArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, input => s"$acRef.countsArray($input)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "multi_pattern_count"
}

object MultiPatternFunctions {
  import org.apache.spark.sql.GraftBridge

  def multiPatternCount(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(MultiPatternCountExpression(
      GraftBridge.expression(text), patterns))
}
