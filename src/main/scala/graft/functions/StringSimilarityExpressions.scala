package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled Jaro-Winkler similarity (Winkler 1990) — the string-distance
 * kernel of entity resolution / record linkage, complementing the
 * built-in `levenshtein` (q57). Spark has no native Jaro-Winkler; a
 * Scala UDF would box both strings per pair inside the blocked
 * self-join's hot loop, so this is a Catalyst `BinaryExpression` in
 * straight JVM code (same rationale as the vector kernels in
 * `VectorExpressions.scala`).
 *
 * Semantics are the textbook algorithm, pinned to what DuckDB's
 * `jaro_winkler_similarity` computes (verified empirically, including
 * edge cases): match window `max(l1,l2)/2 - 1` clamped at 0; half-
 * transpositions; prefix scale 0.1 over at most 4 common lead chars;
 * the Winkler boost applies only when jaro > 0.7 (Winkler's original
 * threshold — 'ab' vs 'ba' is 0.0, 'abcdefgh' vs 'abxxxxxx' stays 0.5).
 * Empty vs non-empty is 0.0; equal strings are 1.0.
 */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    JaroWinklerExpression.similarity(s1, s2)
  }

  /** Real codegen (not CodegenFallback): the similarity call inlines
    * into whole-stage codegen as a static invoke, so the blocked
    * self-join's pair loop never leaves generated code for an
    * interpreted Expression walk (2-3 μs/pair saved at q158's
    * millions of candidate pairs). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpression.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerExpression {

  /** Plain-JVM Jaro-Winkler; shared with specs for reference checks. */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0 // incl. both-empty (DuckDB: 0.0)
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // HALF-transpositions by integer division — what DuckDB (and the
    // Winkler reference implementation) computes; the fractional t/2.0
    // variant diverges on odd transposition counts (found empirically:
    // 1557/20000 random pairs differed before this floor)
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
      s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object StringSimilarityFunctions {
  import org.apache.spark.sql.GraftBridge

  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpression(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
