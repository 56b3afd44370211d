package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled vector kernels for embedding similarity (`Array[Float]` /
 * `Array[Double]` columns).
 *
 * The declarative formulations (`aggregate(zip_with(...))` folds) are
 * semantically identical but run INTERPRETED — one Expression-tree walk
 * per vector element per pair. In a bucketed self-join (q34) or top-k
 * rerank (q35/q42) the dot product sits inside the pair loop, so the
 * interpreter overhead multiplies by candidates × dims. These kernels do
 * the loop in straight JVM code, one eval per pair.
 *
 * OUTPUT PARITY IS CONTRACTUAL: accumulation is the same left-to-right
 * double fold as the declarative version and the DuckDB oracles
 * (`LlmQueries.q34Sql`/`q35Sql`/`q42Sql`) — identical bits, partition-
 * independent. That includes null semantics: `aggregate(zip_with(x, y,
 * (a,b) -> a*b), ...)` yields NULL when the lengths differ (zip_with
 * pads with null) or any element is null, so the kernels return null in
 * those cases rather than silently folding over garbage.
 */
private object VecOps {
  /** Element accessor tolerant of float or double arrays. */
  @inline def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
}

/** Left-to-right double-fold dot product of two numeric arrays. */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged/null-element inputs → null
  private lazy val lFloat = VecOps.isFloatArray(left.dataType)
  private lazy val rFloat = VecOps.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += VecOps.elem(x, i, lFloat) * VecOps.elem(y, i, rFloat)
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** L2 norm via the same left-to-right double fold. */
case class L2NormExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null element → null, as the fold would
  private lazy val isFloat = VecOps.isFloatArray(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = VecOps.elem(x, i, isFloat)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "vec_norm"
}

/**
 * Random-hyperplane sign signature ("10110…", one char per plane) in a
 * single pass: planes × dims multiply-adds per row. The ±1 plane
 * components are the same md5-derived Rademacher draws as
 * `Similarity.planeSign` (first hex char ≥ '8' → +1), precomputed once
 * per expression instance — constants, not per-row work.
 */
case class LshSignatureExpression(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  private lazy val isFloat = VecOps.isFloatArray(child.dataType)

  // signs(p)(i): component i of plane p
  private lazy val signs: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, i) =>
      val d = md.digest(s"plane$p:$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xF) >= 8) 1.0 else -1.0
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dims)
    val sb = new java.lang.StringBuilder(planes)
    var p = 0
    while (p < planes) {
      val s = signs(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += VecOps.elem(x, i, isFloat) * s(i)
        i += 1
      }
      sb.append(if (proj >= 0) '1' else '0')
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lsh_signature"
}

object VectorFunctions {
  import org.apache.spark.sql.GraftBridge

  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpression(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def vecNorm(a: Column): Column =
    GraftBridge.column(L2NormExpression(GraftBridge.expression(a)))

  def lshSignature(vec: Column, planes: Int, dims: Int): Column =
    GraftBridge.column(LshSignatureExpression(
      GraftBridge.expression(vec), planes, dims))
}
