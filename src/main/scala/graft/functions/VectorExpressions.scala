package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged/null-element inputs → null
  private lazy val lFloat = VecOps.isFloatArray(left.dataType)
  private lazy val rFloat = VecOps.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpression.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lFloat, rFloat)

  /** Real codegen (round 14 — this kernel sits inside the n·n pair
    * loops of q34/q35/q42/q251/q252, where the CodegenFallback wrapper
    * broke the whole-stage span per PAIR): one static invoke, with the
    * boxed-null contract for ragged/null-element inputs carried into
    * ev.isNull. Element types are known at codegen time, so the float
    * flags inline as literals. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDot")
      s"""
         |java.lang.Double $r =
         |  graft.functions.DotProductExpression.compute($a, $b, $lFloat, $rFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

object DotProductExpression {

  /** Shared by the interpreted eval and the generated code (parity by
    * construction); null (boxed) on ragged or null-element input —
    * exactly what the declarative zip_with fold yields. */
  def compute(x: ArrayData, y: ArrayData,
      lFloat: Boolean, rFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += VecOps.elem(x, i, lFloat) * VecOps.elem(y, i, rFloat)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** L2 norm via the same left-to-right double fold. */
case class L2NormExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null element → null, as the fold would
  private lazy val isFloat = VecOps.isFloatArray(child.dataType)

  override def nullSafeEval(input: Any): Any =
    L2NormExpression.compute(input.asInstanceOf[ArrayData], isFloat)

  /** Real codegen — same boxed-null static-invoke shape as vec_dot. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("vecNorm")
      s"""
         |java.lang.Double $r =
         |  graft.functions.L2NormExpression.compute($c, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "vec_norm"
}

object L2NormExpression {

  /** Shared by the interpreted eval and the generated code. */
  def compute(x: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = VecOps.elem(x, i, isFloat)
      s += v * v
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }
}

/**
 * Random-hyperplane sign signature ("10110…", one char per plane) in a
 * single pass: planes × dims multiply-adds per row. The ±1 plane
 * components are the same md5-derived Rademacher draws as
 * `Similarity.planeSign` (first hex char ≥ '8' → +1), precomputed once
 * per expression instance — constants, not per-row work.
 */
case class LshSignatureExpression(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression {

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

  /** Shared by the interpreted eval and the generated code (the
    * expression instance carries the sign payload, so codegen invokes
    * it via a plan reference — the payload-kernel variant of the
    * static-invoke pattern). */
  def compute(x: ArrayData): UTF8String = {
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

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Real codegen (round 16): one virtual call per row through a plan
    * reference instead of a CodegenFallback Expression walk, keeping
    * the enclosing projection inside its whole-stage span. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("lshSig", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lsh_signature"
}

/** The HALF_UP decimal rounding Spark's `round()` applies to doubles
  * (shortest-decimal BigDecimal; NaN/Inf pass through) — shared so the
  * kernels below and their driver-side query prep round identically. */
object RoundParity {
  def round(d: Double, scale: Int): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** q145's per-dimension symmetric quantization: round(v/s*qmax), 0
    * where the scale is non-positive — same math driver-side (query
    * prep) and executor-side (corpus rows), so both sides of a
    * quantized dot are bit-identical. */
  def quantize(v: Array[Double], scales: Array[Double], qmax: Long): Array[Double] = {
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = if (i < scales.length && scales(i) > 0)
        round(v(i) / scales(i) * qmax.toDouble, 0) else 0.0
      i += 1
    }
    out
  }

  def norm(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }
}

/**
 * All-widths multi-query cosine scoring in ONE pass per corpus row
 * (q145's hot loop): the query set (tiny — it is the brute-force
 * decimation, like q42's IVF centroid table) is precomputed on the
 * driver in every representation (float anchor + each quantized
 * width) and shipped as expression payload; each corpus row is
 * quantized once per width and scored against every query in a tight
 * primitive loop. Output: one struct per query holding the rounded
 * sim per width (s0 = float anchor, s<bits> per quantized width).
 *
 * The composed form (broadcast join + per-pair kernel calls) evaluates
 * 5 CodegenFallback dots against the joined row PER PAIR — measured
 * 5× slower end to end at the 10× stress because every eval re-reads
 * the wide array columns; here the row's arrays decode exactly once.
 * Folds, operand order (query norm × corpus norm), and HALF_UP
 * rounding match the composed form bit for bit on non-null input
 * (null vector elements yield a null entry for the row — the corpus
 * contract; the composed form would null individual sims instead).
 */
case class MultiQuerySimsExpression(
    vec: Expression,
    queryIds: Array[Long],
    /** queryReps(q)(0) = float-anchor doubles; (q)(1 + wi) = width wi. */
    queryReps: Array[Array[Array[Double]]],
    /** queryNorms(q)(w), aligned with queryReps. */
    queryNorms: Array[Array[Double]],
    scales: Array[Double],
    bitsWidths: Array[Int]) extends UnaryExpression {

  override def child: Expression = vec
  override def nullable: Boolean = true
  private lazy val isFloat = VecOps.isFloatArray(vec.dataType)

  override def dataType: DataType = ArrayType(StructType(
    StructField("query_id", LongType, nullable = false) +:
      (0 +: bitsWidths.toSeq).map(b =>
        StructField(s"s$b", DoubleType, nullable = false))), containsNull = false)


  /** Public entry for the generated code — delegates to the interpreted
    * kernel (parity by construction); may return null (null vector
    * elements null the row's entry), which the generated null check
    * propagates. */
  def compute(x: ArrayData): ArrayData =
    nullSafeEval(x).asInstanceOf[ArrayData]

  /** Real codegen (round 16): one virtual call per row through a plan
    * reference instead of a CodegenFallback Expression walk, keeping
    * the enclosing projection inside its whole-stage span. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      v(i) = VecOps.elem(x, i, isFloat)
      i += 1
    }
    val w = bitsWidths.length
    // this row's representations + norms (float anchor at index 0)
    val reps = new Array[Array[Double]](w + 1)
    val norms = new Array[Double](w + 1)
    reps(0) = v
    norms(0) = RoundParity.norm(v)
    var wi = 0
    while (wi < w) {
      reps(wi + 1) = RoundParity.quantize(v, scales, (1L << (bitsWidths(wi) - 1)) - 1)
      norms(wi + 1) = RoundParity.norm(reps(wi + 1))
      wi += 1
    }
    val out = new Array[Any](queryIds.length)
    var q = 0
    while (q < queryIds.length) {
      val vals = new Array[Any](w + 2)
      vals(0) = queryIds(q)
      var r = 0
      while (r <= w) {
        val a = reps(r); val b = queryReps(q)(r)
        var d = 0.0
        var j = 0
        val m = math.min(a.length, b.length)
        while (j < m) { d += a(j) * b(j); j += 1 }
        val nn = queryNorms(q)(r) * norms(r)
        vals(r + 1) = if (nn > 0) RoundParity.round(d / nn, 4) else 0.0
        r += 1
      }
      out(q) = org.apache.spark.sql.catalyst.InternalRow.fromSeq(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(vec = c)
  override def prettyName: String = "multi_query_sims"
}

/**
 * Product-quantization multi-config scoring in ONE pass per corpus row
 * (q149's hot loop — the PQ dual of [[MultiQuerySimsExpression]]): the
 * 16-entry codebook (the first 16 corpus vectors, dimension-sized like
 * an IVF centroid table) and the query decimation ship as payload;
 * each corpus row is coded per subspace config m ∈ ms (nearest entry
 * by ROUND(aa − 2ab + bb, 4) with the smaller-entry tiebreak — the
 * composed plan's exact argmin), reconstructed, and scored against
 * every query, plus the float anchor, in tight primitive loops.
 * Output: one struct per query with s0 (anchor) and s<m> per config.
 * Folds, operand orders (query·recon dot, queryNorm × reconNorm), and
 * HALF_UP rounding match the composed broadcast-join form bit for bit
 * on non-null input (null elements null the whole row entry).
 */
case class PqMultiQuerySimsExpression(
    vec: Expression,
    queryIds: Array[Long],
    queryVecs: Array[Array[Double]],
    queryNorms: Array[Double],
    /** The raw codebook vectors (full dimension); subspace slices and
      * their self-dots are precomputed lazily per executor. */
    cbVecs: Array[Array[Double]],
    ms: Array[Int]) extends UnaryExpression {

  override def child: Expression = vec
  override def nullable: Boolean = true
  private lazy val isFloat = VecOps.isFloatArray(vec.dataType)

  override def dataType: DataType = ArrayType(StructType(
    StructField("query_id", LongType, nullable = false) +:
      (0 +: ms.toSeq).map(b =>
        StructField(s"s$b", DoubleType, nullable = false))), containsNull = false)

  // cbb(mi)(j)(c): codebook entry self-dot per subspace, same fold as vecDot
  @transient private lazy val cbb: Array[Array[Array[Double]]] = {
    val dims = cbVecs(0).length
    ms.map { m =>
      val sd = dims / m
      Array.tabulate(m, cbVecs.length) { (j, c) =>
        var s = 0.0
        var i = j * sd
        while (i < (j + 1) * sd) { s += cbVecs(c)(i) * cbVecs(c)(i); i += 1 }
        s
      }
    }
  }


  /** Public entry for the generated code — delegates to the interpreted
    * kernel (parity by construction); may return null (null vector
    * elements null the row's entry), which the generated null check
    * propagates. */
  def compute(x: ArrayData): ArrayData =
    nullSafeEval(x).asInstanceOf[ArrayData]

  /** Real codegen (round 16): one virtual call per row through a plan
    * reference instead of a CodegenFallback Expression walk, keeping
    * the enclosing projection inside its whole-stage span. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dims = x.numElements()
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      if (x.isNullAt(i)) return null
      v(i) = VecOps.elem(x, i, isFloat)
      i += 1
    }
    val cn = RoundParity.norm(v)
    // reconstruct per config
    val recon = new Array[Array[Double]](ms.length)
    val rnorm = new Array[Double](ms.length)
    var mi = 0
    while (mi < ms.length) {
      val m = ms(mi)
      val sd = dims / m
      val vh = new Array[Double](dims)
      var j = 0
      while (j < m) {
        val off = j * sd
        var aa = 0.0
        var t = 0
        while (t < sd) { aa += v(off + t) * v(off + t); t += 1 }
        var bestD = Double.MaxValue
        var bestC = -1
        var c = 0
        while (c < cbVecs.length) {
          var ab = 0.0
          var u = 0
          while (u < sd) { ab += v(off + u) * cbVecs(c)(off + u); u += 1 }
          val d2 = RoundParity.round(aa - 2.0 * ab + cbb(mi)(j)(c), 4)
          if (d2 < bestD || (d2 == bestD && c < bestC)) { bestD = d2; bestC = c }
          c += 1
        }
        System.arraycopy(cbVecs(bestC), off, vh, off, sd)
        j += 1
      }
      recon(mi) = vh
      rnorm(mi) = RoundParity.norm(vh)
      mi += 1
    }
    val out = new Array[Any](queryIds.length)
    var q = 0
    while (q < queryIds.length) {
      val qv = queryVecs(q)
      val qn = queryNorms(q)
      val vals = new Array[Any](ms.length + 2)
      vals(0) = queryIds(q)
      // float anchor: corpus·query over raw values (bruteForceTopK's fold)
      var d0 = 0.0
      var a = 0
      val lim = math.min(dims, qv.length)
      while (a < lim) { d0 += v(a) * qv(a); a += 1 }
      vals(1) = if (cn * qn > 0) RoundParity.round(d0 / (qn * cn), 4) else 0.0
      var r = 0
      while (r < ms.length) {
        val vh = recon(r)
        var d = 0.0
        var b = 0
        while (b < lim) { d += qv(b) * vh(b); b += 1 }
        vals(r + 2) = if (rnorm(r) > 0) RoundParity.round(d / (qn * rnorm(r)), 4) else 0.0
        r += 1
      }
      out(q) = org.apache.spark.sql.catalyst.InternalRow.fromSeq(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(vec = c)
  override def prettyName: String = "pq_multi_query_sims"
}

/**
 * IVF routing + scoring in ONE pass per corpus row (q144's hot loop,
 * completing the compiled-kernel treatment of the ANN tuning family):
 * the centroid table and the query decimation (with each query's
 * centroid RANKING precomputed on the driver with the same rounded
 * math) ship as payload; each corpus row is assigned to its nearest
 * centroid (rounded cosine, score-desc/id-asc tiebreak — the
 * TopKAggregate order) and scored against every query, emitting
 * (query_id, crank, sim) where crank is the assigned centroid's rank
 * in that query's probe order. Downstream, nprobe sweep points are
 * `when(crank <= np, sim)` columns feeding per-query top-k heaps —
 * null scores are skipped by the aggregate, so no placeholder rows
 * can leak into a ranking.
 */
case class IvfMultiQuerySimsExpression(
    vec: Expression,
    queryIds: Array[Long],
    queryVecs: Array[Array[Double]],
    queryNorms: Array[Double],
    /** crankByCentroid(q)(ci): 1-based rank of centroid index ci in
      * query q's probe order. */
    crankByCentroid: Array[Array[Int]],
    centroidVecs: Array[Array[Double]],
    centroidNorms: Array[Double]) extends UnaryExpression {

  override def child: Expression = vec
  override def nullable: Boolean = true
  private lazy val isFloat = VecOps.isFloatArray(vec.dataType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("crank", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)


  /** Public entry for the generated code — delegates to the interpreted
    * kernel (parity by construction); may return null (null vector
    * elements null the row's entry), which the generated null check
    * propagates. */
  def compute(x: ArrayData): ArrayData =
    nullSafeEval(x).asInstanceOf[ArrayData]

  /** Real codegen (round 16): one virtual call per row through a plan
    * reference instead of a CodegenFallback Expression walk, keeping
    * the enclosing projection inside its whole-stage span. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      v(i) = VecOps.elem(x, i, isFloat)
      i += 1
    }
    val vn = RoundParity.norm(v)
    // nearest centroid: rounded cosine, score desc / index asc
    var bestC = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroidVecs.length) {
      val cv = centroidVecs(c)
      var d = 0.0
      var j = 0
      val m = math.min(n, cv.length)
      while (j < m) { d += v(j) * cv(j); j += 1 }
      val nn = vn * centroidNorms(c)
      val cs = if (nn > 0) RoundParity.round(d / nn, 4) else 0.0
      if (cs > bestS) { bestS = cs; bestC = c }
      c += 1
    }
    val out = new Array[Any](queryIds.length)
    var q = 0
    while (q < queryIds.length) {
      val qv = queryVecs(q)
      var d = 0.0
      var j = 0
      val m = math.min(n, qv.length)
      while (j < m) { d += v(j) * qv(j); j += 1 }
      val nn = queryNorms(q) * vn
      val sim = if (nn > 0) RoundParity.round(d / nn, 4) else 0.0
      out(q) = org.apache.spark.sql.catalyst.InternalRow(
        queryIds(q), crankByCentroid(q)(bestC).toLong, sim)
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(vec = c)
  override def prettyName: String = "ivf_multi_query_sims"
}

object VectorFunctions {
  import org.apache.spark.sql.GraftBridge

  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpression(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def multiQuerySims(vec: Column, queryIds: Array[Long],
      queryReps: Array[Array[Array[Double]]], queryNorms: Array[Array[Double]],
      scales: Array[Double], bitsWidths: Array[Int]): Column =
    GraftBridge.column(MultiQuerySimsExpression(GraftBridge.expression(vec),
      queryIds, queryReps, queryNorms, scales, bitsWidths))

  def pqMultiQuerySims(vec: Column, queryIds: Array[Long],
      queryVecs: Array[Array[Double]], queryNorms: Array[Double],
      cbVecs: Array[Array[Double]], ms: Array[Int]): Column =
    GraftBridge.column(PqMultiQuerySimsExpression(GraftBridge.expression(vec),
      queryIds, queryVecs, queryNorms, cbVecs, ms))

  def ivfMultiQuerySims(vec: Column, queryIds: Array[Long],
      queryVecs: Array[Array[Double]], queryNorms: Array[Double],
      crankByCentroid: Array[Array[Int]],
      centroidVecs: Array[Array[Double]], centroidNorms: Array[Double]): Column =
    GraftBridge.column(IvfMultiQuerySimsExpression(GraftBridge.expression(vec),
      queryIds, queryVecs, queryNorms, crankByCentroid, centroidVecs, centroidNorms))

  def vecNorm(a: Column): Column =
    GraftBridge.column(L2NormExpression(GraftBridge.expression(a)))

  def lshSignature(vec: Column, planes: Int, dims: Int): Column =
    GraftBridge.column(LshSignatureExpression(
      GraftBridge.expression(vec), planes, dims))
}
