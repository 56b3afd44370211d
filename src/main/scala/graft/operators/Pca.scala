package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GramAggregate

/**
 * Principal components from the single-pass Gram aggregate: the corpus
 * contributes ONE distributed pass ([[GramAggregate]] — fixed-size
 * partial buffers, no shuffle of vectors); eigenvectors of the d×d
 * covariance are then a DRIVER-side power iteration with deflation
 * (d ≤ a few hundred for embedding audits — the d×d eigensolve is
 * microscopic next to the corpus pass, which is why MLlib's
 * RowMatrix.computePrincipalComponents makes the same split).
 * Projection back onto the corpus is a per-row dot product (zero
 * shuffle, broadcast-sized component vectors in the expression tree).
 */
object Pca {

  /** Covariance matrix (d×d, row-major) from a [[GramAggregate]] buffer. */
  def covariance(g: Array[Double], d: Int): Array[Array[Double]] = {
    val triLen = d * (d + 1) / 2
    val n = g(triLen + d)
    require(n > 0, "covariance of an empty corpus")
    val cov = Array.ofDim[Double](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      val c = (g(k) - g(triLen + i) * g(triLen + j) / n) / n
      cov(i)(j) = c; cov(j)(i) = c
      k += 1
    }
    cov
  }

  /** Top-`k` (eigenvalue, eigenvector) pairs of a symmetric matrix via
    * power iteration with deflation. Deterministic start vector (uniform
    * 1/√d) — no RNG, reproducible across runs. Eigenvector sign is
    * normalized so the largest-magnitude component is positive. */
  def topComponents(m: Array[Array[Double]], k: Int,
      iters: Int = 200): Seq[(Double, Array[Double])] = {
    val d = m.length
    val a = m.map(_.clone())
    (0 until math.min(k, d)).map { _ =>
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var lambda = 0.0
      var it = 0
      while (it < iters) {
        val w = new Array[Double](d)
        for (i <- 0 until d) {
          var s = 0.0
          for (j <- 0 until d) s += a(i)(j) * v(j)
          w(i) = s
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm == 0.0) { it = iters } // deflated to zero: stop
        else {
          v = w.map(_ / norm)
          lambda = norm
          it += 1
        }
      }
      // Rayleigh quotient for a signed eigenvalue (power-iteration norm
      // is |λ|); vᵀ A v with unit v.
      var rq = 0.0
      for (i <- 0 until d; j <- 0 until d) rq += v(i) * a(i)(j) * v(j)
      // sign normalization for reproducibility
      val mx = v.indices.maxBy(i => math.abs(v(i)))
      val vv = if (v(mx) < 0) v.map(-_) else v
      // deflate: A ← A − λ vvᵀ
      for (i <- 0 until d; j <- 0 until d) a(i)(j) -= rq * vv(i) * vv(j)
      (rq, vv)
    }
  }

  /** Per-row projection of an embedding column onto a component vector:
    * Σ_i x_i·v_i as a codegen'd higher-order expression (no UDF). */
  def project(vec: Column, v: Array[Double]): Column = {
    val lits = array(v.map(lit): _*)
    aggregate(
      zip_with(vec, lits, (x, c) => x.cast("double") * c),
      lit(0.0), (acc, x) => acc + x)
  }

  /**
   * End-to-end: one corpus pass → covariance → top-k components →
   * per-row principal coordinates appended as pc1..pck.
   */
  def projectTopK(df: DataFrame, vecCol: String, d: Int, k: Int): DataFrame = {
    val g = df.agg(GramAggregate.gram(col(vecCol), d).as("g"))
      .head().getSeq[Double](0).toArray
    val comps = topComponents(covariance(g, d), k)
    comps.zipWithIndex.foldLeft(df) { case (acc, ((_, v), i)) =>
      acc.withColumn(s"pc${i + 1}", project(col(vecCol), v))
    }
  }
}
