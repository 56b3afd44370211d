package graft.operators

/**
 * Exact-integer top-eigenvector machinery shared by q242/q243 (the
 * PCA queries) and the streaming embedding-drift monitor: covariance
 * from LongGramAggregate's exact sums, then 16 REPEATED MATRIX
 * SQUARINGS (≡ 2¹⁶ power-iteration steps — plain power iteration
 * stalls on near-1 eigengaps) with ±10⁶ fixed-point renormalization,
 * all in BigInt so any two replays — Spark driver, a DuckDB oracle in
 * HUGEINT, a resumed streaming monitor — produce bit-identical
 * loadings. BigInt `/` truncates toward zero, matching Spark `div`
 * and DuckDB `//`.
 */
object IntEigen {

  val Squarings = 16

  /** n·Σxy − Σx·Σy from a LongGram buffer, down-scaled to ≤ ~10⁶
    * entries by one common truncating division. */
  def covScaled(g: IndexedSeq[BigInt], d: Int): Array[Array[BigInt]] = {
    val triLen = d * (d + 1) / 2
    val n = g(triLen + d)
    def sxy(i: Int, j: Int): BigInt = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      g(a * d - a * (a - 1) / 2 + (b - a))
    }
    def sx(i: Int): BigInt = g(triLen + i)
    val cov = Array.tabulate(d, d)((i, j) => n * sxy(i, j) - sx(i) * sx(j))
    val scale = (cov.flatten.map(_.abs).max / 1000000) max BigInt(1)
    cov.map(_.map(_ / scale))
  }

  /** Sign-fixed ±10⁶ fixed-point dominant eigenvector of a scaled
    * integer matrix (largest-|loading| component positive, lowest
    * index on ties; all-zero matrix → zero vector). */
  def topComponent(m: Array[Array[BigInt]]): Array[BigInt] = {
    val d = m.length
    var p = m.map(_.clone)
    var it = 0
    while (it < Squarings) {
      val pp = Array.tabulate(d, d)((i, j) =>
        (0 until d).map(x => p(i)(x) * p(x)(j)).foldLeft(BigInt(0))(_ + _))
      val s = (pp.flatten.map(_.abs).max / 1000000) max BigInt(1)
      p = pp.map(_.map(_ / s))
      it += 1
    }
    // P ≈ rank-1 λ^(2^k)·v₁v₁ᵀ (rescaled): its row sums point along v₁
    val w = Array.tabulate(d)(i => p(i).foldLeft(BigInt(0))(_ + _))
    val mxw = w.map(_.abs).max
    val v = if (mxw > 0) w.map(x => (x * 1000000) / mxw)
            else Array.fill(d)(BigInt(0))
    val maxIdx = v.indices.minBy(i => (-v(i).abs, i))
    val sgn = if (v(maxIdx) < 0) BigInt(-1) else BigInt(1)
    v.map(_ * sgn)
  }

  /** Rayleigh variance-explained share ·10⁶ (λ over trace), exact
    * truncating integer division. */
  def varExplainedMicro(m: Array[Array[BigInt]], vf: Array[BigInt]): BigInt = {
    val d = m.length
    val num = (for (i <- 0 until d; j <- 0 until d) yield m(i)(j) * vf(i) * vf(j))
      .foldLeft(BigInt(0))(_ + _)
    val den = vf.map(x => x * x).foldLeft(BigInt(0))(_ + _)
    val trace = (0 until d).map(i => m(i)(i)).foldLeft(BigInt(0))(_ + _)
    if (den == 0 || trace == 0) BigInt(0) else (num * 1000000) / (den * trace)
  }

  /** Cosine between two fixed-point vectors, in double. */
  def cosine(a: Array[BigInt], b: Array[BigInt]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.foldLeft(BigInt(0))(_ + _)
    val na = math.sqrt(a.map(x => (x * x).toDouble).sum)
    val nb = math.sqrt(b.map(x => (x * x).toDouble).sum)
    if (na == 0.0 || nb == 0.0) 0.0 else dot.toDouble / (na * nb)
  }
}
