package graft

import org.apache.spark.sql.functions._

import graft.functions.GramAggregate
import graft.operators.Pca

/**
 * Pins the Gram-fed PCA path: eigenpair residuals, orthogonality,
 * variance capture, and the corpus projection's variance matching the
 * eigenvalue (the defining property of a principal component).
 */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val d = 8

  private def corpus(seed: Int, n: Int): Seq[Seq[Float]] = {
    // anisotropic cloud: two dominant directions with distinct scales
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.5
      (0 until d).map { i =>
        (a * math.sin(i + 1) + b * math.cos(2 * i + 1) +
          rnd.nextGaussian() * 0.1).toFloat
      }
    }
  }

  test("eigenpairs satisfy A v = lambda v, are orthogonal, descending") {
    val vs = corpus(seed = 11, n = 400)
    val g = vs.toDF("embedding")
      .agg(GramAggregate.gram(col("embedding"), d).as("g"))
      .as[Seq[Double]].head().toArray
    val cov = Pca.covariance(g, d)
    val comps = Pca.topComponents(cov, 3)
    assert(comps.map(_._1) == comps.map(_._1).sortBy(-_))
    comps.foreach { case (lambda, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
      val av = cov.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val resid = av.zip(v).map { case (x, y) => x - lambda * y }
      assert(math.sqrt(resid.map(r => r * r).sum) < 1e-6 * (1 + math.abs(lambda)),
        s"eigen residual too large for lambda=$lambda")
    }
    val Seq(v1, v2) = comps.take(2).map(_._2).toSeq
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) < 1e-6)
  }

  test("projected corpus variance equals the eigenvalue; pc columns land on every row") {
    val vs = corpus(seed = 12, n = 500)
    val df = vs.toDF("embedding")
    val out = Pca.projectTopK(df, "embedding", d, 2)
    assert(out.count() == 500 && out.columns.contains("pc1") && out.columns.contains("pc2"))
    val g = df.agg(GramAggregate.gram(col("embedding"), d).as("g"))
      .as[Seq[Double]].head().toArray
    val lambda1 = Pca.topComponents(Pca.covariance(g, d), 1).head._1
    val Array(varP) = out
      .agg((sum(col("pc1") * col("pc1")) / count(lit(1))
        - pow(sum(col("pc1")) / count(lit(1)), 2)).as("v"))
      .as[Double].collect()
    assert(math.abs(varP - lambda1) <= 1e-6 * (1 + lambda1),
      s"projection variance $varP != top eigenvalue $lambda1")
  }
}
