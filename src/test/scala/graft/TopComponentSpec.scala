package graft

import org.apache.spark.sql.functions._

import graft.functions.GramAggregate
import graft.operators.Pca

/**
 * Pins q242's integer power iteration against the double-precision
 * eigen solver (operators/Pca.scala) on the real sf0.001 embeddings:
 * the fixed-point loadings must align with the true top eigenvector
 * (|cos| > 0.999 — the 10-iteration fixed count plus milli
 * quantization bound the residual), the sign convention must hold,
 * and the variance-explained share must be a sane fraction.
 */
class TopComponentSpec extends SparkTestBase {
  import spark.implicits._

  test("q242 integer loadings align with the double-precision top eigenvector") {
    val rows = SparkEntry.queries("q242_top_component")(spark, sf()).collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getLong(1).toDouble / 1e6)

    val g = graft.sources.Tables.embeddings(spark, sf())
      .agg(GramAggregate.gram(col("embedding"), 64).as("g"))
      .as[Seq[Double]].head().toArray
    val (lambda, top) = Pca.topComponents(Pca.covariance(g, 64), 1).head

    def norm(x: Seq[Double]) = math.sqrt(x.map(a => a * a).sum)
    val cos = v.zip(top).map { case (a, b) => a * b }.sum / (norm(v.toSeq) * norm(top.toSeq))
    assert(math.abs(cos) > 0.999, s"cosine to true eigenvector was $cos")

    // sign convention: the largest-|loading| component is positive
    assert(v.maxBy(math.abs) > 0)

    // variance explained: a fraction in (0, 1], and consistent with the
    // double-precision eigenvalue share within fixed-point slack
    val ve = rows.head.getLong(2).toDouble / 1e6
    assert(ve > 0.0 && ve <= 1.0)
    val trace = (0 until 64).map(i => Pca.covariance(g, 64)(i)(i)).sum
    assert(math.abs(ve - lambda / trace) < 0.01,
      s"var share $ve vs eigen share ${lambda / trace}")
  }
}
