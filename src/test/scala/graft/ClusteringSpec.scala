package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Clustering operator contract: Lloyd converges on separable data,
  * results are invariant to input partitioning, SemDeDup prunes only
  * within-cluster near-dups. */
class ClusteringSpec extends SparkTestBase {

  import spark.implicits._

  // two well-separated groups in 4-d (unit-ish vectors near two axes)
  private def toy = Seq(
    (0L, Array(1.0f, 0.05f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.05f, 0.0f)),
    (2L, Array(0.95f, 0.0f, 0.1f, 0.05f)),
    (10L, Array(0.0f, 0.05f, 1.0f, 0.05f)),
    (11L, Array(0.05f, 0.0f, 0.9f, 0.1f)),
    (12L, Array(0.0f, 0.1f, 0.95f, 0.0f))
  ).toDF("id", "vec")

  test("lloyd separates two clusters and converges") {
    // seeds are ids 0 and 1 — both in group A; one Lloyd iteration must
    // pull a centroid over to group B (classic k-means escape)
    val (cents, asg) = Clustering.lloyd(toy, "id", "vec", k = 2, iters = 2)
    assert(cents.count() == 2)
    val byCluster = asg.select("id", "cluster").as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.toSet == Set(Set(0L, 1L, 2L), Set(10L, 11L, 12L)))
  }

  test("assignment is invariant to partitioning") {
    val cents = Clustering.seedCentroids(toy, "id", "vec", 2)
    val one = Clustering.assign(toy.repartition(1), "id", "vec", cents)
      .select("id", "cluster", "sim").as[(Long, Long, Double)].collect().sortBy(_._1)
    val many = Clustering.assign(toy.repartition(7), "id", "vec", cents)
      .select("id", "cluster", "sim").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(one.toSeq == many.toSeq)
  }

  test("refined centroids are exact component means (scaled)") {
    val df = Seq((0L, Array(1.0f, 3.0f)), (1L, Array(3.0f, 5.0f))).toDF("id", "vec")
    val asg = Seq((0L, 7L), (1L, 7L)).toDF("id", "cluster")
    val c = Clustering.refineCentroids(df, "id", "vec", asg)
      .select("cvec").as[Seq[Double]].head()
    // means of (1,3)=2 and (3,5)=4, scaled by 1e6
    assert(c == Seq(2e6, 4e6))
  }

  test("semanticDedup keeps lowest id of near-dup groups, drops the rest") {
    // ids 0,1,2 are mutual near-dups (cosine ~0.99); 10,11,12 likewise.
    // Lloyd-refined centroids put each group in its own cluster; raw
    // seeds (both from group A) would split the A-dups across clusters —
    // SemDeDup recall depends on clustering quality by design.
    val (cents, _) = Clustering.lloyd(toy, "id", "vec", k = 2, iters = 2)
    val kept = Clustering.semanticDedup(toy, "id", "vec", cents, eps = 0.95)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 10L))
    // high threshold: nothing is similar enough to drop
    val keptAll = Clustering.semanticDedup(toy, "id", "vec", cents, eps = 0.9999)
      .select("id").as[Long].collect().toSet
    assert(keptAll == Set(0L, 1L, 2L, 10L, 11L, 12L))
  }
}
