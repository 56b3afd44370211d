package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Min-label propagation contract: transitive closure, singletons,
  * partition invariance. */
class ConnectedComponentsSpec extends SparkTestBase {

  import spark.implicits._

  test("chain, pair, and singleton resolve to min-id components") {
    // 1-2-3 chain (transitive), 4-5 pair, 6 isolated
    val vertices = (1L to 6L).toDF("id")
    val edges = Seq((2L, 3L), (1L, 2L), (4L, 5L)).toDF("src", "dst")
    val labels = ConnectedComponents.minLabel(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    val sizes = ConnectedComponents.clusters(
        ConnectedComponents.minLabel(vertices, edges))
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(1L -> 3L, 4L -> 2L, 6L -> 1L))
  }

  test("long chain converges (diameter rounds) and is partition-invariant") {
    val n = 12L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i + 1, i)).toDF("src", "dst")
    val one = ConnectedComponents.minLabel(
      vertices.repartition(1), edges.repartition(1)).as[(Long, Long)].collect().toMap
    val many = ConnectedComponents.minLabel(
      vertices.repartition(5), edges.repartition(3)).as[(Long, Long)].collect().toMap
    assert(one == many)
    assert(one.values.toSet == Set(1L))
  }
}
