package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Connected components over a near-duplicate pair graph — the step that
 * turns pairwise dup edges into dedup CLUSTERS (transitive closure:
 * A~B, B~C ⇒ {A,B,C} one group, keep one canonical doc per group).
 *
 * Algorithm: iterative min-label propagation. Every vertex starts
 * labeled with its own id; each round every vertex takes the min of its
 * label and its neighbors' labels; at fixpoint all vertices in a
 * component share the component's minimum id. Each round is ONE
 * shuffle (edge⋈label join + min aggregation) — the shape scales to
 * any edge count; rounds needed = component diameter, which for dedup
 * graphs is small. (For adversarial long-chain graphs the
 * large-star/small-star variant — Kiveris et al., "Connected
 * Components in MapReduce and Beyond", SoCC 2014 — converges in
 * O(log² n) rounds; same per-round join shape.)
 *
 * Convergence is detected by the label SUM: labels only ever decrease,
 * so an unchanged sum ⇒ fixpoint — one cheap aggregate per round
 * instead of a change-detection join. Sums are exact decimals.
 */
object ConnectedComponents {

  /**
   * @param vertices one `id` column (LongType) — every node, including
   *                 isolated ones (they become singleton components)
   * @param edges    `src`/`dst` columns (LongType), undirected pairs
   * @return (id, label) — label = min id of the component
   */
  def minLabel(vertices: DataFrame, edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint() // reused every round — don't recompute the pair join
    var labels = vertices.select(col("id"), col("id").as("label")).localCheckpoint()
    var prevSum = BigDecimal(-1)
    var iters = 0
    while (iters < maxIters) {
      val viaNeighbor = und.join(labels, und("src") === labels("id"))
        .select(und("dst").as("id"), col("label"))
      val next = labels.union(viaNeighbor)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val labelSum = BigDecimal(next
        .agg(coalesce(sum(col("label").cast(DecimalType(38, 0))),
          lit(0).cast(DecimalType(38, 0))))
        .collect()(0).getDecimal(0))
      labels = next
      iters += 1
      if (labelSum == prevSum) return labels
      prevSum = labelSum
    }
    labels
  }

  /** Cluster summary: one row per component with its size and canonical
    * (minimum) id. */
  def clusters(labels: DataFrame): DataFrame =
    labels.groupBy(col("label").as("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))
}
