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
    // Iterate ONLY the edge-incident subgraph (round 16): an isolated
    // vertex can never change label, yet it used to ride every round's
    // union + min aggregation. On a dedup graph the near-dup subgraph
    // is a small fraction of the corpus (sf0.1: ~600 of 5000 docs), so
    // each round's shuffle now carries |V_incident| rows instead of
    // |V| — at 100 TB the difference between re-aggregating the corpus
    // per round and re-aggregating the dup sliver. Isolated vertices
    // re-attach as self-labeled singletons at the end.
    // Lineage: every round's frame IS read twice (the convergence sum
    // and the next round's join), so each is localCheckpointed — but
    // LAZILY (round 17): the convergence aggregate right below is the
    // first action on the frame, so ONE job both materializes the
    // checkpoint blocks and computes the label sum, where the former
    // eager checkpoint spent a materialization job AND a sum job per
    // round. Catalyst lineage truncates at the LogicalRDD either way.
    val sub = und.select(col("src").as("id")).distinct().localCheckpoint()
    // labels₀ is a trivial projection of the checkpointed `sub` — its
    // round-16 eager checkpoint was one more startup job for no lineage
    // benefit (round 17)
    var labels = sub.select(col("id"), col("id").as("label"))
    var prevSum = BigDecimal(-1)
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      val viaNeighbor = und.join(labels, und("src") === labels("id"))
        .select(und("dst").as("id"), col("label"))
      val next = labels.union(viaNeighbor)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(eager = false)
      val labelSum = BigDecimal(next
        .agg(coalesce(sum(col("label").cast(DecimalType(38, 0))),
          lit(0).cast(DecimalType(38, 0))))
        .collect()(0).getDecimal(0))
      labels = next
      iters += 1
      if (labelSum == prevSum) converged = true
      prevSum = labelSum
    }
    vertices.select(col("id"))
      .join(sub, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
      .unionByName(labels)
  }

  /** Cluster summary: one row per component with its size and canonical
    * (minimum) id. */
  def clusters(labels: DataFrame): DataFrame =
    labels.groupBy(col("label").as("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))
}
