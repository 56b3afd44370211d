package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TopKAggregate

/**
 * Embedding clustering for semantic deduplication (SemDeDup: Abbas et
 * al., arXiv:2303.09540 — cluster the corpus, then prune near-duplicate
 * pairs WITHIN clusters only, turning an O(n²) global pair search into
 * per-cluster local work).
 *
 * Scale shape: centroids are tiny (k × dims) and always BROADCAST; the
 * corpus never shuffles for assignment — one map-side pass per Lloyd
 * iteration. Centroid recomputation is a partial-aggregable groupBy on
 * (cluster, component). At 100 TB the corpus stays put and only k×dims
 * doubles move.
 *
 * Determinism: cosine is computed by the compiled sequential-fold
 * kernels ([[graft.functions.DotProductExpression]]), rounded before
 * ranking, centroid-id ascending tiebreak; component means go through
 * EXACT integer sums (components ×1e6 round to exact integers — float
 * mantissa 24 bits × 2^20 scale < 2^53, so the product is exact in
 * double). Results are therefore independent of partitioning and
 * bit-reproducible across engines.
 */
object Clustering {

  private def cosine(vec: Column, vn: Column, cvec: Column, cvn: Column,
      roundDigits: Int): Column =
    round(when(vn * cvn > 0,
      Similarity.dot(vec, cvec) / (vn * cvn)).otherwise(lit(0.0)), roundDigits)

  /** Deterministic seed centroids: the k lowest-id vectors (a production
    * run would k-means++ these; seeding strategy is orthogonal to the
    * distributed iteration structure). */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    df.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).cast(LongType).as("cid"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("cvec"))

  /**
   * Nearest-centroid assignment by rounded cosine (centroid-id ascending
   * tiebreak): broadcast centroids, bounded top-1 aggregate — the corpus
   * side never shuffles beyond the final per-id fold.
   * Returns (id, cluster, sim).
   */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, roundDigits: Int = 4): DataFrame = {
    val cents = centroids.withColumn("__cvn", Similarity.norm(col("cvec")))
    df.select(col(idCol), col(vecCol))
      .withColumn("__vn", Similarity.norm(col(vecCol)))
      .crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col(vecCol), col("__vn"), col("cvec"), col("__cvn"), roundDigits))
      .groupBy(col(idCol))
      .agg(TopKAggregate.topK(col("__sim"), col("cid"), 1).as("__top"))
      .select(col(idCol),
        col("__top")(0).getField("id").as("cluster"),
        col("__top")(0).getField("score").as("sim"))
  }

  /**
   * One Lloyd refinement: recompute each cluster's centroid as the
   * componentwise mean of its members. Components are summed as exact
   * scaled integers (×1e6) and divided once in double — the resulting
   * centroid is scaled by 1e6, which cosine assignment is invariant to.
   */
  def refineCentroids(df: DataFrame, idCol: String, vecCol: String,
      assignment: DataFrame): DataFrame = {
    val comp = df.join(assignment.select(col(idCol), col("cluster")), idCol)
      .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("comp", round(col("x") * lit(1e6)).cast(LongType))
    comp.groupBy(col("cluster"), col("pos"))
      .agg((sum(col("comp")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("m"))
      .groupBy(col("cluster"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cvec"))
      .select(col("cluster").as("cid"), col("cvec"))
  }

  /** Full Lloyd loop: `iters` × (assign → refine). Plans are truncated
    * per iteration (localCheckpoint) — iterative lineage otherwise grows
    * exponentially. Returns (final centroids, final assignment). */
  def lloyd(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, roundDigits: Int = 4): (DataFrame, DataFrame) = {
    var cents = seedCentroids(df, idCol, vecCol, k).localCheckpoint()
    var asg = assign(df, idCol, vecCol, cents, roundDigits)
    for (_ <- 1 to iters) {
      cents = refineCentroids(df, idCol, vecCol, asg).localCheckpoint()
      asg = assign(df, idCol, vecCol, cents, roundDigits)
    }
    (cents, asg)
  }

  /**
   * SemDeDup pruning: within each cluster, any pair with cosine ≥ `eps`
   * drops the higher id (greedy canonical-by-lowest-id). The pair join
   * is per-cluster local — the clustering IS the blocking structure.
   * Returns the kept rows of `df`.
   */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, eps: Double, roundDigits: Int = 4): DataFrame = {
    val asg = assign(df, idCol, vecCol, centroids, roundDigits)
    val side = df.join(asg.select(col(idCol), col("cluster")), idCol)
      .select(col(idCol).as("id"), col("cluster"),
        col(vecCol).as("vec"))
      .withColumn("n", Similarity.norm(col("vec")))
      .localCheckpoint() // computed once, joined twice
    val a = side.alias("a")
    val b = side.alias("b")
    val dropped = a.join(b,
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .filter(cosine(col("a.vec"), col("a.n"), col("b.vec"), col("b.n"),
        roundDigits) >= eps)
      .select(col("b.id").as("__drop_id")).distinct()
    df.join(dropped, col(idCol) === col("__drop_id"), "left_anti")
  }
}
