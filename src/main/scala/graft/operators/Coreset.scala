package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * k-center greedy coreset selection (Gonzalez 1985 2-approximation;
 * Sener & Savarese 2018 applied it to training-data subset selection):
 * starting from a seed point, repeatedly add the point FARTHEST from
 * the already-chosen set — the classic "maximally diverse subset" rule
 * used to pick representative training examples / dedup epicenters.
 *
 * Distributed shape: the chosen set never exceeds k rows, so each
 * round broadcasts ONE new center vector into a map-side distance
 * update (running min-distance column, localCheckpointed so round t
 * reads a materialized frame, not t stacked projections) and collects
 * ONE argmax row. Corpus work per round is a single scan + a
 * TakeOrdered(1); the corpus itself never shuffles. k rounds total —
 * the same driver-loop shape as Lloyd k-means (q60) and BPE (q135).
 *
 * Determinism: argmax ties break on the smallest id; distances are
 * exact float64 sums of float32 products (each product exact), so the
 * selected sequence is reproducible across partitionings except for
 * genuinely tied sums — which the id tiebreak resolves.
 */
object Coreset {

  /** Squared L2 distance between a vector column and a literal center. */
  private def dist2(vec: Column, center: Array[Float]): Column = {
    val c = array(center.map(x => lit(x.toDouble)): _*)
    aggregate(
      zip_with(vec, c, (x, y) => {
        val d = x.cast(DoubleType) - y; d * d
      }),
      lit(0.0), (acc, x) => acc + x)
  }

  /**
   * Select `k` centers. Returns (round, center_id, sel_dist2) — the
   * squared distance to the chosen set at selection time (round 1 =
   * the seed, distance 0). max(sel_dist2) over the result is the
   * standard k-center coverage-radius² certificate.
   */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int, seedId: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("v"))
      .localCheckpoint()
    def vecOf(id: Long): Array[Float] =
      base.filter(col("id") === id).select(col("v"))
        .as[Seq[Float]].head().toArray

    val picked = scala.collection.mutable.ArrayBuffer((1, seedId, 0.0))
    var state = base.filter(col("id") =!= seedId)
      .withColumn("mind", dist2(col("v"), vecOf(seedId)))
      .localCheckpoint()
    var r = 2
    while (r <= k) {
      val top = state.orderBy(col("mind").desc, col("id")).limit(1)
        .select(col("id"), col("mind")).collect()
      if (top.isEmpty) { r = k + 1 }
      else {
        val (cid, d) = (top(0).getLong(0), top(0).getDouble(1))
        picked += ((r, cid, d))
        state = state.filter(col("id") =!= cid)
          .withColumn("mind", least(col("mind"), dist2(col("v"), vecOf(cid))))
          .localCheckpoint()
        r += 1
      }
    }
    picked.toSeq.toDF("round", "center_id", "sel_dist2")
      .select(col("round"), col("center_id"), round(col("sel_dist2"), 4).as("sel_dist2"))
  }
}
