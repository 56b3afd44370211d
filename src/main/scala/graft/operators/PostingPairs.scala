package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact pair-intersection counts over df-capped shingle postings — the
 * shared pair engine of the exact dedup calibration anchors (q233's
 * threshold curve, q255's exact edge set, q146's ground truth).
 *
 * Input frame: one row per class, (id, sh, n) with `sh` a DISTINCT
 * shingle array and `n` its size. Output: (id_a, id_b, n_a, n_b, inter)
 * for id_a < id_b, where `inter` counts shared shingles whose document
 * frequency is ≤ cap.
 *
 * Shape (round-16 optimization): ONE groupBy(s) collects each shingle's
 * posting list, the df ≤ cap filter is a size() test on the list, and
 * pairs explode IN-BUCKET (the cap bounds the per-bucket blowup at
 * cap², exactly the bound the old posting self-join had). This replaces
 * the former postings-alias self-join, which planned the df-tally
 * subtree + its broadcast ONCE PER SIDE (no exchange reuse fired) and
 * shuffled the posting rows again for the pair aggregation: measured at
 * sf0.1, the pair fragment fell 3.3 s → 1.9 s with bit-identical
 * output (PostingPairsSpec pins the parity property).
 *
 * Exactness: postings are distinct per (id, s) by construction (one row
 * per class, `sh` distinct), so a pair is counted once per shared
 * capped shingle — identical to the join formulation the oracles
 * replay. No hashing anywhere: string shingles compare by value.
 *
 * The bucket collect is BOUNDED at cap+1 elements (round 17,
 * [[graft.functions.BoundedCollectList]]): a boilerplate shingle with
 * corpus-scale df must not build an O(df) aggregation buffer in one
 * task only to be discarded by the size() test — at cap+1 the filter's
 * verdict is already decided either way (≤ cap ⇒ the list is complete
 * and exact; = cap+1 ⇒ above cap, discarded), so results are identical
 * while above-cap buckets cost O(cap) memory.
 */
object PostingPairs {
  def cappedPairInter(withSh: DataFrame, cap: Int): DataFrame =
    withSh.select(col("id"), col("n"), explode(col("sh")).as("s"))
      .groupBy(col("s"))
      .agg(graft.functions.BoundedCollectList.boundedCollectList(
        struct(col("id"), col("n")), cap + 1).as("lst"))
      .filter(size(col("lst")) <= cap)
      .select(explode(col("lst")).as("a"), col("lst"))
      .select(col("a"), explode(col("lst")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
}
