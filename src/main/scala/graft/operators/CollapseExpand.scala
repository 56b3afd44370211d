package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Member re-expansion for exact-class-collapsed pair operators — the
 * OTHER half of the duplicate-blowup guard, factored once (round 16)
 * after three rounds of near-dup operators shipping uncollapsed and
 * being retrofitted (q114/q106/q116 in r4, q33/q34 in r15).
 *
 * The pattern: collapse exact-duplicate inputs to one class
 * (groupBy content → min-id representative + `members` list), run the
 * quadratic candidate machinery on CLASSES (bucket/posting pair cost
 * then depends on distinct contents, not corpus duplication), and
 * re-expand verified class pairs to member pairs. Correctness
 * invariants this helper owns, pinned by CollapseEquivalenceSpec's
 * property case:
 *
 *  - a verified class pair (a, b) expands to members(a) × members(b)
 *    pairs, ALL inheriting the class-level score (the score is a pure
 *    function of the content, which is identical within a class);
 *  - classes partition ids arbitrarily, so a member of the "b" class
 *    can carry the smaller id — least/greatest restores the id_a <
 *    id_b orientation;
 *  - within-class pairs (exact duplicates) emit with the class's
 *    SELF-score (1.0 Jaccard for identical shingle sets; the self
 *    cosine for vectors) under the same xa < xb orientation, and a
 *    singleton class emits nothing.
 *
 * The expansion cost IS the output size — output is byte-identical to
 * the uncollapsed formulation.
 */
object CollapseExpand {

  /** Cross-class expansion: `(ma, mb, score)` — the two classes'
    * member lists plus the verified class score — to one row per
    * member pair `(id_a, id_b, score)` with id_a < id_b. */
  def crossMembers(pairs: DataFrame, score: String): DataFrame =
    pairs.select(explode(col("ma")).as("xa"), col("mb"), col(score))
      .select(col("xa"), explode(col("mb")).as("xb"), col(score))
      .select(least(col("xa"), col("xb")).as("id_a"),
        greatest(col("xa"), col("xb")).as("id_b"), col(score))

  /** Within-class expansion: `(members, score)` — a class's member
    * list plus its self-score — to all unordered member pairs
    * `(id_a, id_b, score)` with id_a < id_b; singletons emit nothing.
    * Callers gate the frame on their threshold BEFORE expanding (a
    * self-score below the operator's threshold must not expand). */
  def withinMembers(classes: DataFrame, score: String): DataFrame =
    classes.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("xa"), col("members"), col(score))
      .select(col("xa"), explode(col("members")).as("xb"), col(score))
      .filter(col("xa") < col("xb"))
      .select(col("xa").as("id_a"), col("xb").as("id_b"), col(score))

  /** The full re-expansion: cross-class pairs ∪ within-class pairs. */
  def expand(pairs: DataFrame, classes: DataFrame, score: String): DataFrame =
    crossMembers(pairs, score).unionByName(withinMembers(classes, score))
}
