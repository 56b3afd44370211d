package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Approximate-nearest-neighbor similarity search over embedding columns
 * (`Array[Float]`). North-star addition (BASELINE.json).
 *
 * Three paths:
 *  - Brute-force top-k: broadcast the (small) query set against the
 *    corpus — exact; the baseline.
 *  - LSH-bucketed: random-hyperplane sign signatures (Charikar, STOC
 *    2002; Indyk/Motwani 1998 for the LSH framework) bucket the corpus;
 *    candidates come only from matching buckets.
 *  - IVF inverted lists (the coarse-quantizer stage of Jégou et al.,
 *    "Product quantization for nearest neighbor search", TPAMI 2011):
 *    centroid-routed partitions, nprobe lists per query.
 *
 * All float math is done in double with a FIXED left-to-right fold
 * (`aggregate`), so results are deterministic regardless of
 * partitioning — a requirement for oracle comparison and for stable
 * re-runs at scale.
 */
object Similarity {

  /** Sequential-fold dot product of two float arrays, in double.
    * Compiled kernel ([[graft.functions.DotProductExpression]]) — the
    * `aggregate(zip_with(...))` formulation is bit-identical but runs
    * interpreted per element, which multiplies by candidates × dims
    * inside pair joins. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** L2 norm (sequential fold, compiled kernel). */
  def norm(a: Column): Column =
    graft.functions.VectorFunctions.vecNorm(a)

  /** Cosine similarity, 0 where either vector is zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /**
   * Exact brute-force top-k neighbors for each query vector.
   * `queries` is expected to be small (it is broadcast); the corpus side
   * never shuffles for the join — only the final per-query top-k windows
   * on the (tiny) candidate set.
   *
   * Ranking uses cosine ROUNDED to `roundDigits` with id ascending as
   * tiebreak — fully deterministic across engines and partitionings.
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int = 3, roundDigits: Int = 4): DataFrame = {
    // norms are per-vector, not per-pair — compute each ONCE before the
    // join (cosine() inline would refold both norms for every pair)
    val c = corpus.withColumn("__cn", norm(col(corpusVec)))
    val q = queries.withColumn("__qn", norm(col(queryVec)))
    val joined = c.crossJoin(broadcast(q))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("sim", round(
        when(col("__cn") * col("__qn") > 0,
          dot(col(corpusVec), col(queryVec)) / (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)), roundDigits))
    topKRows(joined, queryId, corpusId, k)
  }

  /**
   * Per-query top-k via the bounded TypedImperativeAggregate — map-side
   * pruning: each partition forwards at most k candidates per query
   * instead of shuffling every scored pair to a window. Ordering is
   * identical to `row_number over (order by sim desc, id asc)`.
   */
  private def topKRows(scored: DataFrame, queryId: String, corpusId: String,
      k: Int): DataFrame =
    scored.groupBy(col(queryId))
      .agg(graft.functions.TopKAggregate
        .topK(col("sim"), col(corpusId).cast(LongType), k).as("top"))
      .select(col(queryId).as("query_id"),
        posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("query_id"),
        col("entry.id").as("neighbor_id"),
        (col("pos") + 1).cast(LongType).as("rank"),
        col("entry.score").as("sim"))

  /** Random-hyperplane signature: one sign bit per plane → bit string.
    * `dims` is the (fixed) embedding dimensionality. Plane components
    * are deterministic md5-derived Rademacher ±1 draws (first hex char
    * ≥ '8' → +1) — a standard sign-projection family that is portable
    * to SQL oracles. Compiled one-pass kernel
    * ([[graft.functions.LshSignatureExpression]]), bit-identical to the
    * per-plane `aggregate(zip_with(...))` folds it replaces. */
  def lshSignature(vec: Column, planes: Int = 16, dims: Int = 64): Column =
    graft.functions.VectorFunctions.lshSignature(vec, planes, dims)

  /**
   * LSH-bucketed approximate top-k: signature match (optionally on a
   * prefix) prunes candidates, exact cosine reranks within buckets.
   * Recall < 1.0 by construction; the scale path for 100 TB corpora
   * where brute force is infeasible.
   */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int = 3, planes: Int = 16, prefixBits: Int = 8,
      roundDigits: Int = 4): DataFrame = {
    val c = corpus.withColumn("bucket",
        substring(lshSignature(col(corpusVec), planes), 1, prefixBits))
      .withColumn("__cn", norm(col(corpusVec)))
    val q = queries.withColumn("bucket",
        substring(lshSignature(col(queryVec), planes), 1, prefixBits))
      .withColumn("__qn", norm(col(queryVec)))
    val joined = c.join(broadcast(q), Seq("bucket"))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("sim", round(
        when(col("__cn") * col("__qn") > 0,
          dot(col(corpusVec), col(queryVec)) / (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)), roundDigits))
    topKRows(joined, queryId, corpusId, k)
  }

  /**
   * IVF (inverted-file) ANN: the partitioned-index scale path.
   *
   * Build: `nlist` seed centroids (deterministically, the lowest-id
   * vectors — a production build would Lloyd-iterate them; the index
   * structure and query path are identical), every corpus vector assigned
   * to its nearest centroid — ONE broadcast join + bounded top-1, giving
   * an inverted list per centroid. At scale the assignment is the
   * partitioning key: each centroid's list lives together, so a query
   * touches `nprobe` lists instead of the whole corpus.
   *
   * Query: route each query to its `nprobe` nearest centroids, join
   * candidates from only those lists, exact-cosine rerank, bounded top-k.
   * Deterministic end-to-end: rounded sims, id-ascending tiebreaks.
   */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int = 3, nlist: Int = 16, nprobe: Int = 4,
      roundDigits: Int = 4): DataFrame = {
    import graft.functions.TopKAggregate

    val centroids = corpus
      .orderBy(col(corpusId).asc).limit(nlist)
      .select(col(corpusId).as("cid"), col(corpusVec).as("cvec"))
      .withColumn("__cvn", norm(col("cvec")))
      .localCheckpoint()

    def route(df: DataFrame, idC: String, vecC: String, n: Int, out: String) =
      df.withColumn("__vn", norm(col(vecC)))
        .crossJoin(broadcast(centroids))
        .withColumn("__csim", round(
          when(col("__vn") * col("__cvn") > 0,
            dot(col(vecC), col("cvec")) / (col("__vn") * col("__cvn")))
            .otherwise(lit(0.0)), roundDigits))
        .groupBy(col(idC))
        .agg(TopKAggregate.topK(col("__csim"), col("cid"), n).as("top"))
        .select(col(idC), explode(col("top.id")).as(out))

    // inverted lists: corpus vector → nearest centroid
    val assignment = route(corpus, corpusId, corpusVec, 1, "cid")
    val lists = corpus.join(assignment, corpusId)
      .withColumn("__cn", norm(col(corpusVec)))

    // query routing: nprobe lists each
    val probes = queries.join(
      route(queries, queryId, queryVec, nprobe, "cid"), queryId)
      .withColumn("__qn", norm(col(queryVec)))

    val scored = lists.join(probes, "cid")
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("sim", round(
        when(col("__cn") * col("__qn") > 0,
          dot(col(corpusVec), col(queryVec)) / (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)), roundDigits))
    topKRows(scored, queryId, corpusId, k)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, via LSH-prefix
    * bucketing (same-bucket candidates only) — never O(n²).
    *
    * Exact-VECTOR-class collapse first (q31's duplicate-blowup guard,
    * round 15): bucket pair generation is quadratic in bucket
    * MEMBERSHIP and identical vectors always land in the same bucket,
    * so a corpus with vector-duplication factor d costs d² more per
    * bucket raw — the 10× replica measured 37× wall uncollapsed.
    * Collapsed, each distinct vector is hashed and joined once; a
    * verified class pair (a, b) expands to members(a) × members(b)
    * output pairs carrying the class-level sim (identical vectors ⇒
    * identical dot products), and within-class pairs carry the class
    * self-cosine (1.0 after rounding for any nonzero vector; zero
    * vectors score 0.0 and fall to the threshold exactly as the
    * uncollapsed join scored them). Output is identical to the
    * uncollapsed formulation; the expansion cost IS the output size. */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 16, prefixBits: Int = 8,
      roundDigits: Int = 4): DataFrame = {
    // bucket + norm computed once per distinct vector and materialized —
    // the self-join would otherwise re-derive the signature per side,
    // and the member lists ride along for the expansion
    val classes = df.select(col(idCol).as("id0"), col(vecCol).as("vec"))
      .groupBy(col("vec"))
      .agg(min(col("id0")).as("id"), collect_list(col("id0")).as("members"))
      .withColumn("bucket", substring(lshSignature(col("vec"), planes), 1, prefixBits))
      .withColumn("norm", norm(col("vec")))
      .localCheckpoint()
    val a = classes.alias("a")
    val b = classes.alias("b")
    val classPairs = a
      .join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", round(
        when(col("a.norm") * col("b.norm") > 0,
          dot(col("a.vec"), col("b.vec")) / (col("a.norm") * col("b.norm")))
          .otherwise(lit(0.0)), roundDigits))
      .filter(col("sim") >= threshold)
      .select(col("a.members").as("ma"), col("b.members").as("mb"), col("sim"))
    // member re-expansion (CollapseExpand owns the invariants); the
    // within-class self-score is the class self-cosine — 1.0 after
    // rounding for any nonzero vector, 0.0 for zero vectors, gated on
    // the threshold exactly as the uncollapsed join scored them
    val withinClasses = classes
      .withColumn("sim", round(
        when(col("norm") * col("norm") > 0,
          dot(col("vec"), col("vec")) / (col("norm") * col("norm")))
          .otherwise(lit(0.0)), roundDigits))
      .filter(col("sim") >= threshold)
      .select(col("members"), col("sim"))
    CollapseExpand.expand(classPairs, withinClasses, "sim")
  }
}
