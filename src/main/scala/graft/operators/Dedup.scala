package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, and n-gram Jaccard. North-star additions (BASELINE.json) on top
 * of the reference's PK-merge dedup (SURVEY §2.3 J2).
 *
 * Algorithms follow the published literature: MinHash resemblance
 * (Broder, "On the resemblance and containment of documents", 1997),
 * LSH banding (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
 * ch. 3), SimHash (Charikar, "Similarity estimation techniques from
 * rounding algorithms", STOC 2002; Manku et al., WWW 2007 for near-dup
 * detection at web scale).
 *
 * Scale design:
 *  - Exact dedup is one hash shuffle on the content hash.
 *  - MinHash/LSH: signatures are computed as a pure map (higher-order
 *    array expressions, codegen'd, no UDF); candidate generation explodes
 *    to (band, bucket) keys and shuffles ONCE on the band hash — never
 *    the O(n²) cross join. Verification runs only inside buckets.
 *  - All hashes derive from md5 + the frozen splitmix64 finalizer
 *    (content-seeded) so results are deterministic across runs,
 *    partitionings, and engines.
 */
object Dedup {

  /** Word n-gram shingles of the text ("a b c", n=3 → ["a b c", ...]).
    * Returns [] for texts shorter than n tokens. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val count = size(toks) - lit(n - 1)
    // sequence(1, 0) would DESCEND ([1,0]) — guard short texts explicitly
    when(count >= 1,
      transform(sequence(lit(1), count),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  // The MinHash signature family (component j = min over shingles of
  // splitmix64(md5u64(shingle) XOR j·GOLDEN), 20-char zero-padded
  // unsigned decimals so lexicographic min ≡ unsigned-numeric min) is
  // computed by the compiled ShingleMinhashExpression kernel — use
  // TextHashFunctions.shingleMinhash(text, k, n): one pass yields both
  // the shingles and the signature, and MinhashSql replays the family
  // byte-for-byte in DuckDB HUGEINT arithmetic. k independently seeded
  // permutations make P(component match) = Jaccard per component, the
  // independence the 1−(1−s^r)^b banding recall math needs; the
  // retired rotation-of-one-digest family was measurably correlated
  // mid-range (q260's round-15 calibration).

  /** One LSH band key: md5 over a slice of the signature components.
    * Docs sharing any band key become candidate pairs. */
  def bandKey(signature: Column, band: Int, rows: Int): Column =
    md5(concat_ws("|", slice(signature, band * rows + 1, rows), lit(band.toString)))

  /** Exact Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(array_union(a, b)).cast(DoubleType)
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /**
   * MinHash+LSH near-duplicate PAIRS:
   * exact-duplicate collapse → signature → explode band keys →
   * self-join per bucket (shuffles only class-representative ids) →
   * distinct candidate pairs → exact Jaccard verify ≥ threshold →
   * re-expand class pairs to document pairs.
   *
   * The up-front collapse (groupBy content) is the duplicate-blowup
   * guard: LSH bucket pair generation is quadratic in bucket
   * MEMBERSHIP, so a corpus with duplication factor d costs d² more per
   * bucket raw (the 10× replica scale stress measured 15× wall).
   * Collapsed, banding sees each distinct content once; exact-copy
   * pairs are reconstructed as within-class pairs (Jaccard exactly 1.0
   * — identical shingle sets) and a verified class pair (a, b) expands
   * to members(a) × members(b) document pairs, all with the class-level
   * Jaccard (the score depends only on text). Output is identical to
   * the uncollapsed formulation; the expansion cost IS the output size.
   *
   * @param df      input with an id column and a text column
   * @return        (id_a, id_b, jaccard) with id_a < id_b
   */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 9, bands: Int = 3, shingle: Int = 3): DataFrame = {
    val rows = numHashes / bands
    // one content class per distinct text: representative id + members
    val classes = df.groupBy(col(textCol).as("__text"))
      .agg(min(col(idCol)).as("id"), collect_list(col(idCol)).as("members"))
    // One compiled pass per class for shingles+signature (the declarative
    // higher-order form is interpreted per element — measured ~25 s at
    // sf0.1 vs ~1 s compiled). localCheckpoint materializes it once: the
    // banded self-join, the shingle re-join, and the member expansion all
    // reference this frame, and the struct would otherwise be re-evaluated
    // per projected field. On a cluster this is a cached intermediate /
    // reliable checkpoint.
    val withSig = classes.select(
      col("id"), col("members"),
      graft.functions.TextHashFunctions
        .shingleMinhash(col("__text"), numHashes, shingle).as("sm"))
      .localCheckpoint()
      .select(col("id"), col("members"),
        col("sm.shingles").as("shingles"), col("sm.sig").as("sig"))
      .filter(size(col("shingles")) > 0)

    // candidate generation carries ONLY ids through the band shuffle and
    // pair dedup — the shingle arrays (wide) are re-joined afterwards just
    // for the surviving pairs. At scale this is the difference between
    // shuffling ids and shuffling whole documents.
    val banded = withSig.select(
      col("id"),
      explode(array((0 until bands).map(b => bandKey(col("sig"), b, rows)): _*))
        .as("band_key"))

    val candidates = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val shingleSets = withSig.select(col("id"), col("shingles"))
    val classPairs = candidates
      .join(shingleSets.withColumnRenamed("id", "id_a")
        .withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(shingleSets.withColumnRenamed("id", "id_b")
        .withColumnRenamed("shingles", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

    // member re-expansion (CollapseExpand owns the invariants): every
    // cross-class member pair inherits the class score; within-class
    // pairs are exact duplicates — identical texts share every band key
    // and have Jaccard exactly 1.0, so the uncollapsed pipeline always
    // emits them (when shingles are nonempty and the threshold admits
    // 1.0).
    val membersOf = withSig.select(col("id"), col("members"))
    val pairsWithMembers = classPairs
      .join(membersOf.select(col("id").as("id_a"), col("members").as("ma")), "id_a")
      .join(membersOf.select(col("id").as("id_b"), col("members").as("mb")), "id_b")
      .select(col("ma"), col("mb"), col("jaccard"))
    val withinClasses = withSig
      .filter(lit(1.0) >= lit(threshold))
      .select(col("members"), lit(1.0).as("jaccard"))
    CollapseExpand.expand(pairsWithMembers, withinClasses, "jaccard")
  }

  /**
   * Persistent LSH index for INCREMENTAL dedup: (id, shingles,
   * band_key) — one row per (doc, band). At scale this is computed once
   * per corpus and stored as a table bucketed by `band_key`; new
   * batches probe it without re-hashing the corpus.
   */
  def signatureIndex(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 9, bands: Int = 3, shingle: Int = 3): DataFrame = {
    val rows = numHashes / bands
    df.select(
        col(idCol).as("id"),
        graft.functions.TextHashFunctions
          .shingleMinhash(col(textCol), numHashes, shingle).as("sm"))
      .localCheckpoint()
      .select(col("id"), col("sm.shingles").as("shingles"), col("sm.sig").as("sig"))
      .filter(size(col("shingles")) > 0)
      .select(col("id"), col("shingles"),
        explode(array((0 until bands).map(b => bandKey(col("sig"), b, rows)): _*))
          .as("band_key"))
  }

  /**
   * Probe an incoming batch against a prebuilt [[signatureIndex]]: the
   * batch-vs-corpus shape of production dedup — a sync's new documents
   * check against the full history WITHOUT re-hashing it. The incoming
   * side is typically tiny relative to the index, so its banded form
   * broadcasts and the corpus index never shuffles (with a bucketed
   * index table even the probe join is co-located). Candidates carry
   * ids only; exact Jaccard verifies survivors.
   *
   * @return (new_id, corpus_id, jaccard ≥ threshold)
   */
  def probeNearDups(
      incoming: DataFrame, index: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 9, bands: Int = 3, shingle: Int = 3): DataFrame = {
    val probe = signatureIndex(incoming, idCol, textCol, numHashes, bands, shingle)
    val candidates = probe.select(col("id").as("new_id"), col("band_key"))
      .join(index.select(col("id").as("corpus_id"), col("band_key")), "band_key")
      .select(col("new_id"), col("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
    // Restrict to candidate ids BEFORE deduplicating shingle sets: the
    // probe side may be the BIG side (q134 runs the whole training
    // corpus against a tiny benchmark index), and dedup-then-join would
    // shuffle every probe document's shingle array; semi-join first and
    // only candidate survivors (a broadcast-sized set when the index
    // side is small) reach the dedup exchange.
    val newSets = probe.select(col("id").as("new_id"), col("shingles").as("sh_n"))
      .join(candidates.select(col("new_id")).distinct(), Seq("new_id"), "left_semi")
      .dropDuplicates("new_id")
    val corpusSets = index.select(col("id").as("corpus_id"), col("shingles").as("sh_c"))
      .join(candidates.select(col("corpus_id")).distinct(), Seq("corpus_id"), "left_semi")
      .dropDuplicates("corpus_id")
    candidates
      .join(newSets, "new_id")
      .join(corpusSets, "corpus_id")
      .withColumn("jaccard", jaccard(col("sh_n"), col("sh_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** md5 hex char → 0-15 via a literal lookup map (codegen-friendly,
    * portable — no engine-specific hex parsing). */
  private def hexVal(c: Column): Column = {
    val entries = "0123456789abcdef".zipWithIndex.flatMap {
      case (ch, v) => Seq(lit(ch.toString), lit(v))
    }
    element_at(map(entries: _*), c)
  }

  /**
   * SimHash per document as a 64-char bit string: for each bit j, sum
   * ±1 over the document's token hashes (md5 hex-char bits); '1' where
   * the sum is positive. A bit STRING (not a long) keeps bit 63 exact
   * and the whole operator portable to SQL oracles. Pure per-row
   * higher-order expressions — no shuffle, no UDF.
   */
  def simhashBits(text: Column): Column =
    graft.functions.TextHashFunctions.simhash(text)

  /** Hamming distance between two equal-length '0'/'1' bit strings.
    * Folds 32-char chunks through conv(·,2,10) → XOR → bit_count, so a
    * 64-bit fingerprint costs two popcounts instead of 64 per-position
    * lambda evaluations — this runs inside band-join conditions where a
    * skewed corpus can put 10^5+ candidate pairs through it (q124). */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(
      sequence(lit(0), floor((length(a) + 31) / 32).cast(IntegerType) - 1),
      lit(0),
      (acc, i) => acc + bit_count(
        conv(a.substr(i * 32 + 1, lit(32)), 2, 10).cast(LongType)
          .bitwiseXOR(
            conv(b.substr(i * 32 + 1, lit(32)), 2, 10).cast(LongType))))

  /** Exact dedup: keep the smallest id per identical content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /**
   * Exact-dup collapse as a PRE-STAGE for near-dup blocking: one row per
   * distinct content — `(rep_id = min id, copies, text)`. LSH bucket and
   * prefix-filter pair generation is quadratic in the number of bucket
   * members, so a corpus with duplication factor d costs d² more per
   * bucket run raw; collapsed, near-dup cost depends only on DISTINCT
   * contents (the 10× scale study measured MinHash-LSH 15× slower on a
   * 10×-duplicated corpus raw vs ~2× collapsed). Downstream, a pair of
   * content classes (a,b) stands for copies_a·copies_b underlying
   * document pairs, and within-class pairs are exact duplicates by
   * construction.
   */
  def exactCollapse(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("rep_id"),
        count(lit(1)).as("copies"),
        min(col(textCol)).as("text"))
      .select(col("rep_id"), col("copies"), col("text"))
}
