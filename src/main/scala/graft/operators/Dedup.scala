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
 * Scale design:
 *  - Exact dedup is one hash shuffle on the content hash.
 *  - MinHash/LSH: signatures are computed as a pure map (higher-order
 *    array expressions, codegen'd, no UDF); candidate generation explodes
 *    to (band, bucket) keys and shuffles ONCE on the band hash — never
 *    the O(n²) cross join. Verification runs only inside buckets.
 *  - All hashes derive from md5 (content-seeded) so results are
 *    deterministic across runs, partitionings, and engines.
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

  /**
   * MinHash signature as `k` md5-min strings: the j-th component is
   * min over shingles of md5(j || ':' || shingle). String-min keeps the
   * whole pipeline portable (no numeric hash conversions) and is exactly
   * as collision-resistant for near-dup detection.
   */
  def minhashSignature(text: Column, k: Int = 9, shingle: Int = 3): Column = {
    val sh = wordShingles(text, shingle)
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, s => md5(concat(j.cast(StringType), lit(":"), s)))))
  }

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
   * signature → explode band keys → self-join per bucket (the only
   * shuffle, on band key) → distinct candidate pairs → exact Jaccard
   * verify ≥ threshold.
   *
   * @param df      input with an id column and a text column
   * @return        (id_a, id_b, jaccard) with id_a < id_b
   */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 9, bands: Int = 3, shingle: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingle).as("shingles"),
      minhashSignature(col(textCol), numHashes, shingle).as("sig"))
      .filter(size(col("shingles")) > 0)

    val banded = withSig.select(
      col("id"), col("shingles"),
      explode(array((0 until bands).map(b => bandKey(col("sig"), b, rows)): _*))
        .as("band_key"))

    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
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
  def simhashBits(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val bitSums = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(acc, sequence(lit(0), lit(63)), (a, j) => {
          val hexChar = lower(md5(t)).substr((j / lit(4)).cast(IntegerType) + lit(1), lit(1))
          val bit = floor(hexVal(hexChar) / pow(lit(2.0), (j % lit(4)).cast(DoubleType))).cast(IntegerType) % 2
          a + when(bit === 1, lit(1)).otherwise(lit(-1))
        }))
    aggregate(
      transform(bitSums, s => when(s > 0, lit("1")).otherwise(lit("0"))),
      lit(""), (acc, v) => concat(acc, v))
  }

  /** Hamming distance between two equal-length simhash bit strings. */
  def hammingDistance(a: Column, b: Column): Column =
    size(filter(sequence(lit(1), length(a)),
      i => a.substr(i, lit(1)) =!= b.substr(i, lit(1))))

  /** Exact dedup: keep the smallest id per identical content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
