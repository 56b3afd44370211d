package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.SuffixArray
import graft.sources.Tables

/**
 * Suffix-array queries — the unbounded exact-repeat surface (Lee et
 * al. 2022 exact-substring dedup). Both run on the deterministic
 * doc_id % 10 = 0 audit shard so the DuckDB oracle (which sorts the
 * actual suffix token lists — fine at test SF, impossible at corpus
 * scale) stays tractable; the Spark side runs the same prefix-doubling
 * plan it would run corpus-wide, where nothing ever materializes a
 * suffix: every round compares fixed-size integer pairs.
 */
object SuffixQueries {

  private def shard(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0)

  // ------------------------------------------------------------------
  // q163: suffix-array ranks — dense rank of every corpus suffix in
  // lexicographic token order, built by prefix doubling (log-rounds of
  // sort+join over integer pairs; dense numbering via range-sort +
  // distributed prefix sum, never a one-partition window). Output is a
  // deterministic 1-in-7 sample of (doc_id, pos, rank); the oracle
  // recomputes the same ranks by brute-force sorting the suffix lists.
  // ------------------------------------------------------------------
  def q163SuffixRanks(spark: SparkSession, dir: String): DataFrame = {
    val sa = SuffixArray.build(shard(spark, dir), "doc_id", "text")
    sa.ranks
      .filter((col("d") * 131 + col("p")) % 7 === 0)
      .select(col("d").as("doc_id"), col("p").as("pos"), col("rank"))
      .orderBy(col("doc_id").asc, col("pos").asc)
  }

  val q163Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
      |  FROM documents WHERE doc_id % 10 = 0),
      |suf AS (
      |  SELECT doc_id, pos, list_slice(tl, pos, len(tl)) AS s
      |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl) + 1)) AS pos
      |        FROM toks)),
      |r AS (
      |  SELECT doc_id, pos,
      |    CAST(DENSE_RANK() OVER (ORDER BY s) AS BIGINT) AS rank
      |  FROM suf)
      |SELECT doc_id, pos, rank FROM r
      |WHERE (doc_id * 131 + pos) % 7 = 0
      |ORDER BY doc_id, pos""".stripMargin

  // ------------------------------------------------------------------
  // q164: longest repeated token spans — the exact-substring-dedup
  // primitive: max-LCP over suffix-array-adjacent suffix pairs finds
  // the longest span occurring twice anywhere in the corpus, at ANY
  // length (q106/q116 fix a window up front; this doesn't). LCPs come
  // from the sparse-table descent over the doubling rounds — 2·log(n)
  // keyed joins on the adjacent-pair set. Output: top-10 spans by
  // (length, position), with the span text reconstructed.
  // ------------------------------------------------------------------
  def q164LongestRepeats(spark: SparkSession, dir: String): DataFrame = {
    val docs = shard(spark, dir)
    val sa = SuffixArray.build(docs, "doc_id", "text")
    val ord = SuffixArray.order(sa).localCheckpoint()
    val pairs = ord.as("a")
      .join(ord.as("b"), col("b.rn") === col("a.rn") + 1)
      .select(col("a.d").as("da"), col("a.p").as("pa"),
        col("b.d").as("db"), col("b.p").as("pb"))
    val withLcp = SuffixArray.lcp(sa, pairs).filter(col("lcp") >= 1)
    val arrays = docs.select(col("doc_id").as("da"),
      array_remove(split(col("text"), " "), "").as("tl"))
    withLcp
      .join(arrays, Seq("da"))
      .select(col("lcp"), col("da"), col("pa"), col("db"), col("pb"),
        concat_ws(" ", slice(col("tl"), col("pa"),
          col("lcp").cast(IntegerType))).as("span"))
      .orderBy(col("lcp").desc, col("da").asc, col("pa").asc,
        col("db").asc, col("pb").asc)
      .limit(10)
  }

  val q164Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
      |  FROM documents WHERE doc_id % 10 = 0),
      |suf AS (
      |  SELECT doc_id, pos, list_slice(tl, pos, len(tl)) AS s
      |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl) + 1)) AS pos
      |        FROM toks)),
      |ord AS (
      |  SELECT doc_id, pos, s,
      |    ROW_NUMBER() OVER (ORDER BY s, doc_id, pos) AS rn
      |  FROM suf),
      |adj AS (
      |  SELECT a.doc_id AS da, a.pos AS pa, b.doc_id AS db, b.pos AS pb,
      |    a.s AS sa, b.s AS sb
      |  FROM ord a JOIN ord b ON b.rn = a.rn + 1),
      |l AS (
      |  SELECT da, pa, db, pb,
      |    CAST(len(list_filter(range(1, least(len(sa), len(sb)) + 1),
      |      i -> list_slice(sa, 1, i) = list_slice(sb, 1, i))) AS BIGINT)
      |      AS lcp,
      |    sa
      |  FROM adj)
      |SELECT lcp, da, pa, db, pb,
      |  array_to_string(list_slice(sa, 1, lcp), ' ') AS span
      |FROM l WHERE lcp >= 1
      |ORDER BY lcp DESC, da, pa, db, pb
      |LIMIT 10""".stripMargin
}
