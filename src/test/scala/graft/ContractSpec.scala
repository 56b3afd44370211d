package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Records, WriteStrategies}

/** Driver-contract integrity + skew-path equivalence. */
class ContractSpec extends SparkTestBase {

  import spark.implicits._

  // Queries DELIBERATELY without a DuckDB oracle (driver records a
  // rows-only check) — each must carry its own reference-parity spec:
  //   q135: iterative BPE merge learning — each merge rewrites the
  //   vocabulary the next iteration counts, not one SQL statement;
  //   pinned to a sequential reference implementation by BpeSpec.
  //   q138: k-center greedy coreset — round t's distances depend on
  //   round t-1's pick; pinned to a sequential reference by CoresetSpec.
  //   q143: fertility under q135's learned merges — same driver loop;
  //   BpeSpec pins encode + fertility to a sequential reference.
  //   q155: unigram-LM tokenizer — iterative Viterbi hard-EM, not one
  //   SQL statement; UnigramSpec pins it to a sequential reference.
  private val rowsOnlyQueries = Set("q135_bpe_merges", "q138_coreset",
    "q143_token_fertility", "q155_unigram_tokenizer")

  test("every oracle key has a query; oracle SQL is single-statement SELECT-like") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    assert((qs -- os) == rowsOnlyQueries,
      s"queries without oracles (weaker rows-only check): ${qs -- os -- rowsOnlyQueries}")
    SparkEntry.oracleSql.values.foreach { sql =>
      val first = sql.trim.split("\\s+").head.toUpperCase
      assert(Set("SELECT", "WITH").contains(first), s"unexpected oracle start: $first")
      // multi-statement check must ignore ';' INSIDE string literals
      // (q175's oracle legitimately carries HTML entities like '&#101;')
      val withoutLiterals = sql.replaceAll("'([^']|'')*'", "''")
      assert(!withoutLiterals.trim.stripSuffix(";").contains(";"),
        "multi-statement oracle")
    }
  }

  test("salted dedup is equivalent to plain dedup (incl. hot-key skew)") {
    // hot key 1 with 500 versions; a few cold keys
    val rows = (1 to 500).map(i => (1L, s"v$i", i.toDouble)) ++
      Seq((2L, "x", 1.0), (3L, "y", 2.0))
    // materialize once: uuid7 raw ids are nondeterministic per evaluation,
    // and both paths must see the SAME ids for the tiebreak comparison
    val df = Records.addMetadata(rows.toDF("id", "name", "score"),
      Some((lit("2020-01-01 00:00:00").cast(TimestampType))))
      .localCheckpoint()
    val plain = WriteStrategies.dedupLatest(df, Seq("id"))
      .select("id", "name").as[(Long, String)].collect().toMap
    val salted = WriteStrategies.dedupLatestSalted(df, Seq("id"), salt = 8)
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(plain.keySet == Set(1L, 2L, 3L))
    assert(salted == plain) // same extracted_at ⇒ winner decided by raw_id both paths
  }
}
