package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.queries.DedupAuditQueries

/**
 * Pins q256's production overload (`decontamCollateral(train, bench)`)
 * to the synthesized % 7 gate: feeding the overload the % 7 split must
 * reproduce the oracle-gated q256 output bit-for-bit, and a REAL
 * benchmark table (a planted exact copy of a training document) must
 * be reported as removed at every τ in the sweep.
 */
class DecontamOverloadSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def rowKey(r: Row): (Long, String) = (r.getLong(0), r.getString(1))

  test("overload on the % 7 split reproduces the gated q256 output") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val viaOverload = DedupAuditQueries.decontamCollateral(spark,
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("text")))
      .collect().toSeq
    val gated = SparkEntry.queries("q256_decontam_collateral")(spark, dir)
      .collect().toSeq
    assert(viaOverload.map(_.toString).sorted == gated.map(_.toString).sorted)
  }

  test("a planted benchmark copy is removed at every τ") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 =!= 0) // stay off the synthesized bench ids
    // the longest training doc guarantees a non-empty shingle set
    val planted = docs.orderBy(col("n_chars").desc, col("doc_id"))
      .select(col("doc_id"), col("source"), col("text"))
      .limit(1).collect()(0)
    val bench = Seq((999999L, planted.getString(2))).toDF("doc_id", "text")
    val out = DedupAuditQueries.decontamCollateral(spark, docs, bench)
      .filter(col("source") === planted.getString(1))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(350L, 500L, 700L), s"τ sweep rows: $out")
    // J = 1.0 against the planted copy ⇒ removed at every threshold
    out.foreach { case (tau, removed) =>
      assert(removed >= 1L, s"planted copy not removed at τ = $tau‰")
    }
  }
}
