package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate.topK
import graft.queries.RetrievalQueries

/** Pins q202's ranker-B composite packing (cov*2^32 - len) on the
  * million-char documents the driver data never produces: field
  * separation must hold for len up to and beyond 2^20 (the old
  * packing's silent break point), and a physically-impossible
  * len >= 2^32 must be rejected loudly, not mis-ordered. */
class RetrievalPackingSpec extends SparkTestBase {

  test("ranker-B key orders (cov desc, len asc) across the 2^20 boundary") {
    import spark.implicits._
    // Docs straddling the old 2^20 break point: the correct order by
    // (cov desc, len asc) is 40 (cov=3), then 10, 20, 30 (cov=2, len
    // ascending through 2^20-1, 2^20, 2^20+1), then 50 (cov=1).
    val rows = Seq(
      (10L, 2L, 1048575L), // 2^20 - 1
      (20L, 2L, 1048576L), // exactly 2^20 — old packing corrupted here
      (30L, 2L, 1048577L),
      (40L, 3L, 2000000L), // higher coverage beats any shorter doc
      (50L, 1L, 5L)
    ).toDF("doc_id", "cov", "len")
    val top = rows
      .agg(topK(RetrievalQueries.q202RankerBKey(col("cov"), col("len")),
        col("doc_id"), 5).as("top"))
      .select(posexplode(col("top")).as(Seq("p", "e")))
      .select(col("e.id"))
      .as[Long].collect().toSeq
    assert(top === Seq(40L, 10L, 20L, 30L, 50L))
  }

  test("ranker-B key rejects len >= 2^32 loudly") {
    import spark.implicits._
    val rows = Seq((1L, 2L, 4294967296L)).toDF("doc_id", "cov", "len")
    val ex = intercept[Exception] {
      rows.select(RetrievalQueries.q202RankerBKey(col("cov"), col("len")))
        .collect()
    }
    assert(ex.getMessage.contains("n_chars < 2^32") ||
      Option(ex.getCause).exists(_.getMessage.contains("n_chars < 2^32")))
  }
}
