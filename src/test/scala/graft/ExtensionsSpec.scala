package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftSparkExtensions

/** SQL-surface registration of custom expressions via SparkSessionExtensions. */
class ExtensionsSpec extends SparkTestBase {

  test("extensions expose uuid7/simhash/shingle_minhash to spark.sql") {
    // extensions apply at session CREATION: clear the default session so
    // the builder makes a fresh one (sharing the test SparkContext), and
    // restore afterwards — never stop() the shared context.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extSpark = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftSparkExtensions)
        .getOrCreate()
      val row = extSpark.sql(
        """SELECT uuid7() AS id,
          |  simhash('alpha beta gamma') AS sh,
          |  shingle_minhash('a b c d e').sig[0] AS mh,
          |  top_word_count('a b a c a b') AS twc,
          |  cdc_chunks('a b a c a b') AS cdc""".stripMargin)
        .collect()(0)
      assert(row.getString(0).matches(
        "[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
      assert(row.getString(1).length == 64)
      // seeded-splitmix64 family (round 16): components are 20-char
      // zero-padded unsigned decimals
      assert(row.getString(2).length == 20 && row.getString(2).forall(_.isDigit))
      assert(row.getInt(3) == 3) // 'a' appears 3 times
      val cdc = row.getSeq[String](4)
      assert(cdc.nonEmpty && cdc.forall(_.length == 32))
    } finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
