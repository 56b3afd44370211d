package graft

import org.apache.spark.sql.SaveMode

import graft.operators.DataQuality

/** In-plan data-quality counters: computed inside the write job,
  * surfaced on the listener bus. */
class DataQualitySpec extends SparkTestBase {

  import spark.implicits._

  test("observe metrics report rows, null PKs, and watched-column nulls") {
    val collector = new DataQuality.Collector(spark)
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_test_dq")
      val batch = Seq(
        (Some(1L), Some("a")), (Some(2L), None), (None, Some("c")), (None, None)
      ).toDF("id", "name")
      DataQuality.observed(batch, "ingest_q", pkCols = Seq("id"), watchCols = Seq("name"))
        .write.mode(SaveMode.Overwrite).saveAsTable("graft_test_dq.t")
      val deadline = System.nanoTime() + 10e9.toLong
      var m: Option[Map[String, Any]] = None
      while (m.isEmpty && System.nanoTime() < deadline) {
        m = collector.metrics("ingest_q"); if (m.isEmpty) Thread.sleep(50)
      }
      val got = m.getOrElse(fail("no observed metrics arrived"))
      assert(got("row_count") == 4L)
      assert(got("null_pk_count") == 2L)
      assert(got("null_name_count") == 2L)
    } finally {
      collector.stop()
      spark.sql("DROP DATABASE IF EXISTS graft_test_dq CASCADE")
    }
  }
}
