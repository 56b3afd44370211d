package graft

import org.apache.spark.sql.SaveMode

import graft.sources.ProgressTracker

/** Listener-based progress counters: tallies come from Spark write
  * metrics, not per-record counting. */
class ProgressTrackerSpec extends SparkTestBase {

  import spark.implicits._

  test("write tallies and records/s come from query metrics") {
    val tracker = ProgressTracker.attach(spark)
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_test_progress")
      (1 to 1000).toDF("n").write.mode(SaveMode.Overwrite)
        .saveAsTable("graft_test_progress.t1")
      (1 to 500).toDF("n").write.mode(SaveMode.Overwrite)
        .saveAsTable("graft_test_progress.t2")
      // listenerManager's execution listeners dispatch async; poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (tracker.totalRecordsWritten < 1500 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(tracker.totalRecordsWritten == 1500)
      assert(tracker.recordsPerSecond > 0.0)
    } finally {
      tracker.stop()
      spark.sql("DROP DATABASE IF EXISTS graft_test_progress CASCADE")
    }
  }
}
