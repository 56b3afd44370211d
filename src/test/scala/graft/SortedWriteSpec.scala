package graft

import org.apache.spark.sql.functions._

import graft.cache.{SortedWrite, SparkCache}
import graft.sources.Tables

/** Sorted range-partitioned layout: files carry disjoint key ranges
  * (row-group min/max skipping works), data unchanged. */
class SortedWriteSpec extends SparkTestBase {

  import spark.implicits._

  test("files have disjoint sorted ranges and full data survives") {
    val cache = SparkCache.fresh(spark, "graft_test_sorted")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    SortedWrite.writeSorted(o, cache.tableName("orders_nopk"),
      Seq("o_totalprice"), numFiles = 4)

    val t = spark.table(cache.tableName("orders_nopk"))
    assert(t.count() == o.count())
    assert(t.inputFiles.length == 4)

    // per-file (min, max) ranges must not overlap
    val ranges = t.inputFiles.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_totalprice")), max(col("o_totalprice")))
        .as[(Double, Double)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $hi > $lo2")
      case _ =>
    }

    // a selective range predicate must hit a strict subset of files:
    // read pruned by predicate over row-group stats happens at parquet
    // level; at minimum the plan's data filter is pushed
    val filtered = t.filter(col("o_totalprice") < ranges.head._2)
    assert(filtered.count() > 0)
    val pushed = filtered.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("o_totalprice"))
    cache.dropAll()
  }
}
