package graft

import org.apache.spark.sql.functions._

import graft.cache.SparkCache
import graft.sources.Tables

/** Cache maintenance: small-file compaction and partition retention. */
class MaintenanceSpec extends SparkTestBase {

  import spark.implicits._

  test("compaction shrinks file count without changing data") {
    val cache = SparkCache.fresh(spark, "graft_test_compact")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    // simulate many small sync outputs: 20 files
    o.repartition(20).write.saveAsTable(cache.tableName("orders_nopk"))
    val before = spark.table(cache.tableName("orders_nopk"))
    val beforeFiles = before.inputFiles.length
    val beforeAgg = before.agg(count(lit(1)), sum(col("o_orderkey")))
      .as[(Long, Long)].head()

    val afterFiles = cache.compactTable("orders_nopk")
    assert(beforeFiles == 20 && afterFiles < beforeFiles,
      s"files before=$beforeFiles after=$afterFiles")
    val afterAgg = spark.table(cache.tableName("orders_nopk"))
      .agg(count(lit(1)), sum(col("o_orderkey"))).as[(Long, Long)].head()
    assert(afterAgg == beforeAgg)
    cache.dropAll()
  }

  test("retention drops only partitions below the cutoff") {
    val cache = SparkCache.fresh(spark, "graft_test_expire")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")).cast("string"))
    ev.repartition(col("event_date"))
      .write.partitionBy("event_date")
      .saveAsTable(cache.tableName("events_by_day"))
    val allDays = spark.table(cache.tableName("events_by_day"))
      .select("event_date").distinct().as[String].collect().sorted
    val cutoff = allDays(allDays.length / 2)
    val expectKept = ev.filter(col("event_date") >= cutoff).count()

    val dropped = cache.expirePartitions("events_by_day", "event_date", cutoff)
    assert(dropped.sorted == allDays.filter(_ < cutoff).toSeq)
    val remaining = spark.table(cache.tableName("events_by_day"))
    assert(remaining.select("event_date").distinct().count() ==
      allDays.count(_ >= cutoff))
    assert(remaining.count() == expectKept)
    cache.dropAll()
  }
}
