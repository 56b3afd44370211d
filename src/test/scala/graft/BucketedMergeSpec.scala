package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cache.{BucketedMerge, SparkCache}
import graft.operators.Records

/** Partition-bucketed merge: correctness + partition pruning evidence. */
class BucketedMergeSpec extends SparkTestBase {

  import spark.implicits._

  private def stamped(at: String, rows: (Long, String, Double)*) =
    Records.addMetadata(
      rows.toDF("id", "name", "score"),
      Some(lit(at).cast(TimestampType)))

  test("bucketed merge: last-wins, idempotent, touches only needed buckets") {
    val cache = SparkCache.fresh(spark, "graft_test_bmerge")
    val bm = new BucketedMerge(cache, numBuckets = 8)

    bm.merge("s", stamped("2020-01-01 00:00:00",
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0), (5L, "e", 5.0)), Seq("id"))

    // update one key twice (idempotency) — touches that key's bucket only
    val incoming = stamped("2021-01-01 00:00:00", (3L, "c-new", 30.0))
    val touched1 = bm.merge("s", incoming, Seq("id"))
    val touched2 = bm.merge("s", incoming, Seq("id"))
    assert(touched1 == 1 && touched2 == 1)

    val out = bm.table("s").select("id", "name", "score")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c-new", 30.0),
      (4L, "d", 4.0), (5L, "e", 5.0)))
    cache.dropAll()
  }

  test("merge read is partition-pruned to the touched buckets") {
    val cache = SparkCache.fresh(spark, "graft_test_bprune")
    val bm = new BucketedMerge(cache, numBuckets = 8)
    bm.merge("s", stamped("2020-01-01 00:00:00",
      (1 to 100).map(i => (i.toLong, s"n$i", i.toDouble)): _*), Seq("id"))

    // the pruned-read plan must keep only matching partition directories
    val touchedBucket = spark.range(1).select(
      pmod(hash(lit(42L)), lit(8))).collect()(0).getInt(0)
    val pruned = spark.table(cache.tableName("s"))
      .filter(col("__bucket") === touchedBucket)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(__bucket"),
      s"expected partition filter in:\n$scan")

    // and a merge updating key 42 leaves other partitions' files untouched
    val before = bm.table("s").count()
    bm.merge("s", stamped("2021-01-01 00:00:00", (42L, "updated", 0.0)), Seq("id"))
    assert(bm.table("s").count() == before)
    assert(bm.table("s").filter(col("id") === 42).select("name").as[String].head() == "updated")
    cache.dropAll()
  }
}
