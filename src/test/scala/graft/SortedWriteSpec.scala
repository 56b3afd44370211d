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

  test("mortonKey interleaves bits: x→even positions, y→odd") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(SortedWrite.mortonKey(col("x"), col("y"), 8).as("z"))
    // morton(5,3): x=101 → bits 0,4; y=011 → bits 1,3 ⇒ 1+2+8+16 = 27
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("mortonKey is a bijection: decoding the key recovers (x, y)") {
    val rng = new scala.util.Random(42)
    val pts = Seq.fill(200)((rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), SortedWrite.mortonKey(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    zs.foreach { case (x, y, z) =>
      var (dx, dy) = (0L, 0L)
      (0 until 16).foreach { i =>
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((dx, dy) == (x, y), s"morton($x,$y)=$z decoded to ($dx,$dy)")
    }
  }

  test("z-ordered layout keeps data intact and bounds both dimensions per file") {
    val cache = SparkCache.fresh(spark, "graft_test_zorder")
    val ev = Tables.events(spark, sf())
      .withColumn("day", unix_date(to_date(col("ts"))).cast("long"))
    SortedWrite.writeZOrdered(ev, cache.tableName("events_z"),
      "user_id", "day", numFiles = 4)

    val t = spark.table(cache.tableName("events_z"))
    assert(t.count() == ev.count())
    assert(!t.columns.contains("__z"), "morton key must not leak into the table")

    // each file must cover a rectangle strictly smaller than the global
    // extent in at least one dimension (z-clustering compactness) —
    // a random layout would give every file the full global range
    val global = ev.agg(
      (max(col("user_id")) - min(col("user_id"))).as("uspan"),
      (max(col("day")) - min(col("day"))).as("dspan"))
      .as[(Long, Long)].head()
    val tighter = t.inputFiles.count { f =>
      val (us, ds) = spark.read.parquet(f).agg(
        (max(col("user_id")) - min(col("user_id"))).as("us"),
        (max(col("day")) - min(col("day"))).as("ds"))
        .as[(Long, Long)].head()
      us < global._1 || ds < global._2
    }
    assert(tighter > 0, "no file has sub-global min/max spans on either dimension")
    cache.dropAll()
  }
}
