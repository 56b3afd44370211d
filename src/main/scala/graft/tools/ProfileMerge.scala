package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.operators.Records
import graft.protocol._
import graft.sources.Tables

/** Phase timer for the merge write path (q20-shaped). */
object ProfileMerge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val catalog = ConfiguredCatalog(Seq(
      ConfiguredStream("orders", new StructType(), primaryKeys = Seq("o_orderkey"))))

    (1 to 2).foreach { round =>
      println(s"round $round")
      val cache = phase("freshCache")(SparkCache.fresh(spark, "graft_prof"))
      val orders = Tables.orders(spark, dir)
      val stamped = Records.addMetadata(orders,
        Some(lit("2020-01-01 00:00:00").cast(TimestampType)))
      phase("merge#1 (initial)")(
        cache.writeStream("orders", stamped, catalog, WriteStrategy.Merge))
      val incoming = Records.addMetadata(
        orders.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(100.0)),
        Some(lit("2021-01-01 00:00:00").cast(TimestampType)))
      phase("merge#2 (upsert)")(
        cache.writeStream("orders", incoming, catalog, WriteStrategy.Merge))
      phase("merge#3 (idempotent)")(
        cache.writeStream("orders", incoming, catalog, WriteStrategy.Merge))
      phase("final agg")(
        cache.table("orders").groupBy(col("o_orderstatus"))
          .agg(count(lit(1))).collect())
    }
    spark.stop()
  }
}
