package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.operators.Records
import graft.protocol._
import graft.sources.Tables

/** Phase timer for the merge write path (q20 shape) at sf0.1. */
object ProfileMerge {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    val orders = Tables.orders(spark, dir)
    val catalog = ConfiguredCatalog(Seq(
      ConfiguredStream("orders", new StructType(), primaryKeys = Seq("o_orderkey"))))
    def stamp(df: org.apache.spark.sql.DataFrame, at: String) =
      Records.addMetadata(df, Some(lit(at).cast(TimestampType)))

    for (round <- 1 to 2) {
      println(s"[profile] --- round $round ---")
      val cache = t("fresh cache")(SparkCache.fresh(spark, s"graft_profile_merge$round"))
      t("merge 1 (create)")(cache.writeStream("orders",
        stamp(orders, "2020-01-01 00:00:00"), catalog, WriteStrategy.Merge))
      val incoming = orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
      t("merge 2 (upsert)")(cache.writeStream("orders",
        stamp(incoming, "2021-01-01 00:00:00"), catalog, WriteStrategy.Merge))
      t("merge 3 (idempotent)")(cache.writeStream("orders",
        stamp(incoming, "2021-01-01 00:00:00"), catalog, WriteStrategy.Merge))
      t("final agg")(cache.table("orders")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n")).collect())
    }
    spark.stop()
  }
}
