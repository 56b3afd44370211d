package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-costs of the write path: 1-row metadata append, table count, swap. */
object ProfileMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    spark.sql("CREATE DATABASE IF NOT EXISTS prof_micro")
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.1")
    (1 to 2).foreach { i =>
      println(s"round $i")
      phase("saveAsTable orders (plain)")(
        orders.write.mode(SaveMode.Overwrite).saveAsTable("prof_micro.o1"))
      phase("1-row append saveAsTable")(
        Seq(("a", "b")).toDF("x", "y").write.mode(SaveMode.Append)
          .saveAsTable("prof_micro.meta"))
      phase("count managed table")(spark.table("prof_micro.o1").count())
      phase("count batch df")(orders.count())
      phase("window dedup + noop")(
        graft.operators.WriteStrategies.dedupLatest(
          orders.withColumn("_airbyte_extracted_at", current_timestamp()),
          Seq("o_orderkey"))
          .write.format("noop").mode("overwrite").save())
      phase("rename x2 + drop")({
        spark.sql("ALTER TABLE prof_micro.o1 RENAME TO prof_micro.o2")
        spark.sql("ALTER TABLE prof_micro.o2 RENAME TO prof_micro.o1")
        spark.sql("DROP TABLE IF EXISTS prof_micro.nonexistent")
      })
    }
    spark.sql("DROP DATABASE prof_micro CASCADE")
    spark.stop()
  }
}
