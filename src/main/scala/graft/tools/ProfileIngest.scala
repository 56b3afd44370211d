package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Records
import graft.protocol._
import graft.sources.JsonlSource

/** Component timings for the ingest hot path: raw IO, the two-pass
  * Jackson+from_json normalize, the one-pass envelope normalize, and
  * the parquet table write. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 500000
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.1").limit(n)
    val payload = to_json(struct(li.columns.map(col).toSeq: _*))
    val msg = concat(
      lit("""{"type":"RECORD","record":{"stream":"lineitem","data":"""),
      payload, lit(""","emitted_at":1700000000000}}"""))
    val stage = "/tmp/graft_profile_ingest"
    li.select(msg.as("value")).repartition(32).write.mode(SaveMode.Overwrite).text(stage)
    val declared = StructType(li.schema.fields.map(_.copy(nullable = true)))
    val catalog = ConfiguredCatalog(Seq(ConfiguredStream("lineitem", declared)))
    val source = new JsonlSource("perf", catalog, s => s.read.textFile(stage))

    def time(name: String)(f: => Unit): Unit = {
      // two passes: report the warm one
      f
      val t0 = System.nanoTime(); f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    println(s"[profile] files=${spark.read.textFile(stage).inputFiles.length}")
    time("raw textFile count") {
      spark.read.textFile(stage).count(): Unit
    }
    time("two-pass normalize → noop") {
      Records.normalize(source.recordJsonl(spark, "lineitem"), declared)
        .write.format("noop").mode("overwrite").save()
    }
    time("one-pass envelope → noop") {
      Records.normalizeProtocol(spark.read.textFile(stage), "lineitem", declared)
        .write.format("noop").mode("overwrite").save()
    }
    time("one-pass minus metadata") {
      val envelope = StructType(Seq(
        org.apache.spark.sql.types.StructField("type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("record", StructType(Seq(
          org.apache.spark.sql.types.StructField("stream", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("data", declared),
          org.apache.spark.sql.types.StructField("emitted_at", org.apache.spark.sql.types.LongType))))))
      spark.read.textFile(stage).toDF("_raw")
        .select(from_json(col("_raw"), envelope).as("m"))
        .filter(col("m.type") === "RECORD")
        .select(col("m.record.data.*"))
        .write.format("noop").mode("overwrite").save()
    }
    time("two-pass minus metadata") {
      source.recordJsonl(spark, "lineitem").toDF("_raw_json")
        .select(from_json(col("_raw_json"), declared).as("r"))
        .select(col("r.*"))
        .write.format("noop").mode("overwrite").save()
    }
    time("one-pass → raw parquet dir") {
      Records.normalizeProtocol(spark.read.textFile(stage), "lineitem", declared)
        .write.mode(SaveMode.Overwrite).parquet("/tmp/graft_profile_out")
    }
    time("full cache.writeStream sync") {
      val cache = graft.cache.SparkCache.fresh(spark, "graft_profile_sync")
      source.read(cache, spark, writeStrategy = WriteStrategy.Append): Unit
    }
    spark.stop()
  }
}
