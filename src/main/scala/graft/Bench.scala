package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric":...,"queries":{...}}.
 *
 * Methodology: a full warmup pass at sf0.001 first (JIT + codegen cache +
 * session init), then one timed pass at the target scale factor. Queries
 * are forced through the `noop` sink so the whole plan executes (a bare
 * `count()` would let Catalyst prune aggregations).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup at the smallest SF: JIT, codegen cache, parquet footer reads
    names.foreach(exec(_, "/root/testdata/sf0.001"))

    val results = names.map(n => n -> exec(n, sfDir))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // reference-harness-shaped ingest throughput (5e5 protocol records
    // end-to-end; see tools/IngestBench + BASELINE.md)
    val ingestRps =
      try graft.tools.IngestBench.measure(spark, 500000)._2
      catch { case e: Throwable =>
        System.err.println(s"[bench] ingest failed: ${e.getMessage}"); -1L
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ingest_records_per_sec":$ingestRps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
