package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-count/latency probe for the q61 connected-components loop. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("q61_dedup_clusters")(spark, "/root/testdata/sf0.1").collect().length
    println(f"[profile] q61 cold: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    val t1 = System.nanoTime()
    graft.SparkEntry.queries("q61_dedup_clusters")(spark, "/root/testdata/sf0.1").collect()
    println(f"[profile] q61 warm: ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
