package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-stress runner: time queries at an arbitrary data dir (e.g. a
  * 10×-replicated copy of sf0.1) and compare against their sf0.1 times
  * in the same JVM — the local proxy for "does the plan scale linearly".
  * Usage: runMain graft.tools.ScaleBench <bigDir> <q1,q2,...> [conf=v ...] */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val bigDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val names = if (args.length > 1) args(1).split(',').toSeq
      else Seq("q1_pricing_summary", "q3_join_agg", "q6_window_rank",
        "q31_dedup_minhash_lsh", "q43_corpus_clean", "q53_percentiles",
        "q75_sequence_pack", "q100_pipeline", "q106_span_dedup",
        "q114_prefix_filter_join", "q115_rolling_distinct",
        "q117_triangle_count", "q121_topk_per_group")
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    def time(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(time(_, "/root/testdata/sf0.001")) // warmup: JIT + codegen
    println(f"${"query"}%-26s ${"sf0.1"}%8s ${"10x"}%8s  ratio")
    names.foreach { q =>
      val small = time(q, "/root/testdata/sf0.1")
      val big = time(q, bigDir)
      println(f"$q%-26s $small%8.2f $big%8.2f  ${big / small}%5.1fx")
    }
    spark.stop()
  }
}
