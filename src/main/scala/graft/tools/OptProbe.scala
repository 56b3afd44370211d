package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Round-16 optimization scratch probe: times the internal phases of the
  * posting-join dedup machinery (q233/q255 shape) to localize fixed
  * overhead. Not part of the driver contract. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the session + parquet footers
    (1 to 2).foreach { _ =>
      noop(Tables.documents(spark, dir).groupBy(col("text"))
        .agg(min(col("doc_id")).as("id")))
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round @ $dir")
      val docs = Tables.documents(spark, dir)
      t("classes(groupBy text)") { noop(docs.groupBy(col("text")).agg(min(col("doc_id")).as("id"))) }
      val classes = docs.groupBy(col("text")).agg(min(col("doc_id")).as("id"))
      val withShPlan = classes.select(col("id"),
          array_distinct(graft.functions.TextHashFunctions
            .shingleMinhash(col("text"), 1, 3).getField("shingles")).as("sh"),
          size(array_remove(split(col("text"), " "), ""))
            .cast(LongType).as("toks"))
        .filter(size(col("sh")) > 0)
        .select(col("id"), col("toks"), col("sh"),
          size(col("sh")).cast(LongType).as("n"))
      t("withSh (kernel) noop") { noop(withShPlan) }
      var withSh: DataFrame = null
      t("withSh localCheckpoint") { withSh = withShPlan.localCheckpoint() }
      val postsAll = withSh.select(col("id"), col("n"), explode(col("sh")).as("s"))
      val posts = postsAll.join(
        postsAll.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 50).select(col("s")),
        Seq("s"), "left_semi")
      t("posts (df cap) noop") { noop(posts) }
      val pairs = posts.alias("a")
        .join(posts.alias("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jac_pm", expr("inter * 1000 div (n_a + n_b - inter)"))
      t("pairs noop") { noop(pairs) }
      // candidate restructure: ONE groupBy(s) builds capped posting
      // lists; pairs explode in-bucket (df ≤ 50 bounds the blowup).
      val plist = postsAll.groupBy(col("s"))
        .agg(collect_list(struct(col("id"), col("n"))).as("lst"))
        .filter(size(col("lst")) <= 50)
      val pairs2 = plist
        .select(explode(col("lst")).as("a"), col("lst"))
        .select(col("a"), explode(col("lst")).as("b"))
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jac_pm", expr("inter * 1000 div (n_a + n_b - inter)"))
      t("pairs2 (bucket) noop") { noop(pairs2) }
      val cnt1 = pairs.agg(count(lit(1)), sum(col("jac_pm"))).collect()(0)
      val cnt2 = pairs2.agg(count(lit(1)), sum(col("jac_pm"))).collect()(0)
      println(s"[probe] pairs parity: $cnt1 vs $cnt2")
      t("q233 full") { noop(graft.SparkEntry.queries("q233_dedup_threshold_curve")(spark, dir)) }
      t("q255 full") { noop(graft.SparkEntry.queries("q255_dup_transitivity")(spark, dir)) }
    }
    spark.stop()
  }
}
