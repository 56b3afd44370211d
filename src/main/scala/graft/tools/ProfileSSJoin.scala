package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage timing of q114's AllPairs pipeline at sf0.1. */
object ProfileSSJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sh = t("shingles+checkpoint") {
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.TextHashFunctions
            .shingleMinhash(col("text"), 1, 3).getField("shingles"))).as("tok"))
        .localCheckpoint()
    }
    val szs = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfc = sh.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    t("szs+dfc count") { (szs.count(), dfc.count()) }
    val pref = t("rank window (build)") {
      sh.join(dfc, "tok")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
        .join(szs, "doc_id")
        .filter(col("rn") <= expr("sz div 2 + 1"))
        .select(col("doc_id"), col("tok"), col("sz"))
        .localCheckpoint()
    }
    val cand = pref.as("a").join(pref.as("b"), Seq("tok"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * 2 >= col("b.sz") && col("b.sz") * 2 >= col("a.sz"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    t("candidates count") { println("  n_cand_rows=" + cand.count()) }
    val sets = sh.groupBy(col("doc_id"))
      .agg(collect_list(col("tok")).as("set"), count(lit(1)).as("sz"))
    t("verify") {
      cand
        .join(broadcast(sets.select(col("doc_id").as("da"),
          col("set").as("set_a"), col("sz").as("sza"))), "da")
        .join(broadcast(sets.select(col("doc_id").as("db"),
          col("set").as("set_b"), col("sz").as("szb"))), "db")
        .withColumn("i", size(array_intersect(col("set_a"), col("set_b"))))
        .filter(col("i") * 3 >= col("sza") + col("szb"))
        .select(col("da"), col("db")).distinct().count()
    }
    spark.stop()
  }
}
