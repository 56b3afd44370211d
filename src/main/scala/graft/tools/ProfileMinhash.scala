package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)")
    }
    val withSig = docs.select(col("doc_id"),
      Dedup.wordShingles(col("text"), 3).as("shingles"),
      Dedup.minhashSignature(col("text"), 9, 3).as("sig"))
      .filter(size(col("shingles")) > 0)
    time("signatures")( withSig.write.format("noop").mode("overwrite").save().asInstanceOf[Any].hashCode.toLong )
    val banded = withSig.select(col("doc_id").as("id"),
      explode(array((0 until 3).map(b => Dedup.bandKey(col("sig"), b, 3)): _*)).as("band_key"))
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).dropDuplicates("id_a","id_b")
    time("candidates")( cand.count() )
    time("full")( Dedup.minhashNearDups(docs, "doc_id", "text", 0.35).count() )
    spark.stop()
  }
}
