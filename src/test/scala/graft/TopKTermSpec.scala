package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKTermAggregate.topKTerm

/** Pins the string-keyed bounded heap that replaced the per-source
  * vocabulary rank window in q131/q227: order must be (count desc,
  * term asc binary UTF-8), identical to a full sort + LIMIT k, with
  * partial-aggregate merge across partitions preserving that order. */
class TopKTermSpec extends SparkTestBase {

  test("topKTerm orders (count desc, term asc) and caps at k") {
    import spark.implicits._
    val rows = Seq(
      ("a", 5L), ("b", 5L), ("c", 9L), ("d", 1L), ("e", 5L), ("f", 2L)
    ).toDF("t", "c").repartition(4) // force partial heaps + merge
    val got = rows
      .agg(topKTerm(col("c"), col("t"), 4).as("head"))
      .select(posexplode(col("head")).as(Seq("p", "e")))
      .select(col("e.c"), col("e.t"))
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((9L, "c"), (5L, "a"), (5L, "b"), (5L, "e")))
  }

  test("topKTerm matches sort-then-limit on random vocabularies") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 500).map { i =>
      (s"t${rnd.nextInt(300)}_$i", rnd.nextInt(20).toLong + 1L)
    }
    val df = vocab.toDF("t", "c").repartition(7)
    val viaHeap = df
      .agg(topKTerm(col("c"), col("t"), 50).as("head"))
      .select(posexplode(col("head")).as(Seq("p", "e")))
      .select(col("e.c"), col("e.t"))
      .as[(Long, String)].collect().toSeq
    val viaSort = df.orderBy(col("c").desc, col("t").asc)
      .select(col("c"), col("t")).as[(Long, String)]
      .collect().toSeq.take(50)
    assert(viaHeap === viaSort)
  }

  test("topKTerm returns all rows when the group is smaller than k") {
    import spark.implicits._
    val got = Seq(("x", 3L), ("y", 7L)).toDF("t", "c")
      .agg(topKTerm(col("c"), col("t"), 100).as("head"))
      .select(size(col("head"))).as[Int].head()
    assert(got === 2)
  }
}
