package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.BoundedCollectList.boundedCollectList

/**
 * Semantics gate for the round-17 bounded collect: under-bound groups
 * must collect EVERY element (the pair engine's kept buckets stay
 * complete and exact), over-bound groups must stop at exactly `bound`
 * (the O(cap) memory guarantee), across real multi-partition shuffles
 * so both the update and the merge truncation paths execute.
 */
class BoundedCollectSpec extends SparkTestBase {

  test("under-bound groups equal collect_list; over-bound groups stop at bound") {
    import spark.implicits._
    // group g has g elements (values g*1000..g*1000+g-1), spread over
    // 8 partitions so partial buffers merge across tasks
    val rows = (1 to 40).flatMap(g => (0 until g).map(i => (g.toLong, g * 1000L + i)))
    val df = spark.createDataset(rows).toDF("g", "v").repartition(8)
    val bound = 13
    val got = df.groupBy(col("g"))
      .agg(boundedCollectList(col("v"), bound).as("lst"))
      .select(col("g"), size(col("lst")).as("sz"), col("lst"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toSet))
      .toSeq.sortBy(_._1)
    got.foreach { case (g, sz, vals) =>
      if (g <= bound) {
        assert(sz == g, s"group $g: expected complete list of $g, got $sz")
        assert(vals == (0 until g.toInt).map(i => g * 1000L + i).toSet,
          s"group $g: kept list must be exact")
      } else {
        assert(sz == bound, s"group $g: expected truncation at $bound, got $sz")
        // truncated lists still contain only genuine group elements
        assert(vals.forall(v => v >= g * 1000L && v < g * 1000L + g),
          s"group $g: foreign element in truncated list")
      }
    }
    assert(got.size == 40)
  }

  test("struct elements and null-skipping match collect_list for kept groups") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L)), (1L, None), (1L, Some(11L)),
      (2L, Some(20L)), (2L, Some(21L)), (2L, Some(22L)))
      .toDF("g", "v").repartition(4)
      .select(col("g"),
        when(col("v").isNotNull, struct(col("v"), (col("v") * 2).as("w")))
          .as("s"))
    val got = df.groupBy(col("g"))
      .agg(boundedCollectList(col("s"), 10).as("a"))
      .select(col("g"), sort_array(col("a")).as("a"))
    val want = df.groupBy(col("g"))
      .agg(collect_list(col("s")).as("a"))
      .select(col("g"), sort_array(col("a")).as("a"))
    assert(got.orderBy("g").collect().toSeq == want.orderBy("g").collect().toSeq)
  }

  test("bound cap+1 under a size()<=cap filter reproduces the unbounded plan's rows") {
    import spark.implicits._
    val cap = 4
    val rows = (1 to 30).flatMap(g => (0 until (g % 9)).map(i => (g.toLong, i.toLong)))
    val df = spark.createDataset(rows).toDF("g", "v").repartition(8)
    def kept(c: org.apache.spark.sql.Column) = df.groupBy(col("g"))
      .agg(c.as("lst"))
      .filter(size(col("lst")) <= cap)
      .select(col("g"), sort_array(col("lst")).as("lst"))
      .orderBy("g")
    assert(kept(boundedCollectList(col("v"), cap + 1)).collect().toSeq ==
      kept(collect_list(col("v"))).collect().toSeq)
  }
}
