package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvAggregate

/**
 * Unit gate for the bounded k-minimum-values sketch aggregate (q266's
 * engine): the grouped result must equal the brute "k smallest DISTINCT
 * values in signed order" on adversarial inputs — duplicates (the
 * TreeSet dedups in-flight), negative values (signed ordering), nulls
 * (skipped), under-full groups (sketch = exact sorted distinct set),
 * and multi-partition inputs (exercises serialize/deserialize/merge,
 * not just update).
 */
class KmvAggregateSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(vs: Seq[Long], k: Int): Seq[Long] =
    vs.distinct.sorted.take(k)

  test("kmv equals the brute k-smallest-distinct on random grouped longs") {
    val rnd = new scala.util.Random(42)
    val k = 8
    val groups = (0 until 6).map { g =>
      val n = rnd.nextInt(40) // includes tiny (< k) groups
      g.toString -> Seq.fill(n)(rnd.nextLong() % 100) // heavy duplication,
                                                      // negatives included
    }
    val rows = groups.flatMap { case (g, vs) => vs.map(v => (g, v)) }
    val df = rows.toDF("g", "v")
      .repartition(5) // force partial buffers through serialize + merge
    val got = df.groupBy(col("g"))
      .agg(KmvAggregate.kmv(col("v"), k).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    groups.foreach { case (g, vs) =>
      assert(got(g) == brute(vs, k), s"group $g")
    }
  }

  test("nulls are skipped and an all-null group yields an empty sketch") {
    val df = Seq(("a", Some(3L)), ("a", None), ("a", Some(-5L)),
        ("b", None), ("b", None))
      .toDF("g", "v").repartition(3)
    val got = df.groupBy(col("g"))
      .agg(KmvAggregate.kmv(col("v"), 4).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") == Seq(-5L, 3L))
    assert(got("b") == Seq.empty[Long])
  }

  test("the cap evicts the largest value exactly at the boundary") {
    // values arrive in an order that forces both the under-k append
    // path and the replace-worst path, including a duplicate of the
    // current maximum (must NOT evict anything)
    val df = Seq(5L, 1L, 9L, 9L, 3L, 2L, 7L).map(("g", _)).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(KmvAggregate.kmv(col("v"), 4).as("sk"))
      .as[(String, Seq[Long])].collect().head._2
    assert(got == Seq(1L, 2L, 3L, 5L))
  }
}
