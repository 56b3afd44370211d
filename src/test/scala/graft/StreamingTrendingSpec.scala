package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingTrending

/** Decayed heavy hitters over a text stream: integer halving decay +
  * batch counts, pinned to a sequential reference; state must shed
  * terms that decay to zero. */
class StreamingTrendingSpec extends SparkTestBase {

  import spark.implicits._

  /** Sequential reference: same halving fold, same (score desc, term)
    * top-k rule. */
  private def refFold(batches: Seq[Seq[String]], k: Int): Seq[Seq[(Long, String, Long)]] = {
    var state = Map.empty[String, Long]
    batches.map { texts =>
      val counts = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val decayed = state.map { case (t, s) => t -> s / 2 }.filter(_._2 > 0)
      state = (decayed.keySet ++ counts.keySet).map { t =>
        t -> (decayed.getOrElse(t, 0L) + counts.getOrElse(t, 0L))
      }.toMap
      state.toSeq.sortBy { case (t, s) => (-s, t) }.take(k)
        .zipWithIndex
        .map { case ((t, s), i) => (i + 1L, t, s) }
    }
  }

  test("three batches match the sequential decay fold; spikes rank first") {
    val batches = Seq(
      Seq("spark spark spark join", "join filter"),
      Seq("drift drift drift drift spark", "filter"),
      Seq("drift spark", "new new new new new new"))
    val trending = new StreamingTrending("text", k = 3)
    val got = batches.map { b =>
      trending.processBatch(b.toDF("text"))
        .select("rank", "term", "score")
        .as[(Long, String, Long)].collect().toSeq
    }
    assert(got == refFold(batches, 3))
    // batch 2's spike outranks the decayed batch-1 leader
    assert(got(1).head._2 == "drift")
  }

  test("terms that stop arriving decay out of the state") {
    val trending = new StreamingTrending("text", k = 5)
    trending.processBatch(Seq("once once once").toDF("text")) // score 3
    trending.processBatch(Seq("other").toDF("text"))          // 3/2 = 1
    trending.processBatch(Seq("other").toDF("text"))          // 1/2 = 0 → drop
    val terms = trending.scores.get.select("term").as[String].collect().toSet
    assert(!terms.contains("once"), s"decayed-out term still in state: $terms")
    assert(terms.contains("other"))
  }

  test("foreachBatch harness: per-batch trending flows to the sink") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    input.addData("stream stream stream word")
    val trending = new StreamingTrending("text", k = 2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = input.toDF().withColumnRenamed("value", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = trending.processBatch(batch)
          .select("rank", "term", "score")
          .as[(Long, String, Long)].collect()
        out.synchronized { out ++= rows }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      input.addData("stream burst burst burst burst")
      q.processAllAvailable()
    } finally q.stop()
    // 2 micro-batches × top-2 each
    assert(out.size == 4, s"got $out")
    assert(out.take(2).map(_._2).contains("stream"))
    assert(out.drop(2).head._2 == "burst") // 4 fresh beats 3/2+1 decayed
  }
}
