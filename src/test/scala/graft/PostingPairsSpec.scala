package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.PostingPairs

/**
 * Parity gate for the round-16 bucket-grouped pair engine: the
 * in-bucket pair explosion must produce EXACTLY the rows of the posting
 * self-join it replaced (q233/q255/q146's exact anchors replay that
 * join in their DuckDB oracles), on random corpora whose df spectrum
 * straddles the cap.
 */
class PostingPairsSpec extends SparkTestBase {

  /** The retired formulation: df-capped postings, alias self-join. */
  private def joinFormulation(withSh: org.apache.spark.sql.DataFrame, cap: Int) = {
    val postsAll = withSh.select(col("id"), col("n"), explode(col("sh")).as("s"))
    val posts = postsAll.join(
      postsAll.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select(col("s")),
      Seq("s"), "left_semi")
    posts.alias("a")
      .join(posts.alias("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
  }

  private def randomCorpus(seed: Long, nDocs: Int, vocab: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // shingle universe: `vocab` tokens; ~10% are hot (appear in most
    // docs) so the df cap actually fires
    (0 until nDocs).map { i =>
      val hot = (0 until vocab / 10).filter(_ => rnd.nextInt(100) < 80)
        .map(j => s"hot$j")
      val rare = (0 until 3 + rnd.nextInt(15)).map(_ => s"w${rnd.nextInt(vocab)}")
      (i.toLong, (hot ++ rare).distinct)
    }.toDF("id", "sh")
      .filter(size(col("sh")) > 0)
      .withColumn("n", size(col("sh")).cast(LongType))
  }

  test("bucket-grouped pair engine equals the posting self-join (random corpora, df straddles the cap)") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val corpus = randomCorpus(seed, nDocs = 60, vocab = 120).localCheckpoint()
      for (cap <- Seq(3, 50)) {
        val got = PostingPairs.cappedPairInter(corpus, cap)
          .orderBy("id_a", "id_b").collect().toSeq
        val want = joinFormulation(corpus, cap)
          .orderBy("id_a", "id_b").collect().toSeq
        assert(got == want, s"seed=$seed cap=$cap")
        assert(want.nonEmpty, s"degenerate fixture: seed=$seed cap=$cap produced no pairs")
      }
    }
  }

  test("a shingle past the cap contributes to no pair") {
    import spark.implicits._
    // 5 docs all share "boiler"; only docs 1,2 share "rare"
    val corpus = Seq(
      (1L, Seq("boiler", "rare")), (2L, Seq("boiler", "rare")),
      (3L, Seq("boiler")), (4L, Seq("boiler")), (5L, Seq("boiler")))
      .toDF("id", "sh").withColumn("n", size(col("sh")).cast(LongType))
    val rows = PostingPairs.cappedPairInter(corpus, 4)
      .select("id_a", "id_b", "inter").collect()
    assert(rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      Seq((1L, 2L, 1L)))
  }
}
