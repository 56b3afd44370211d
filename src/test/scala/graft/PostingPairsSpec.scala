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

  test("hot-shingle-heavy corpus: parity holds where most shingles exceed the cap") {
    import spark.implicits._
    // 120 docs ALL share 6 boilerplate shingles (df = 120 >> cap) plus a
    // sparse rare tail — the round-17 bounded-collect regime where the
    // bucket buffer must truncate at cap+1 without touching kept buckets
    val rnd = new scala.util.Random(7L)
    val corpus = (0 until 120).map { i =>
      val boiler = (0 until 6).map(j => s"boiler$j")
      val rare = (0 until 2 + rnd.nextInt(4)).map(_ => s"r${rnd.nextInt(200)}")
      (i.toLong, (boiler ++ rare).distinct)
    }.toDF("id", "sh")
      .withColumn("n", size(col("sh")).cast(LongType))
      .localCheckpoint()
    for (cap <- Seq(5, 50)) {
      val got = PostingPairs.cappedPairInter(corpus, cap)
        .orderBy("id_a", "id_b").collect().toSeq
      val want = joinFormulation(corpus, cap)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(got == want, s"cap=$cap")
      assert(want.nonEmpty, s"degenerate fixture: cap=$cap produced no pairs")
    }
  }

  test("duplicate-bearing input: engine matches the join formulation row for row") {
    import spark.implicits._
    // The operator's documented precondition is a DISTINCT shingle array
    // per id; this fixture pins the actual behavior when a caller breaks
    // it — both formulations count posting ROWS, so duplicates inflate
    // df and inter identically and parity still holds (ADVICE round 16:
    // the invariant is now spec-documented rather than silently assumed).
    val corpus = Seq(
      (1L, Seq("x", "x", "y")), (2L, Seq("x", "y", "y")),
      (3L, Seq("x")), (4L, Seq("z", "z")))
      .toDF("id", "sh").withColumn("n", size(col("sh")).cast(LongType))
    for (cap <- Seq(2, 50)) {
      val got = PostingPairs.cappedPairInter(corpus, cap)
        .orderBy("id_a", "id_b").collect().toSeq
      val want = joinFormulation(corpus, cap)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(got == want, s"cap=$cap")
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
