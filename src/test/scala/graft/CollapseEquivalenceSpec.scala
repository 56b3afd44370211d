package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Randomized equivalence gate for the round-4 exact-duplicate collapse
 * rewrites: the collapsed operators must be BYTE-IDENTICAL to the
 * uncollapsed round-3 formulation on corpora with heavy duplication,
 * shared shingles, short docs, and empty-shingle edge cases. The
 * uncollapsed MinHash+LSH reference is reimplemented here verbatim
 * (band keys, id-only candidates, exact-Jaccard verify) so a
 * regression in the collapse/expansion logic fails against ground
 * truth rather than against itself.
 */
class CollapseEquivalenceSpec extends SparkTestBase {

  import spark.implicits._

  /** The round-3 (pre-collapse) minhashNearDups, kept as ground truth. */
  private def uncollapsedNearDups(
      df: DataFrame, threshold: Double,
      numHashes: Int = 9, bands: Int = 3, shingle: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(
      col("doc_id").as("id"),
      graft.functions.TextHashFunctions
        .shingleMinhash(col("text"), numHashes, shingle).as("sm"))
      .localCheckpoint()
      .select(col("id"), col("sm.shingles").as("shingles"), col("sm.sig").as("sig"))
      .filter(size(col("shingles")) > 0)
    val banded = withSig.select(
      col("id"),
      explode(array((0 until bands).map(b =>
        Dedup.bandKey(col("sig"), b, rows)): _*)).as("band_key"))
    val candidates = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sets = withSig.select(col("id"), col("shingles"))
    candidates
      .join(sets.withColumnRenamed("id", "id_a")
        .withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b")
        .withColumnRenamed("shingles", "sh_b"), "id_b")
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  private def randomCorpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def sentence(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val distinct = (0 until 6).map { _ =>
      sentence(rnd.nextInt(12)) // includes <3-token docs (empty shingles)
    }
    // assign 1-4 exact copies of each distinct text, shuffled ids
    val docs = distinct.flatMap(t => Seq.fill(1 + rnd.nextInt(4))(t))
    rnd.shuffle(docs.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
  }

  test("collapsed minhashNearDups == uncollapsed round-3 formulation on random duplicate-heavy corpora") {
    (1 to 8).foreach { seed =>
      val df = randomCorpus(seed).toDF("doc_id", "text")
      val got = Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.3)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val want = uncollapsedNearDups(df, threshold = 0.3)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == want, s"divergence on seed $seed")
    }
  }

  test("collapsed q33 equals the uncollapsed posting-join dual on a duplicated corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q33").toString
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val langs = Seq("en", "es")
      val docs = randomCorpus(seed).map { case (id, t) =>
        (id, langs(rnd.nextInt(2)), s"src${id % 3}", t)
      }
      docs.toDF("doc_id", "lang", "source", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = graft.queries.LlmQueries.q33NgramJaccard(spark, dir)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      // uncollapsed round-14 dual: per-DOC inverted index, no collapse
      val perDoc = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          array_distinct(graft.functions.TextHashFunctions
            .shingleMinhash(col("text"), 1, 3).getField("shingles")).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("lang"), col("sh"), size(col("sh")).as("n_sh"))
      val inv = perDoc.select(col("doc_id"), col("lang"), col("n_sh"),
        explode(col("sh")).as("shingle"))
      val want = inv.alias("a")
        .join(inv.alias("b"),
          col("a.lang") === col("b.lang") &&
            col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.2)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == want, s"q33 divergence on seed $seed")
    }
  }

  test("collapsed embeddingNearDups equals the uncollapsed bucket join on duplicated vectors") {
    import graft.operators.Similarity
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(200 + seed)
      val dim = 8
      // few distinct vectors incl. near-dups, a zero vector, and 1-4
      // exact copies of each — the vector-duplication shape the
      // collapse guards against
      val distinct = Seq.fill(5)(Array.fill(dim)(rnd.nextGaussian().toFloat)) ++
        Seq(Array.fill(dim)(0.0f))
      val perturbed = distinct.take(2).map(v =>
        v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x })
      val all = (distinct ++ perturbed).flatMap(v =>
        Seq.fill(1 + rnd.nextInt(4))(v))
      val rows = rnd.shuffle(all).zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, v.toSeq)
      }
      val df = rows.toDF("vec_id", "embedding")
      def run(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val got = run(Similarity.embeddingNearDups(
        df, "vec_id", "embedding", threshold = 0.2, planes = 8, prefixBits = 4))
      // uncollapsed round-14 dual: per-id bucket join
      val withBucket = df.select(col("vec_id").as("id"), col("embedding").as("vec"))
        .withColumn("bucket",
          substring(Similarity.lshSignature(col("vec"), 8, dim), 1, 4))
        .withColumn("norm", Similarity.norm(col("vec")))
      val want = run(withBucket.alias("a")
        .join(withBucket.alias("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .withColumn("sim", round(
          when(col("a.norm") * col("b.norm") > 0,
            Similarity.dot(col("a.vec"), col("b.vec")) /
              (col("a.norm") * col("b.norm")))
            .otherwise(lit(0.0)), 4))
        .filter(col("sim") >= 0.2)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim")))
      assert(got == want, s"q34 divergence on seed $seed")
    }
  }

  test("CollapseExpand.expand equals the brute member-pair reference on random class structures") {
    // The helper now OWNS the re-expansion invariants for every
    // collapsed operator (q31/q33/q34 call sites) — pin them directly:
    // cross pairs = members(a) × members(b) with the class score and
    // id_a < id_b restored; within pairs = all unordered member pairs
    // with the class self-score; singletons emit nothing.
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(300 + seed)
      val nClasses = 2 + rnd.nextInt(5)
      val ids = rnd.shuffle((1L to 24L).toList)
      // partition shuffled ids into member lists of size 1-5
      val members = (0 until nClasses).map { c =>
        val take = 1 + rnd.nextInt(5)
        ids.slice(c * 5, c * 5 + take)
      }.filter(_.nonEmpty)
      val reps = members.map(_.min)
      // random verified class pairs with scores
      val pairIdx = for {
        i <- members.indices; j <- members.indices
        if i < j && rnd.nextBoolean()
      } yield (i, j, math.floor(rnd.nextDouble() * 1000) / 1000)
      val pairsDf = pairIdx.map { case (i, j, s) => (members(i), members(j), s) }
        .toDF("ma", "mb", "score")
      // random subset of classes carries a within self-score
      val withinIdx = members.indices.filter(_ => rnd.nextBoolean())
      val withinDf = withinIdx.map(i => (members(i), 1.0)).toDF("members", "score")

      val got = graft.operators.CollapseExpand
        .expand(pairsDf, withinDf, "score")
        .as[(Long, Long, Double)].collect().toSeq.sorted

      val wantCross = pairIdx.flatMap { case (i, j, s) =>
        for (x <- members(i); y <- members(j))
          yield (math.min(x, y), math.max(x, y), s)
      }
      val wantWithin = withinIdx.flatMap { i =>
        val m = members(i)
        for (x <- m; y <- m if x < y) yield (x, y, 1.0)
      }
      val want = (wantCross ++ wantWithin).sorted
      assert(got == want, s"CollapseExpand divergence on seed $seed " +
        s"(reps=$reps)")
    }
  }

  test("collapsed q106/q116 equal their uncollapsed duals on a duplicated corpus") {
    // write a small duplicated corpus as the documents table, run the
    // SHIPPED queries against it, and compare with inline uncollapsed
    // plans computed from the same frame
    val dir = java.nio.file.Files.createTempDirectory("graft-collapse").toString
    val base = Seq(
      "a b c d e f g h i j k l",
      "a b c d e f g h i j k l", // exact copy of doc 1's text
      "z y x w v u t s r q p o",
      "a b c d e f g h zz yy xx", // shares a prefix span with 1/2
      "short text only")
    val docs = base.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, s"src${i % 2}", t)
    }
    docs.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val q106 = graft.queries.CorpusQueries.q106SpanDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    val q116 = graft.queries.CorpusQueries.q116LongestDupSpan(spark, dir)
      .collect().map(_.toSeq).toSeq

    // uncollapsed q106 dual
    val w = 8
    val wins = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(
        graft.functions.TextHashFunctions.rollingWindowHashes(col("text"), w)).as("h"))
    val pdh = wins.groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("cnt"))
    val sd = pdh.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    val q106Want = pdh.join(sd, "h").groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_windows"),
        sum(when(col("nd") >= 2, col("cnt")).otherwise(0L)).as("n_shared"))
      .withColumn("dup_permille", expr("n_shared * 1000 div n_windows"))
      .orderBy(col("dup_permille").desc, col("doc_id").asc).limit(20)
      .select(col("doc_id"), col("n_windows"), col("n_shared"), col("dup_permille"))
      .collect().map(_.toSeq).toSeq
    assert(q106 == q106Want)

    // uncollapsed q116 dual
    import org.apache.spark.sql.expressions.Window
    val pw = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(
        graft.functions.TextHashFunctions.rollingWindowHashes(col("text"), w))
        .as(Seq("pos", "h")))
    val sh2 = pw.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val runs = pw.join(sh2, Seq("h"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"),
        min(col("pos")).cast("long").as("start_pos"))
    val q116Want = runs.groupBy(col("doc_id"))
      .agg(max(struct(col("run_len").as("rl"),
        (-col("start_pos")).as("negstart"))).as("best"))
      .select(col("doc_id"), col("best.rl").as("run_len"),
        (-col("best.negstart")).as("start_pos"),
        (col("best.rl") + (w - 1).toLong).as("span_words"))
      .orderBy(col("run_len").desc, col("doc_id").asc).limit(20)
      .collect().map(_.toSeq).toSeq
    assert(q116 == q116Want)
  }

  test("collapsed q124 Hamming join == uncollapsed all-docs banding on random duplicate-heavy corpora") {
    (1 to 5).foreach { seed =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-q124-$seed").toString
      randomCorpus(seed).map { case (id, t) => (id, s"src${id % 3}", t) }
        .toDF("doc_id", "source", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")

      val got = graft.queries.CorpusQueries
        .q124SimhashHammingJoin(spark, dir)
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

      // uncollapsed dual: band-join every DOC (no class collapse)
      val sims = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), Dedup.simhashBits(col("text")).as("sh"))
        .localCheckpoint()
      val bands = sims.select(col("doc_id"), col("sh"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bk", expr("substring(sh, band*16+1, 16)"))
      val want = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.sh").as("sha"), col("b.sh").as("shb"))
        .distinct()
        .withColumn("hamming",
          Dedup.hammingDistance(col("sha"), col("shb")).cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("da"), col("db"), col("hamming"))
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == want, s"q124 divergence on seed $seed")
    }
  }

  test("collapsed q125 novelty == uncollapsed per-doc shingling on random duplicate-heavy corpora") {
    (1 to 5).foreach { seed =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-q125-$seed").toString
      randomCorpus(seed).map { case (id, t) => (id, s"src${id % 3}", t) }
        .toDF("doc_id", "source", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")

      val got = graft.queries.CorpusQueries
        .q125CrossCorpusNovelty(spark, dir)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

      // uncollapsed dual: shingle every doc independently
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"),
          array_distinct(graft.functions.TextHashFunctions
            .shingleMinhash(col("text"), 1, 3).getField("shingles")).as("sh"))
        .filter(size(col("sh")) > 0)
      val corpusSh = docs.filter(col("doc_id") % 10 =!= 0)
        .select(explode(col("sh")).as("s")).distinct()
      val newSh = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), explode(col("sh")).as("s"))
      val novel = newSh.join(corpusSh, Seq("s"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
      val want = newSh.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"))
        .join(novel, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"q125 divergence on seed $seed")
    }
  }
}
