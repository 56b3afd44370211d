package graft

import org.apache.spark.sql.functions._

/** Pins q144's ANN recall audit to the properties that make it a valid
  * tuning table, and q143's fertility to a sequential BPE reference. */
class AnnRecallSpec extends SparkTestBase {
  import spark.implicits._

  test("q144: recall is 1.0 at nprobe = nlist and non-decreasing in nprobe") {
    val rows = SparkEntry.queries("q144_ivf_recall")(spark, sf())
      .orderBy(col("nprobe")).as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    // exhaustive probing IS brute force: identical candidate set and
    // identical (sim desc, id) ordering ⇒ identical top-k
    assert(rows.last._3 == 1000L,
      s"nprobe=nlist must recover brute force exactly: ${rows.toSeq}")
    val recalls = rows.map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not decrease with nprobe: ${recalls.toSeq}")
  }

  test("q145: quantized recall is non-decreasing in bit width") {
    val rows = SparkEntry.queries("q145_quant_recall")(spark, sf())
      .orderBy(col("bits")).as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 6L, 8L))
    val recalls = rows.map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not decrease with bits: ${recalls.toSeq}")
    // 8-bit quantization must retain most of the float ranking
    assert(recalls.last > recalls.head,
      s"widest quantization should beat the narrowest: ${recalls.toSeq}")
  }

  test("q146: banding candidates are nested, recall monotone, precision anti-monotone") {
    val rows = SparkEntry.queries("q146_lsh_tuning")(spark, sf())
      .orderBy(col("bands"))
      .select(col("bands"), col("n_cand"), col("hits"), col("n_truth"),
        col("recall_pm"), col("precision_pm"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // each config refines the previous (r halves), so candidate sets
    // are supersets: counts and hits never decrease with more bands
    val cands = rows.map(_._2)
    val hits = rows.map(_._3)
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"candidate sets must be nested: ${cands.toSeq}")
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"hits must be monotone: ${hits.toSeq}")
    rows.foreach { r =>
      assert(r._3 <= r._2 && r._3 <= r._4, s"hits bounded by cand and truth: $r")
    }
    assert(rows.last._5 > rows.head._5 || rows.head._5 == 1000L,
      s"more bands should raise recall: ${rows.map(_._5).toSeq}")
  }

  test("q149: PQ sweep is complete, bounded, and finest subdivision beats coarsest") {
    val rows = SparkEntry.queries("q149_pq_recall")(spark, sf())
      .orderBy(col("m")).as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    rows.foreach { case (m, hits, pm) =>
      assert(hits >= 0 && pm >= 0 && pm <= 1000, s"m=$m hits=$hits pm=$pm")
    }
    // no monotonicity claim: a sampled (untrained) codebook does not
    // guarantee it config-by-config — but 16 4-dim subquantizers carry
    // strictly more information than 2 32-dim ones
    assert(rows.last._3 >= rows.head._3,
      s"finest PQ should not lose to coarsest: ${rows.map(_._3).toSeq}")
    assert(rows.last._3 > 0, "finest PQ must recover some true neighbors")
  }

  test("q143: fertility matches a sequential BPE encode of the same corpus") {
    val dir = sf()
    val got = SparkEntry.queries("q143_token_fertility")(spark, dir)
      .orderBy(col("lang"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq

    // sequential reference: same merge list (collected from the same
    // deterministic learner), same greedy left-to-right apply
    val merges = graft.operators.Bpe
      .learnMerges(graft.sources.Tables.documents(spark, dir), "text", 8)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def encodeWord(w: String): Long = {
      var syms = w.map(_.toString).toArray
      merges.foreach { case (l, r) =>
        if (syms.length >= 2) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toArray
        }
      }
      syms.length.toLong
    }
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .as[(Long, String, String, Long)].collect()
    val ref = docs.groupBy(_._2).map { case (lang, ds) =>
      val toks = ds.map(_._3.split(" ").filter(_.nonEmpty).map(encodeWord).sum).sum
      val chars = ds.map(_._4).sum
      (lang, ds.length.toLong, toks, chars, toks * 10000L / chars)
    }.toSeq.sortBy(_._1)
    assert(got == ref)
  }

  test("q225: IVF off-ramp drifts one-sided vs the exact screen and keeps most dup_risk mass") {
    import graft.queries.LlmQueries
    val dir = sf()
    def bands(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Long)] =
      df.as[(String, String, Long, Long)].collect()
        .map { case (l, b, n, s) => (l, b) -> (n, s) }.toMap
    val exact = bands(LlmQueries.q225BenchProximityExact(spark, dir))
    val ann = bands(LlmQueries.q225BenchProximityAnn(spark, dir))
    // same universe: every corpus vector lands in exactly one band
    assert(exact.values.map(_._1).sum == ann.values.map(_._1).sum)
    // one-sided approximation: a missed list can only LOWER the best
    // sim, so total best-pm mass never grows under ANN
    val exactMass = exact.values.map(_._2).sum
    val annMass = ann.values.map(_._2).sum
    assert(annMass <= exactMass,
      s"ANN mass $annMass must not exceed exact $exactMass")
    // and the probed lists keep the bulk of it (recall floor for the
    // default nlist=16 / nprobe=4 on the test corpus)
    assert(annMass * 10 >= exactMass * 7,
      s"ANN kept ${annMass}pm of ${exactMass}pm — recall fell below 70%")
    // the screen's reason to exist: dup_risk detections survive routing
    val exactDup = exact.collect { case ((_, "dup_risk"), (n, _)) => n }.sum
    val annDup = ann.collect { case ((_, "dup_risk"), (n, _)) => n }.sum
    assert(annDup <= exactDup, "ANN cannot invent dup_risk vectors")
    if (exactDup > 0)
      assert(annDup * 2 >= exactDup,
        s"ANN found $annDup of $exactDup dup_risk vectors — below the 50% floor")
  }
}
