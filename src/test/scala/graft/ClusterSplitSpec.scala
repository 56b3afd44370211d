package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 curation queries that the row oracles
  * can't express directly. */
class ClusterSplitSpec extends SparkTestBase {

  test("q218: cluster-aware assignment leaks zero near-dup clusters") {
    // Rebuild the cluster/split frame the query aggregates and check
    // the invariant the fix exists for: every near-dup cluster lands
    // in exactly ONE aware split (the aware gate is a pure function of
    // the cluster label).
    val docs = graft.sources.Tables.documents(spark, sf())
    val edges = graft.operators.Dedup.minhashNearDups(docs, "doc_id",
        "text", threshold = 0.35, numHashes = 9, bands = 3, shingle = 3)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = graft.operators.ConnectedComponents.minLabel(
      docs.select(col("doc_id").as("id")), edges)
    val u = conv(substring(md5(col("label").cast("string")), 1, 6), 16, 10)
      .cast("long") % 1000
    val aware = labels.withColumn("aware",
      when(u < 960, "train").when(u < 980, "valid").otherwise("test"))
    val awareSpans = aware.groupBy(col("label"))
      .agg(countDistinct(col("aware")).as("n"))
      .filter(col("n") > 1).count()
    assert(awareSpans == 0L, "a cluster must never straddle aware splits")
  }

  test("q218: tallies balance — moved docs conserve totals") {
    val rows = SparkEntry.queries("q218_cluster_split")(spark, sf())
      .collect().map(r => (r.getAs[String]("split"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("aware_docs"),
        r.getAs[Long]("moved_out")))
    assert(rows.map(_._2).sum == rows.map(_._3).sum,
      "naive and aware assignments must cover the same docs")
    // moved_out docs leave their naive split; aware counts absorb them
    val naiveTotal = rows.map(_._2).sum
    assert(rows.map(_._4).sum <= naiveTotal)
  }

  test("q217: Otsu output is a live two-class cut") {
    val r = SparkEntry.queries("q217_otsu_threshold")(spark, sf())
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_below") > 0 && row.getAs[Long]("n_above") > 0,
      "both classes must be non-empty by construction")
    assert(row.getAs[Long]("between_var_key") >= 0)
  }

  test("q219: padding + kept tokens reconstruct the bucket capacity") {
    val rows = SparkEntry.queries("q219_padding_waste")(spark, sf())
      .collect()
    rows.foreach { r =>
      val cap = r.getAs[Long]("bucket") * r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_tokens") + r.getAs[Long]("n_padding") == cap,
        s"bucket ${r.getAs[Long]("bucket")}: tokens+padding != capacity")
      assert(r.getAs[Long]("waste_permille") >= 0 &&
        r.getAs[Long]("waste_permille") < 1000)
    }
  }

  test("q220: effective size equals distinct count; weights sum per cluster") {
    val rows = SparkEntry.queries("q220_soft_dedup")(spark, sf()).collect()
    val effDocsMicro = rows.map(_.getAs[Long]("eff_docs_micro")).sum
    val distinctTexts = graft.sources.Tables.documents(spark, sf())
      .select(col("text")).distinct().count()
    // Σ per-copy (1e6 div c) over a cluster of size c is c·(1e6 div c):
    // equals 1e6 exactly when c divides 1e6 and undershoots by < c
    // otherwise — so the corpus total sits within one doc-count of
    // distinct·1e6 below it.
    assert(effDocsMicro <= distinctTexts * 1000000L)
    assert(effDocsMicro > distinctTexts * 1000000L - 1000000L,
      s"eff=$effDocsMicro distinct=$distinctTexts")
  }
}
