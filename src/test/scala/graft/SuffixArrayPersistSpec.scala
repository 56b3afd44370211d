package graft

import org.apache.spark.sql.functions._

import graft.cache.SparkCache
import graft.operators.SuffixArray

/**
 * Suffix-array index persistence: build → persist to cache tables →
 * reload in a simulated FRESH SESSION (catalog entries dropped, files
 * kept — the external-table layout — then re-registered via
 * SparkCache.reopen, exactly what a new JVM's in-memory catalog does)
 * → identical ranks, rounds, and LCPs; a stale stamp refuses to load.
 */
class SuffixArrayPersistSpec extends SparkTestBase {

  import spark.implicits._

  private def docs() = Seq(
    (1L, "a b a b a b c"),
    (2L, "b a b a b"),
    (3L, "c c a b a b a b"),
    (4L, "d e f a b")
  ).toDF("doc_id", "text")

  private def rankSet(sa: SuffixArray.SA): Set[(Long, Long, Long)] =
    sa.ranks.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("persist → drop catalog → reopen → load round-trips the index") {
    val cache = SparkCache.fresh(spark, "graft_test_sa_persist")
    val built = SuffixArray.build(docs(), "doc_id", "text")
    SuffixArray.persist(built, cache, "sa_rt", stamp = "s1")

    val expectRanks = rankSet(built)
    val expectLens = built.rounds.map(_._1)

    // simulate a fresh JVM: the in-memory catalog forgets the tables
    // (external layout → files survive the DROP) ...
    spark.sql("DROP TABLE `graft_test_sa_persist`.`sa_rt__rounds`")
    spark.sql("DROP TABLE `graft_test_sa_persist`.`sa_rt__meta`")
    assert(!cache.tableExists("sa_rt__meta"))

    // ... and a new session re-registers from the warehouse directory
    val cache2 = new SparkCache(spark, "graft_test_sa_persist")
    val reopened = cache2.reopen()
    assert(reopened.toSet == Set("sa_rt__rounds", "sa_rt__meta"), reopened)

    val loaded = SuffixArray.load(cache2, "sa_rt", stamp = "s1")
    assert(loaded.isDefined, "persisted index must reload")
    val sa = loaded.get
    assert(sa.nSuffixes == built.nSuffixes)
    assert(sa.rounds.map(_._1) == expectLens,
      s"round lengths changed: ${sa.rounds.map(_._1)} vs $expectLens")
    assert(rankSet(sa) == expectRanks, "final ranks changed across persist/load")

    // the LCP descent works off reloaded round tables
    val ord = SuffixArray.order(sa).localCheckpoint()
    val pairs = ord.as("a")
      .join(ord.as("b"), col("b.rn") === col("a.rn") + 1)
      .select(col("a.d").as("da"), col("a.p").as("pa"),
        col("b.d").as("db"), col("b.p").as("pb"))
    val top = SuffixArray.lcp(sa, pairs)
      .agg(max(col("lcp"))).collect()(0).getLong(0)
    // longest repeat in the fixture: "a b a b a b" (docs 1 and 3), 6 tokens
    assert(top == 6L, s"max adjacent LCP over reloaded index = $top, want 6")

    cache.dropAll()
  }

  test("adjacent-LCP frame persists and reloads under the same stamp") {
    val cache = SparkCache.fresh(spark, "graft_test_sa_lcp")
    val built = SuffixArray.build(docs(), "doc_id", "text")
    val lcp = SuffixArray.adjacentLcp(built)
    val expect = lcp.collect().map(_.toSeq).toSet
    SuffixArray.persistAdjacentLcp(lcp, cache, "sa_l", stamp = "s1")
    assert(SuffixArray.loadAdjacentLcp(cache, "sa_l", "s2").isEmpty,
      "stale stamp must refuse the LCP frame")
    val re = SuffixArray.loadAdjacentLcp(cache, "sa_l", "s1")
    assert(re.isDefined)
    assert(re.get.collect().map(_.toSeq).toSet == expect)
    cache.dropAll()
  }

  test("a stale stamp refuses to load; a rewrite under the new stamp serves it") {
    val cache = SparkCache.fresh(spark, "graft_test_sa_stale")
    val built = SuffixArray.build(docs(), "doc_id", "text")
    SuffixArray.persist(built, cache, "sa_st", stamp = "mtime1:100")
    assert(SuffixArray.load(cache, "sa_st", stamp = "mtime2:100").isEmpty,
      "corpus regenerated under the same path must invalidate the index")
    assert(SuffixArray.load(cache, "sa_st", stamp = "mtime1:100").isDefined)
    // overwrite with the new stamp (what cachedSa's build path does)
    SuffixArray.persist(built, cache, "sa_st", stamp = "mtime2:100")
    assert(SuffixArray.load(cache, "sa_st", stamp = "mtime2:100").isDefined)
    assert(SuffixArray.load(cache, "sa_st", stamp = "mtime1:100").isEmpty)
    cache.dropAll()
  }

  test("absent index loads None") {
    val cache = SparkCache.fresh(spark, "graft_test_sa_absent")
    assert(SuffixArray.load(cache, "nope", stamp = "x").isEmpty)
    cache.dropAll()
  }

  test("persist honors tablePrefix: reopen re-registers under the prefixed name") {
    SparkCache.fresh(spark, "graft_test_sa_prefix").dropAll()
    val cache = new SparkCache(spark, "graft_test_sa_prefix", tablePrefix = "pfx_")
    val built = SuffixArray.build(docs(), "doc_id", "text")
    SuffixArray.persist(built, cache, "sa_px", stamp = "s1")
    val expectRanks = rankSet(built)

    // fresh-JVM simulation: drop catalog entries, keep external files
    spark.sql(s"DROP TABLE ${cache.tableName("sa_px__rounds")}")
    spark.sql(s"DROP TABLE ${cache.tableName("sa_px__meta")}")
    val cache2 = new SparkCache(spark, "graft_test_sa_prefix", tablePrefix = "pfx_")
    val reopened = cache2.reopen()
    assert(reopened.toSet == Set("pfx_sa_px__rounds", "pfx_sa_px__meta"),
      s"reopen must find the PREFIXED directories: $reopened")
    val loaded = SuffixArray.load(cache2, "sa_px", stamp = "s1")
    assert(loaded.isDefined, "prefixed-cache index must reload, not silently rebuild")
    assert(rankSet(loaded.get) == expectRanks)
    cache.dropAll()
  }

  test("loading round tables prunes to one partition directory") {
    val cache = SparkCache.fresh(spark, "graft_test_sa_prune")
    val built = SuffixArray.build(docs(), "doc_id", "text")
    SuffixArray.persist(built, cache, "sa_pr", stamp = "s1")
    val sa = SuffixArray.load(cache, "sa_pr", stamp = "s1").get
    val (len, t) = sa.rounds.head
    t.collect()
    val plan = t.queryExecution.executedPlan.toString
    assert(plan.contains(s"len=$len") || plan.contains(s"len = $len") ||
      plan.contains("PartitionFilters"),
      s"round scan must carry a partition filter:\n$plan")
    cache.dropAll()
  }
}
