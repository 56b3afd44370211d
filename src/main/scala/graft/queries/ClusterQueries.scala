package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Clustering, ConnectedComponents, Similarity}
import graft.sources.Tables

/**
 * Embedding-clustering queries: SemDeDup-style semantic dedup and a
 * full distributed Lloyd iteration — both bit-reproducible vs DuckDB
 * (rounded cosine ranking, exact scaled-integer centroid means; see
 * operators/Clustering.scala).
 *
 * The synthetic embeddings are near-orthogonal (max pairwise cosine
 * ≈ 0.49), so the dedup threshold is 0.42 — the STRUCTURE (cluster →
 * within-cluster prune) is what scales, the threshold is data-tuned.
 */
object ClusterQueries {

  private val K = 8
  private val Eps = 0.42

  /** Shared broadcast/shuffle auto-switch for every node-dimension
    * side (rank, label, alive, degree vectors) joined onto a
    * corpus-sized edge list — the q79 convention generalized. Node
    * sets at or under `graft.graph.broadcastNodes` (default 5M; the
    * older `graft.pagerank.broadcastNodes` name is honored so q79
    * callers keep working) broadcast, and edges never shuffle; beyond
    * it the frame is returned unhinted so the join co-shuffles — node
    * vectors grow linearly with data, and at 100x an unconditional
    * broadcast is the first thing that stops fitting in executor
    * memory. GraphNodeJoinSpec pins both plan shapes and their
    * row-for-row equivalence for q205/q207/q211/q117. */
  private[graft] def nodeBroadcastLimit(spark: SparkSession): Long =
    spark.conf.getOption("graft.graph.broadcastNodes")
      .orElse(spark.conf.getOption("graft.pagerank.broadcastNodes"))
      .map(_.toLong).getOrElse(5000000L)

  private[graft] def nodeSide(spark: SparkSession, nodeCount: Long)(
      df: DataFrame): DataFrame =
    if (nodeCount <= nodeBroadcastLimit(spark)) broadcast(df) else df

  // ------------------------------------------------------------------
  // q59: semantic dedup — cluster assignment (broadcast centroids, no
  // corpus shuffle) → within-cluster pair prune (the cluster is the
  // blocking key) → per-cluster keep/drop tallies.
  //
  // The cluster count SCALES with the corpus (round 15): at a fixed K
  // the within-cluster pairwise stays N²/K — the SemDeDup convention
  // is cluster count proportional to corpus size (50k clusters for
  // LAION); k = max(8, ⌈√N⌉) keeps pair work at N^1.5 and the
  // broadcast centroid table bounded (cap 10⁶). The oracle derives
  // the SAME k from COUNT(*) (the q126 sampleModulus convention), so
  // the gate pins the derivation, not a constant.
  // ------------------------------------------------------------------
  def q59SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val k = math.max(K.toLong,
      math.ceil(math.sqrt(e.count().toDouble)).toLong).min(1000000L).toInt
    val cents = Clustering.seedCentroids(e, "vec_id", "embedding", k)
    val side = e.join(
        Clustering.assign(e, "vec_id", "embedding", cents)
          .select(col("vec_id"), col("cluster")), "vec_id")
      .select(col("vec_id").as("id"), col("cluster"), col("embedding").as("vec"))
      .withColumn("n", Similarity.norm(col("vec")))
      .localCheckpoint() // one computation, two join sides
    val a = side.alias("a")
    val b = side.alias("b")
    val dropped = a.join(b,
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .withColumn("sim", round(
        when(col("a.n") * col("b.n") > 0,
          Similarity.dot(col("a.vec"), col("b.vec")) / (col("a.n") * col("b.n")))
          .otherwise(lit(0.0)), 4))
      .filter(col("sim") >= Eps)
      .select(col("b.id").as("did")).distinct()
    side.join(dropped, col("id") === col("did"), "left_outer")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("did").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("did").isNull, 1L).otherwise(0L)).as("n_kept"),
        min(when(col("did").isNull, col("id"))).as("min_kept_id"))
  }

  val q59Sql: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
      |kk AS (SELECT greatest($K, least(1000000,
      |  CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS k
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, vec AS cvec FROM v
      |  WHERE vec_id < (SELECT k FROM kk)),
      |sims AS (SELECT v.vec_id, c0.cid,
      |    ROUND(list_dot_product(v.vec, c0.cvec) /
      |      (sqrt(list_dot_product(v.vec, v.vec)) * sqrt(list_dot_product(c0.cvec, c0.cvec))), 4) AS sim
      |  FROM v CROSS JOIN c0),
      |asg AS (SELECT vec_id, cid AS cluster FROM (SELECT vec_id, cid,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn FROM sims) WHERE rn = 1),
      |side AS (SELECT a.vec_id AS id, a.cluster, v.vec FROM asg a JOIN v ON a.vec_id = v.vec_id),
      |dropped AS (SELECT DISTINCT b.id AS did
      |  FROM side a JOIN side b ON a.cluster = b.cluster AND a.id < b.id
      |  WHERE ROUND(list_dot_product(a.vec, b.vec) /
      |    (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 4) >= $Eps)
      |SELECT cluster, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN did IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(SUM(CASE WHEN did IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  MIN(CASE WHEN did IS NULL THEN id END) AS min_kept_id
      |FROM side LEFT JOIN dropped ON id = did
      |GROUP BY cluster""".stripMargin

  // ------------------------------------------------------------------
  // q60: one full distributed Lloyd iteration — seed → assign →
  // exact-mean centroid refine → reassign. The refine is a partial-
  // aggregable groupBy on (cluster, component); only k×dims doubles
  // ever leave the aggregation. Dims fixed at 64 (the oracle unrolls
  // positions via generate_series).
  // ------------------------------------------------------------------
  def q60KmeansIter(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val c0 = Clustering.seedCentroids(e, "vec_id", "embedding", K)
    val a0 = Clustering.assign(e, "vec_id", "embedding", c0)
    val c1 = Clustering.refineCentroids(e, "vec_id", "embedding", a0)
    val a1 = Clustering.assign(e, "vec_id", "embedding", c1)
    a1.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        min(col("sim")).as("min_sim"),
        max(col("sim")).as("max_sim"))
  }

  val q60Sql: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < $K),
      |s0 AS (SELECT v.vec_id, c0.cid,
      |    ROUND(list_dot_product(v.vec, c0.cvec) /
      |      (sqrt(list_dot_product(v.vec, v.vec)) * sqrt(list_dot_product(c0.cvec, c0.cvec))), 4) AS sim
      |  FROM v CROSS JOIN c0),
      |a0 AS (SELECT vec_id, cid AS cluster FROM (SELECT vec_id, cid,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn FROM s0) WHERE rn = 1),
      |comp AS (SELECT a0.cluster, g.pos,
      |    CAST(round(v.vec[CAST(g.pos AS INT)] * 1000000.0) AS BIGINT) AS c
      |  FROM a0 JOIN v USING (vec_id) CROSS JOIN generate_series(1, 64) g(pos)),
      |means AS (SELECT cluster, pos,
      |    CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
      |  FROM comp GROUP BY cluster, pos),
      |c1 AS (SELECT cluster AS cid, list(m ORDER BY pos) AS cvec FROM means GROUP BY cluster),
      |s1 AS (SELECT v.vec_id, c1.cid,
      |    ROUND(list_dot_product(v.vec, c1.cvec) /
      |      (sqrt(list_dot_product(v.vec, v.vec)) * sqrt(list_dot_product(c1.cvec, c1.cvec))), 4) AS sim
      |  FROM v CROSS JOIN c1),
      |a1 AS (SELECT vec_id, cluster, sim FROM (SELECT vec_id, cid AS cluster, sim,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn FROM s1) WHERE rn = 1)
      |SELECT cluster, COUNT(*) AS n, MIN(sim) AS min_sim, MAX(sim) AS max_sim
      |FROM a1 GROUP BY cluster""".stripMargin

  // ------------------------------------------------------------------
  // q61: dedup clusters — near-dup pair edges (LSH-bucketed, q34's
  // exact edge set) → connected components (transitive closure: A~B,
  // B~C ⇒ one group) → cluster-size histogram. The Spark side iterates
  // min-label propagation (one shuffle per round); the oracle replays
  // it as a recursive CTE.
  // ------------------------------------------------------------------
  def q61DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val edges = Similarity.embeddingNearDups(e, "vec_id", "embedding",
        threshold = 0.2, planes = 8, prefixBits = 4)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = ConnectedComponents.minLabel(
      e.select(col("vec_id").as("id")), edges)
    ConnectedComponents.clusters(labels)
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        min(col("canonical_id")).as("min_canonical_id"))
  }

  val q61Sql: String =
    """WITH RECURSIVE
      |e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |proj AS (
      |  SELECT e.vec_id, p.p,
      |    SUM(e.v[CAST(i.i AS INT) + 1] *
      |      CASE WHEN substr(md5('plane' || p.p || ':' || i.i), 1, 1) >= '8'
      |           THEN 1.0 ELSE -1.0 END) AS pr
      |  FROM e CROSS JOIN range(8) p(p) CROSS JOIN range(64) i(i)
      |  GROUP BY e.vec_id, p.p),
      |sig AS (
      |  SELECT vec_id,
      |    substr(string_agg(CASE WHEN pr >= 0 THEN '1' ELSE '0' END, '' ORDER BY p), 1, 4) AS bucket
      |  FROM proj GROUP BY vec_id),
      |withv AS (
      |  SELECT s.vec_id, s.bucket, e.v FROM sig s JOIN e ON s.vec_id = e.vec_id),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM withv a JOIN withv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |  WHERE ROUND(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.2),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(a, b) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT r.a, g.dst FROM reach r JOIN edges g ON r.b = g.src),
      |labels AS (SELECT a AS id, MIN(b) AS label FROM reach GROUP BY a),
      |clusters AS (SELECT label, COUNT(*) AS cluster_size FROM labels GROUP BY label)
      |SELECT cluster_size, COUNT(*) AS n_clusters, MIN(label) AS min_canonical_id
      |FROM clusters GROUP BY cluster_size""".stripMargin

  // ------------------------------------------------------------------
  // q79: link-graph centrality — three unrolled PageRank iterations
  // over a supplier→supplier graph derived from lineitem. The scale
  // shape: the EDGE list (∝ data) stays put and is reused every
  // iteration (localCheckpoint — computed once); the RANK vector
  // (∝ nodes ≪ edges) is broadcast to the edges each iteration, so the
  // only shuffle per iteration is the per-destination partial-sum
  // aggregate. All arithmetic is scaled-integer (ranks ×10⁶, damping
  // 0.85 as ×85 div 100, truncating integer division both engines) —
  // bit-identical cross-engine, no float accumulation order issues.
  // ------------------------------------------------------------------
  // ------------------------------------------------------------------
  // q95: link-graph structure metrics — the degree/reciprocity profile
  // that accompanies centrality (q79) in any link-graph quality audit
  // (crawl-graph spam signals, dedup-cluster shape checks). Same edge
  // derivation as q79; out-degree histogram in power-of-two buckets
  // (integer shift arithmetic, no float), reciprocal-edge rate via a
  // self-join on the reversed pair. Edges are distinct-deduped with
  // map-side partials; the reversal join co-shuffles once on the key.
  // ------------------------------------------------------------------
  def q95GraphDegrees(spark: SparkSession, dir: String): DataFrame = {
    val ns = Tables.supplier(spark, dir).count()
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") % ns + 1L).as("dst"))
      .distinct().localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // power-of-two bucket = floor(log2(d)), but computed as an INTEGER
    // comparison ladder: float log2 can land an ulp under an integer at
    // exact powers of two and floor differently across libms
    val bucketExpr = (1 to 20).foldLeft(when(col("d") < 2L, 0L)) {
      case (acc, k) => acc.when(col("d") < (1L << (k + 1)), k.toLong)
    }.otherwise(21L)
    val hist = deg
      .withColumn("bucket", bucketExpr)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("n_edges"))
    val recip = edges.as("a").join(edges.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .agg(count(lit(1)).as("n_recip"))
    hist.crossJoin(broadcast(recip))
      .select(col("bucket"), col("n_nodes"), col("n_edges"), col("n_recip"))
  }

  val q95Sql: String = {
    val ladder = (1 to 20)
      .map(k => s"WHEN d < ${1L << (k + 1)} THEN ${k}").mkString(" ")
    s"""WITH ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
      |e AS (SELECT DISTINCT l_suppkey AS src,
      |        (l_partkey % (SELECT n FROM ns)) + 1 AS dst FROM lineitem),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
      |hist AS (
      |  SELECT CAST(CASE WHEN d < 2 THEN 0 $ladder ELSE 21 END AS BIGINT) AS bucket,
      |    COUNT(*) AS n_nodes, CAST(SUM(d) AS BIGINT) AS n_edges
      |  FROM deg GROUP BY 1),
      |recip AS (
      |  SELECT COUNT(*) AS n_recip
      |  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src)
      |SELECT bucket, n_nodes, n_edges, n_recip
      |FROM hist CROSS JOIN recip""".stripMargin
  }

  // ------------------------------------------------------------------
  // q107: embedding-space outlier pruning — the curation filter that
  // drops vectors far from their class centroid (mislabeled / noisy
  // examples; the per-cluster complement of q59's near-dup prune).
  // Centroid = per-label component SUM vector in ×1e6 scaled integers
  // (exact, order-independent); cosine is scale-invariant, so dividing
  // by the count is never needed — cos(v, Σv) ≡ cos(v, mean). Products
  // accumulate through DECIMAL(38,0)/HUGEINT (s is ∝ label size, so
  // s·s overflows int64 at scale). Plan shape: posexplode keeps a
  // vector's components co-located, so the per-vector dot/norm agg
  // collapses map-side to ONE row per vector before its shuffle; the
  // centroid table (labels × 64 rows) is broadcast — the corpus never
  // shuffles at full width.
  // ------------------------------------------------------------------
  def q107EmbedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val comp = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("c", round(col("x").cast(DoubleType) * lit(1e6)).cast(LongType))
    val cent = comp.groupBy(col("label"), col("pos"))
      .agg(sum(col("c")).as("s"))
    val cnorm = cent.groupBy(col("label"))
      .agg(sum(col("s").cast(dec) * col("s")).as("ns"))
    val dots = comp.join(broadcast(cent), Seq("label", "pos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("c").cast(dec) * col("s")).as("dot"),
        sum(col("c") * col("c")).as("nv"))
    dots.join(broadcast(cnorm), "label")
      .filter(col("nv") > 0)
      .withColumn("cos", round(col("dot").cast(DoubleType) /
        (sqrt(col("nv").cast(DoubleType)) * sqrt(col("ns").cast(DoubleType))), 4))
      .orderBy(col("cos").asc, col("vec_id").asc)
      .limit(20)
      .select(col("vec_id"), col("label"), col("cos"))
  }

  val q107Sql: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |comp AS (
      |  SELECT vec_id, label, g.pos,
      |    CAST(round(vec[CAST(g.pos AS INT)] * 1000000.0) AS BIGINT) AS c
      |  FROM v CROSS JOIN generate_series(1, 64) g(pos)),
      |cent AS (
      |  SELECT label, pos, CAST(SUM(c) AS BIGINT) AS s
      |  FROM comp GROUP BY 1, 2),
      |cn AS (SELECT label, SUM(CAST(s AS HUGEINT) * s) AS ns FROM cent GROUP BY label),
      |dots AS (
      |  SELECT comp.vec_id, comp.label,
      |    SUM(CAST(c AS HUGEINT) * s) AS dot,
      |    CAST(SUM(c * c) AS BIGINT) AS nv
      |  FROM comp JOIN cent USING (label, pos) GROUP BY 1, 2)
      |SELECT vec_id, label,
      |  round(CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(ns AS DOUBLE))), 4) AS cos
      |FROM dots JOIN cn USING (label)
      |WHERE nv > 0
      |ORDER BY cos ASC, vec_id ASC LIMIT 20""".stripMargin

  // ------------------------------------------------------------------
  // q117: triangle counting + global clustering coefficient over the
  // strong-tie supplier graph (q79's edge derivation, kept only where
  // the pair co-occurs ≥4 times — the co-occurrence graph is otherwise
  // 70% dense and triangles are meaningless). The scale algorithm is
  // DEGREE ORIENTATION (Chiba–Nishizeki / "forward" counting): orient
  // every undirected edge from the lower-(degree, id) endpoint to the
  // higher one, generate wedges only among OUT-neighbors, and probe
  // them against the edge set. Out-degree is bounded by O(√m), so
  // wedge count is O(m^1.5) worst case instead of Σ deg² — the
  // difference between hub nodes exploding and not. All counts and the
  // coefficient (3·tri·1000 div wedges) are integers.
  // ------------------------------------------------------------------
  def q117TriangleCount(spark: SparkSession, dir: String): DataFrame = {
    val ns = Tables.supplier(spark, dir).count()
    val li = Tables.lineitem(spark, dir)
    // RELATIVE strong-tie gate: ≥4 at the test SFs (600k rows / 150k),
    // and growing with row count — an absolute gate stops sparsifying
    // when the data grows (measured 8× wall at 10× rows before this)
    val thr = math.max(4L, li.count() / 150000L)
    val und = li
      .select(col("l_suppkey").as("s"), (col("l_partkey") % ns + 1L).as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("u"),
        greatest(col("s"), col("d")).as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= thr).select(col("u"), col("v"))
      .localCheckpoint() // read by degree, orientation, and probe stages
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      // round 17: the node-dimension degree vector is read by both
      // orientation joins — themselves re-planned once per wedge
      // self-join side (the r16 no-reuse finding) — plus the final
      // degree consumer; checkpoint the tiny frame once. The orient
      // frame itself stays UN-checkpointed: GraphNodeJoinSpec pins the
      // broadcast/co-shuffle auto-switch of the node-side joins on the
      // FINAL plan, which a checkpoint would hide (q255's
      // graphTransitivity, not plan-gated, takes the full treatment).
      .localCheckpoint()
    val orient = und
      .join(nodeSide(spark, ns)(
        deg.select(col("node").as("u"), col("dg").as("du"))), "u")
      .join(nodeSide(spark, ns)(
        deg.select(col("node").as("v"), col("dg").as("dv"))), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val wedges = orient.as("x").join(orient.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.b").as("u"), col("y.b").as("v"))
    val tri = wedges.join(und, Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("dg * (dg - 1) div 2")).as("n_wedges"))
    val edges = und.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .withColumn("clustering_permille",
        expr("n_triangles * 3000 div n_wedges"))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), col("clustering_permille"))
  }

  val q117Sql: String =
    """WITH ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
      |e0 AS (SELECT l_suppkey AS s, (l_partkey % (SELECT n FROM ns)) + 1 AS d
      |       FROM lineitem WHERE l_suppkey <> (l_partkey % (SELECT n FROM ns)) + 1),
      |nl AS (SELECT GREATEST(4, COUNT(*) // 150000) AS thr FROM lineitem),
      |und AS (
      |  SELECT LEAST(s, d) AS u, GREATEST(s, d) AS v
      |  FROM e0 GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT thr FROM nl)),
      |deg AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS dg FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY node),
      |orient AS (
      |  SELECT CASE WHEN (du.dg, und.u) < (dv.dg, und.v) THEN und.u ELSE und.v END AS a,
      |         CASE WHEN (du.dg, und.u) < (dv.dg, und.v) THEN und.v ELSE und.u END AS b
      |  FROM und JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node),
      |wedges AS (
      |  SELECT x.b AS u, y.b AS v FROM orient x JOIN orient y
      |  ON x.a = y.a AND x.b < y.b),
      |tri AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      |  FROM wedges w WHERE EXISTS (
      |    SELECT 1 FROM und WHERE und.u = w.u AND und.v = w.v)),
      |stats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |    CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges
      |  FROM deg),
      |edges AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |  n_triangles * 3000 // n_wedges AS clustering_permille
      |FROM stats CROSS JOIN edges CROSS JOIN tri""".stripMargin

  /**
   * Rank-vector distribution auto-switches on node count: a
   * dimension-sized node set BROADCASTS the rank vector each iteration
   * (edges never shuffle); a node set above `graft.pagerank
   * .broadcastNodes` (default 5M — the point where a per-iteration
   * broadcast stops fitting comfortably in executor memory) switches to
   * the JOIN-based contribution shuffle: edges are hash-partitioned on
   * `src` ONCE at checkpoint, each iteration co-shuffles only the rank
   * vector into that partitioning. Same integer arithmetic, same
   * output — PlanAssert test pins both shapes.
   */
  def q79PageRank(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey").as("node"))
    val ns = sup.count()
    val useBroadcast = ns <= nodeBroadcastLimit(spark)
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") % ns + 1L).as("dst"))
      .distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // static across iterations; the join-based path pre-partitions on
    // src ONCE so each iteration re-shuffles only the rank vector
    val joinedEdges = edges.join(deg, "src")
    val edgeDeg =
      (if (useBroadcast) joinedEdges else joinedEdges.repartition(col("src")))
        .localCheckpoint()
    var ranks = sup.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      val rankSide = ranks.withColumnRenamed("node", "src")
      val joined =
        if (useBroadcast) edgeDeg.join(broadcast(rankSide), "src")
        else edgeDeg.join(rankSide, "src")
      val contrib = joined
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = sup.join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
    }
    ranks.orderBy(col("r").desc, col("node").asc).limit(20)
      .select(col("node"), col("r").as("rank_scaled"))
  }

  val q79Sql: String =
    """WITH ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
      |e AS (SELECT DISTINCT l_suppkey AS src,
      |        (l_partkey % (SELECT n FROM ns)) + 1 AS dst FROM lineitem),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
      |r0 AS (SELECT s_suppkey AS node, CAST(1000000 AS BIGINT) AS r FROM supplier),
      |c1 AS (SELECT e.dst AS node, SUM(r0.r // deg.d) AS s
      |       FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst),
      |r1 AS (SELECT r0.node, CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
      |       FROM r0 LEFT JOIN c1 USING (node)),
      |c2 AS (SELECT e.dst AS node, SUM(r1.r // deg.d) AS s
      |       FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst),
      |r2 AS (SELECT r1.node, CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
      |       FROM r1 LEFT JOIN c2 USING (node)),
      |c3 AS (SELECT e.dst AS node, SUM(r2.r // deg.d) AS s
      |       FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src GROUP BY e.dst),
      |r3 AS (SELECT r2.node, CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
      |       FROM r2 LEFT JOIN c3 USING (node))
      |SELECT node, r AS rank_scaled FROM r3
      |ORDER BY r DESC, node ASC LIMIT 20""".stripMargin

  // ------------------------------------------------------------------
  // q205: label-propagation community detection (Raghavan 2007) —
  // three SYNCHRONOUS unrolled rounds over the q79/q95 supplier link
  // graph, made deterministic by the fixed tie-break (max neighbor-
  // label count, then MIN label): the classic near-linear community
  // finder used to group near-duplicate clusters, crawl hosts, or
  // entity blocks without choosing k. Isolated nodes keep their own
  // label. The argmax is max(struct(cnt, -label)) — one aggregate, no
  // window over an unbounded partition.
  //
  // Scale shape: the undirected edge list is built ONCE
  // (localCheckpoint); per round the label vector (∝ nodes ≪ edges)
  // joins onto it through the q79 broadcast/shuffle auto-switch
  // (nodeSide): under graft.graph.broadcastNodes the vector
  // broadcasts and each round's only shuffle is the (dst,label)
  // tally, itself map-side combined and bounded by per-node
  // neighbor-label diversity; beyond it the edges are pre-partitioned
  // on src once and each round co-shuffles only the label vector.
  // Output collapses to a community-size histogram (dimension-sized).
  // ------------------------------------------------------------------
  def q205LabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast(LongType).as("id"))
    val ns = sup.count()
    // the undecimated q79 graph is near-complete at test SFs and
    // collapses to ONE community — decimating by orderkey keeps a real
    // mix of isolated nodes, small clusters, and a giant component, so
    // every code path (keep-own-label, tie-break, propagation) is live
    val e0 = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 97 === 0)
      .select(col("l_suppkey").cast(LongType).as("src"),
        (col("l_partkey") % ns + 1L).as("dst"))
    val useBroadcast = ns <= nodeBroadcastLimit(spark)
    val edges0 = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // join-based mode pre-partitions the edges on src ONCE (the q79
    // convention) so each round co-shuffles only the label vector
    val edges = (if (useBroadcast) edges0 else edges0.repartition(col("src")))
      .localCheckpoint()
    var labels = sup.select(col("id"), col("id").as("label"))
    for (_ <- 1 to 3) {
      val best = edges
        .join(nodeSide(spark, ns)(labels.withColumnRenamed("id", "src")), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("new_label"))
      labels = sup.join(best, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("new_label"), col("id")).as("label"))
    }
    labels.groupBy(col("label")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_communities"), min(col("label")).as("min_label"))
  }

  val q205Sql: String = {
    def round(i: Int): String =
      s"""c$i AS (
         |  SELECT e.dst AS id, l.label, COUNT(*) AS cnt
         |  FROM e JOIN l${i - 1} l ON e.src = l.id GROUP BY 1, 2),
         |b$i AS (
         |  SELECT id, label FROM (
         |    SELECT id, label, row_number() OVER
         |      (PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM c$i)
         |  WHERE rn = 1),
         |l$i AS (
         |  SELECT p.id, COALESCE(b.label, p.id) AS label
         |  FROM l0 p LEFT JOIN b$i b USING (id))""".stripMargin
    s"""WITH ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
       |e0 AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
       |         (l_partkey % (SELECT n FROM ns)) + 1 AS dst
       |       FROM lineitem WHERE l_orderkey % 97 = 0),
       |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |l0 AS (SELECT CAST(s_suppkey AS BIGINT) AS id,
       |         CAST(s_suppkey AS BIGINT) AS label FROM supplier),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |comm AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz
       |  FROM l3 GROUP BY 1)
       |SELECT sz AS cluster_size, COUNT(*) AS n_communities,
       |  CAST(MIN(label) AS BIGINT) AS min_label
       |FROM comm GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // q207: k-core peel (Seidman 1983) — three unrolled rounds of the
  // degeneracy peel that underlies spam/host-graph triage and
  // dedup-cluster densification: repeatedly drop nodes of degree < k
  // (k=5) and the edges they carry, reporting the (n_alive, n_edges)
  // trajectory per round. The supplier graph is decimated harder than
  // q205's (orderkey % 199) so the peel actually bites — each round
  // removes real mass at both test SFs instead of converging at once.
  //
  // Scale shape: the directed edge list is built ONCE
  // (localCheckpoint); per round ONE map-side-combined degree tally,
  // then the alive set (∝ nodes ≪ edges) joins back onto the edges
  // for the two endpoint filters through the q79 broadcast/shuffle
  // auto-switch (nodeSide) — under the threshold the corpus-sized
  // side never re-shuffles; beyond it the shrinking edge list
  // co-shuffles, bounded memory either way. Round outputs are single
  // counts; the result frame is assembled from three dimension-sized
  // actions.
  // ------------------------------------------------------------------
  // ------------------------------------------------------------------
  // q211: local clustering-coefficient profile (Watts–Strogatz 1998) —
  // the per-node sibling of q117's global transitivity: each node's
  // LCC = triangles_at(v) / C(deg(v), 2), folded into a decile
  // histogram. The profile separates clique-like neighborhoods from
  // star hubs — the shape signal host-graph spam triage and
  // dedup-cluster QA read (a near-dup cluster should be clique-like;
  // a template hub is a star with LCC ≈ 0). Same degree-orientation
  // wedge probe as q117, but over the q205 decimated graph (q117's
  // strong-tie gate leaves a near-clique whose every node sits in one
  // band) and the triangle join keeps all three endpoints, exploding
  // them to per-node counts — exact integer permille in 25-permille
  // bands, truncating division.
  //
  // Scale shape: identical to q117 (edge list checkpointed, degree
  // side through the q79 broadcast/shuffle auto-switch, oriented
  // wedge self-join bounded by the orientation trick); the per-node
  // explode adds one tally whose input is the triangle list, then
  // everything is degree-dimension-sized.
  // ------------------------------------------------------------------
  def q211LccProfile(spark: SparkSession, dir: String): DataFrame = {
    val ns = Tables.supplier(spark, dir).count()
    val und = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 97 === 0)
      .select(col("l_suppkey").as("s"), (col("l_partkey") % ns + 1L).as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("u"),
        greatest(col("s"), col("d")).as("v"))
      .distinct()
      .localCheckpoint() // read by degree, orientation, and probe stages
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      // round 17: the node-dimension degree vector is read by both
      // orientation joins — themselves re-planned once per wedge
      // self-join side (the r16 no-reuse finding) — plus the final
      // degree consumer; checkpoint the tiny frame once. The orient
      // frame itself stays UN-checkpointed: GraphNodeJoinSpec pins the
      // broadcast/co-shuffle auto-switch of the node-side joins on the
      // FINAL plan, which a checkpoint would hide (q255's
      // graphTransitivity, not plan-gated, takes the full treatment).
      .localCheckpoint()
    val orient = und
      .join(nodeSide(spark, ns)(
        deg.select(col("node").as("u"), col("dg").as("du"))), "u")
      .join(nodeSide(spark, ns)(
        deg.select(col("node").as("v"), col("dg").as("dv"))), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val wedges = orient.as("x").join(orient.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.a").as("a"), col("x.b").as("u"), col("y.b").as("v"))
    val tris = wedges.join(und, Seq("u", "v"), "left_semi")
    val perNode = tris
      .select(explode(array(col("a"), col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .filter(col("dg") >= 2) // LCC undefined below two neighbors
      .select(col("node"), col("dg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("lcc_permille", expr("(tri * 2000) div (dg * (dg - 1))"))
      .groupBy(expr("lcc_permille div 25").as("band"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("tri")).as("sum_tri"),
        max(col("dg")).as("max_degree"))
  }

  val q211Sql: String =
    """WITH ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
      |und AS (
      |  SELECT DISTINCT
      |    LEAST(l_suppkey, (l_partkey % (SELECT n FROM ns)) + 1) AS u,
      |    GREATEST(l_suppkey, (l_partkey % (SELECT n FROM ns)) + 1) AS v
      |  FROM lineitem WHERE l_orderkey % 97 = 0
      |    AND l_suppkey <> (l_partkey % (SELECT n FROM ns)) + 1),
      |deg AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS dg FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY node),
      |orient AS (
      |  SELECT CASE WHEN (du.dg, und.u) < (dv.dg, und.v) THEN und.u ELSE und.v END AS a,
      |         CASE WHEN (du.dg, und.u) < (dv.dg, und.v) THEN und.v ELSE und.u END AS b
      |  FROM und JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node),
      |tris AS (
      |  SELECT x.a AS a, x.b AS u, y.b AS v FROM orient x JOIN orient y
      |  ON x.a = y.a AND x.b < y.b
      |  WHERE EXISTS (SELECT 1 FROM und WHERE und.u = x.b AND und.v = y.b)),
      |pn AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
      |    SELECT a AS node FROM tris UNION ALL SELECT u FROM tris
      |    UNION ALL SELECT v FROM tris)
      |  GROUP BY node),
      |lcc AS (
      |  SELECT d.node, d.dg, COALESCE(pn.tri, 0) AS tri,
      |    (COALESCE(pn.tri, 0) * 2000) // (d.dg * (d.dg - 1)) AS lcc_permille
      |  FROM deg d LEFT JOIN pn ON pn.node = d.node
      |  WHERE d.dg >= 2)
      |SELECT CAST(lcc_permille // 25 AS BIGINT) AS band,
      |  COUNT(*) AS n_nodes, CAST(SUM(tri) AS BIGINT) AS sum_tri,
      |  CAST(MAX(dg) AS BIGINT) AS max_degree
      |FROM lcc GROUP BY 1""".stripMargin

  /** q207's per-round corpus stages — the loop body, package-visible
    * so ExchangeBudgetSpec can gate one representative round (the
    * driver-assembled result frame hides them from the final plan).
    * The alive tally is the round's ONE shuffle; the endpoint filter
    * must stay broadcast-only. */
  private[graft] def q207AlivePlan(e: DataFrame, k: Int): DataFrame =
    e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k).select(col("src").as("id"))

  private[graft] def q207FilterPlan(e: DataFrame, alive: DataFrame,
      hint: DataFrame => DataFrame = broadcast): DataFrame =
    e.join(hint(alive.withColumnRenamed("id", "src")), "src")
      .join(hint(alive.withColumnRenamed("id", "dst")), "dst")
      .select(col("src"), col("dst"))

  def q207KCorePeel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 5
    val ns = Tables.supplier(spark, dir).count()
    val e0 = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 199 === 0)
      .select(col("l_suppkey").cast(LongType).as("src"),
        (col("l_partkey") % ns + 1L).as("dst"))
    var e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val out = Seq.newBuilder[(Int, Long, Long)]
    for (r <- 1 to 3) {
      val alive = q207AlivePlan(e, k)
        .localCheckpoint() // hinted into BOTH endpoint filters
      e = q207FilterPlan(e, alive, nodeSide(spark, ns))
        .localCheckpoint() // next round peels the shrunken list
      out += ((r, alive.count(), e.count()))
    }
    out.result().toDF("round", "n_alive", "n_edges")
  }

  val q207Sql: String = {
    def peel(i: Int): String =
      s"""a$i AS (SELECT src AS id FROM e${i - 1}
         |  GROUP BY src HAVING COUNT(*) >= 5),
         |e$i AS (SELECT p.src, p.dst FROM e${i - 1} p
         |  JOIN a$i x ON p.src = x.id JOIN a$i y ON p.dst = y.id)""".stripMargin
    s"""WITH ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
       |ed AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
       |         (l_partkey % (SELECT n FROM ns)) + 1 AS dst
       |       FROM lineitem WHERE l_orderkey % 199 = 0),
       |e0 AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
       |${peel(1)},
       |${peel(2)},
       |${peel(3)}
       |SELECT 1 AS round, (SELECT COUNT(*) FROM a1) AS n_alive,
       |  (SELECT COUNT(*) FROM e1) AS n_edges
       |UNION ALL SELECT 2, (SELECT COUNT(*) FROM a2),
       |  (SELECT COUNT(*) FROM e2)
       |UNION ALL SELECT 3, (SELECT COUNT(*) FROM a3),
       |  (SELECT COUNT(*) FROM e3)""".stripMargin
  }

  // ------------------------------------------------------------------
  // q229: HITS hubs & authorities (Kleinberg 1999) over the q79
  // supplier link graph — the directed-graph dual of PageRank that
  // crawl pipelines use to separate DIRECTORY pages (hubs: link to many
  // good sources) from CONTENT pages (authorities: linked by many good
  // hubs) when prioritizing fetch/refresh budgets. Two synchronous
  // unrolled rounds: auth(v) = Σ hub over in-edges, hub(u) = Σ auth
  // over out-edges, each renormalized to max = 10^6 in INTEGER
  // arithmetic (x * 10^6 div max — bit-portable across engines, no
  // float norms).
  //
  // Scale shape (the q79 contract): the edge list is pre-partitioned
  // ONCE per join key (src for the auth step, dst for the hub step,
  // both checkpointed) so each iteration re-shuffles only the k-node
  // score vector, which rides `nodeSide` — broadcast under the 5M-node
  // threshold, co-shuffled join beyond. The renormalizing max is a
  // 1-row aggregate broadcast back. Iterations are fixed (2), so the
  // whole plan is static.
  // ------------------------------------------------------------------
  def q229Hits(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey").as("node"))
    val ns = sup.count()
    val side = nodeSide(spark, ns) _
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") % ns + 1L).as("dst"))
      .distinct()
    val useBroadcast = ns <= nodeBroadcastLimit(spark)
    val edgeBySrc =
      (if (useBroadcast) edges else edges.repartition(col("src")))
        .localCheckpoint()
    val edgeByDst =
      (if (useBroadcast) edgeBySrc else edgeBySrc.repartition(col("dst")))
        .localCheckpoint()

    // Renorm (round 17): the pre-renorm half-step frame is LAZILY
    // checkpointed and the renormalizing max fetched as a driver scalar
    // from the SAME job that materializes it. The former
    // `crossJoin(broadcast(scores.agg(max)))` planned the un-checkpointed
    // half-step subtree once per consumer (the r16 no-reuse finding), so
    // every half-step ran its edge join + aggregation TWICE — once under
    // the broadcast max, once in the main plan — before the post-renorm
    // checkpoint materialized it. Now: one job, one edge join, per
    // half-step; the renorm division is a cheap projection over the
    // cached blocks, re-run by its two readers (next half-step + final
    // join). `greatest(mx, 1)` semantics unchanged — the scalar is the
    // exact integer max the broadcast agg computed.
    def renormed(raw: DataFrame, c: String): DataFrame = {
      val frame = raw.localCheckpoint(eager = false)
      val row = frame.agg(max(col(c))).collect()(0)
      val mx = if (row.isNullAt(0)) 0L else row.getLong(0)
      frame.select(col("node"),
        expr(s"$c * 1000000 div greatest(${mx}L, 1)").as(c))
    }

    var hub = sup.select(col("node"), lit(1000000L).as("h"))
    var auth = sup.select(col("node"), lit(0L).as("a"))
    for (_ <- 1 to 2) {
      val aRaw = edgeBySrc
        .join(side(hub.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
        .withColumnRenamed("dst", "node")
      auth = renormed(
        sup.join(aRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("a"), lit(0L)).as("a")), "a")
      val hRaw = edgeByDst
        .join(side(auth.withColumnRenamed("node", "dst")), "dst")
        .groupBy(col("src")).agg(sum(col("a")).as("h"))
        .withColumnRenamed("src", "node")
      hub = renormed(
        sup.join(hRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("h"), lit(0L)).as("h")), "h")
    }
    auth.join(hub, "node")
      .select(col("node"), col("a").as("auth_scaled"), col("h").as("hub_scaled"))
      .orderBy(col("auth_scaled").desc, col("hub_scaled").desc, col("node").asc)
      .limit(20)
  }

  val q229Sql: String = {
    // one unrolled round: auth from hubs h<i-1>, hub from auths a<i>
    def round(i: Int): String = {
      val hPrev = s"h${i - 1}"
      s"""ar$i AS (SELECT e.dst AS node, SUM($hPrev.h) AS a
         |       FROM e JOIN $hPrev ON $hPrev.node = e.src GROUP BY e.dst),
         |a$i AS (SELECT n.node,
         |       COALESCE(ar$i.a, 0) * 1000000
         |         // greatest((SELECT MAX(a) FROM ar$i), 1) AS a
         |       FROM nodes n LEFT JOIN ar$i USING (node)),
         |hr$i AS (SELECT e.src AS node, SUM(a$i.a) AS h
         |       FROM e JOIN a$i ON a$i.node = e.dst GROUP BY e.src),
         |h$i AS (SELECT n.node,
         |       COALESCE(hr$i.h, 0) * 1000000
         |         // greatest((SELECT MAX(h) FROM hr$i), 1) AS h
         |       FROM nodes n LEFT JOIN hr$i USING (node))""".stripMargin
    }
    s"""WITH ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier),
       |nodes AS (SELECT s_suppkey AS node FROM supplier),
       |e AS (SELECT DISTINCT l_suppkey AS src,
       |        (l_partkey % (SELECT n FROM ns)) + 1 AS dst FROM lineitem),
       |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
       |${round(1)},
       |${round(2)}
       |SELECT a2.node, CAST(a2.a AS BIGINT) AS auth_scaled,
       |  CAST(h2.h AS BIGINT) AS hub_scaled
       |FROM a2 JOIN h2 USING (node)
       |ORDER BY auth_scaled DESC, hub_scaled DESC, node ASC
       |LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------------------
  // q230: Davies–Bouldin cluster-quality index per label — the
  // centroid-based separation audit for an embedding space: for each
  // label cluster, the worst (S_i + S_j) / M_ij ratio against any
  // other cluster, where S is the RMS distance of members to their
  // centroid and M the centroid distance. High ratio = the label
  // blurs into a neighbor (mislabeled data, collapsed embedding space)
  // — the audit you run before trusting label-stratified sampling or
  // classifier training. Chosen over silhouette because silhouette is
  // O(n²) in members; DB is centroid-based, so the corpus contributes
  // ONE pass of per-(label,pos) integer sums and everything after is
  // k×64-dimension arithmetic.
  //
  // Exactness protocol: components scale to 1e6 ints (q60), scatter
  // numerator n·Σc² − (Σc)² accumulates in DECIMAL(38,0) with operands
  // cast BEFORE the products (q217 — Long wraps past ~2^63), centroid
  // distances fold left-to-right over pos-sorted arrays (the q60
  // list_dot_product convention), S/M round at 6 dp and ratios at 4 dp.
  // ------------------------------------------------------------------
  def q230DaviesBouldin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val comps = e.select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        round(col("x").cast(DoubleType) * 1000000.0).cast(LongType).as("c"))
    val byPos = comps.groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)"))
          .as("sc2"))
    val perLabel = byPos
      .withColumn("ssd",
        col("n").cast("decimal(38,0)") * col("sc2") -
          col("sc").cast("decimal(38,0)") * col("sc").cast("decimal(38,0)"))
      .withColumn("m", col("sc").cast(DoubleType) / col("n").cast(DoubleType))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("ssd")).as("t"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cent"))
      .withColumn("s", round(
        sqrt(col("t").cast(DoubleType)) /
          (col("n_vecs").cast(DoubleType) * 1000000.0), 6))
      .select(col("label"), col("n_vecs"), col("s"), col("cent"))
      .localCheckpoint() // k rows; both sides of the pair join
    val a = perLabel.alias("a")
    val b = perLabel.alias("b")
    val ratios = a.join(b, col("a.label") =!= col("b.label"))
      .withColumn("m_ij", round(
        sqrt(aggregate(
          zip_with(col("a.cent"), col("b.cent"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)) / 1000000.0, 6))
      .withColumn("r", round(
        (col("a.s") + col("b.s")) / greatest(col("m_ij"), lit(1e-12)), 4))
    ratios
      .groupBy(col("a.label").as("label"))
      .agg(max(col("a.n_vecs")).as("n_vecs"),
        max(col("a.s")).as("scatter"),
        max(struct(col("r"), (-col("b.label")).as("neg")))
          .as("worst"))
      .select(col("label"), col("n_vecs"), col("scatter"),
        (-col("worst.neg")).as("worst_other"),
        col("worst.r").as("db_ratio"))
      .orderBy(col("label"))
  }

  val q230Sql: String =
    """WITH v AS (
      |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |comp AS (
      |  SELECT label, g.pos,
      |    CAST(round(vec[CAST(g.pos AS INT)] * 1000000.0) AS BIGINT) AS c
      |  FROM v CROSS JOIN generate_series(1, 64) g(pos)),
      |bypos AS (
      |  SELECT label, pos, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(c) AS BIGINT) AS sc,
      |    SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS sc2
      |  FROM comp GROUP BY label, pos),
      |lab AS (
      |  SELECT label, MAX(n) AS n_vecs,
      |    SUM(CAST(n AS DECIMAL(38,0)) * sc2
      |        - CAST(sc AS DECIMAL(38,0)) * CAST(sc AS DECIMAL(38,0))) AS t,
      |    list(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS cent
      |  FROM bypos GROUP BY label),
      |scat AS (
      |  SELECT label, n_vecs,
      |    round(sqrt(CAST(t AS DOUBLE)) / (CAST(n_vecs AS DOUBLE) * 1000000.0), 6) AS s,
      |    cent
      |  FROM lab),
      |pairs AS (
      |  SELECT a.label AS la, a.n_vecs, a.s AS sa, b.label AS lb, b.s AS sb,
      |    round(sqrt(list_dot_product(
      |      list_transform(range(1, 65),
      |        i -> a.cent[CAST(i AS INT)] - b.cent[CAST(i AS INT)]),
      |      list_transform(range(1, 65),
      |        i -> a.cent[CAST(i AS INT)] - b.cent[CAST(i AS INT)]))) / 1000000.0, 6)
      |      AS m_ij
      |  FROM scat a JOIN scat b ON a.label <> b.label),
      |ratios AS (
      |  SELECT la, n_vecs, sa,
      |    round((sa + sb) / greatest(m_ij, 1e-12), 4) AS r, lb
      |  FROM pairs),
      |worst AS (
      |  SELECT la, n_vecs, sa, r, lb,
      |    ROW_NUMBER() OVER (PARTITION BY la ORDER BY r DESC, lb ASC) AS rn
      |  FROM ratios)
      |SELECT la AS label, n_vecs, sa AS scatter, lb AS worst_other,
      |  r AS db_ratio
      |FROM worst WHERE rn = 1 ORDER BY label""".stripMargin
}
