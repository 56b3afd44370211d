package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.DedupAuditQueries

/**
 * Pins q255's degree-ordered triangle/wedge engine against a
 * brute-force reference on random graphs — node counts, edge counts,
 * wedge sums, triangle counts, and the transitivity ppm must all match
 * the O(n³) enumeration exactly, including the hub-heavy star+clique
 * shapes where the degree orientation does its work and the degenerate
 * zero-wedge graphs where transitivity must be NULL (not NaN or 0).
 */
class TransitivitySpec extends SparkTestBase {

  import spark.implicits._

  private def reference(edges: Set[(Long, Long)]): (Long, Long, Long, Long, Option[Long]) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(n => n ->
      edges.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }
    ).toMap
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val ns = nodes.toSeq.sorted
    var tri = 0L
    for {
      i <- ns.indices; j <- (i + 1) until ns.size; k <- (j + 1) until ns.size
      if adj(ns(i)).contains(ns(j)) && adj(ns(j)).contains(ns(k)) &&
        adj(ns(i)).contains(ns(k))
    } tri += 1
    val t = if (wedges > 0) Some(tri * 3000000L / wedges) else None
    (nodes.size.toLong, edges.size.toLong, wedges, tri, t)
  }

  private def run(edges: Set[(Long, Long)]): (Long, Long, Long, Long, Option[Long]) = {
    val df = edges.toSeq.sorted.toDF("u", "v")
    val r: Row = DedupAuditQueries.graphTransitivity(df).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  private def randomGraph(seed: Long, n: Int, p: Double): Set[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      i <- 0 until n; j <- (i + 1) until n
      if rnd.nextDouble() < p
    } yield (i.toLong, j.toLong)).toSet
  }

  test("random graphs match the brute-force reference exactly") {
    for (seed <- 0L until 8L; p <- Seq(0.1, 0.35, 0.8)) {
      val g = randomGraph(seed * 31 + (p * 100).toLong, 4 + (seed % 9).toInt * 2, p)
      if (g.nonEmpty) assert(run(g) == reference(g), s"seed=$seed p=$p")
    }
  }

  test("hub star (the degree-orientation stress shape) and clique") {
    // star: hub 0 connected to 1..12 — 66 wedges, 0 triangles
    val star = (1L to 12L).map(i => (0L, i)).toSet
    assert(run(star) == reference(star))
    assert(run(star)._5.contains(0L))
    // clique K6 + a pendant chain: dense triangles plus open wedges
    val k6 = (for (i <- 0 until 6; j <- (i + 1) until 6)
      yield (i.toLong, j.toLong)).toSet
    val g = k6 ++ Set((5L, 20L), (20L, 21L))
    assert(run(g) == reference(g))
  }

  // ------------------------------------------------------------------
  // ScalaCheck generator (the IntervalUnionSweep/BpeSpec bar): graphs
  // with 1–4 DISCONNECTED components (node-id offsets 1000 apart) of
  // varying size and density. The fixed 8-seed × 3-density grid above
  // never produces a disconnected graph, and the engine's degree
  // tally + orientation must not leak counts across components.
  // ------------------------------------------------------------------
  private def componentGen(offset: Long): Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(2, 9)
    density <- Gen.choose(0.1, 0.9)
    picks <- Gen.listOfN(n * (n - 1) / 2, Gen.choose(0.0, 1.0))
  } yield {
    val pairs = for { i <- 0 until n; j <- (i + 1) until n }
      yield (offset + i, offset + j)
    pairs.zip(picks).collect { case (e, r) if r < density => e }.toSet
  }

  private val graphGen: Gen[Set[(Long, Long)]] = for {
    nComp <- Gen.choose(1, 4)
    comps <- Gen.sequence[List[Set[(Long, Long)]], Set[(Long, Long)]](
      (0 until nComp).toList.map(c => componentGen(c * 1000L)))
  } yield comps.flatten.toSet

  test("generated multi-component graphs match the brute-force reference") {
    (0 until 60).foreach { i =>
      val g = graphGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      // engine input contract: u < v, duplicate-free. The u < v
      // assert is the load-bearing check — with every pair ordered,
      // a Set[(Long, Long)] cannot hold the same undirected edge
      // twice (a doubled edge would need both orientations, and the
      // reversed one fails here first), so duplicate-freedom holds by
      // construction rather than by a second assertion.
      assert(g.forall { case (u, v) => u < v },
        s"seed $i: generator emitted a reversed edge")
      if (g.nonEmpty) assert(run(g) == reference(g), s"seed $i: $g")
    }
  }

  test("a single edge has zero wedges and NULL transitivity") {
    val (n, e, w, t, tr) = run(Set((1L, 2L)))
    assert((n, e, w, t) == ((2L, 1L, 0L, 0L)))
    assert(tr.isEmpty)
  }
}
