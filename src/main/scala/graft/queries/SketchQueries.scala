package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HllAggregate
import graft.sources.Tables

/**
 * Mergeable-sketch queries with byte-exact cross-engine oracles: the
 * sketch registers themselves are the frozen contract (splitmix64 +
 * integer register arithmetic), so an independent engine replays them
 * exactly — the property a persisted, cross-run/cross-engine sketch
 * store needs, and the reason these sit next to the Datasketches-backed
 * paths (q115) rather than replacing them.
 */
object SketchQueries {

  // Frozen HLL estimate constants (q196): alpha_1024 = 0.7213/(1+1.079/1024)
  // to 10 dp, and m^2 * 2^55 = 2^75 (exact in double). Shared verbatim
  // with the oracle so no engine evaluates the alpha formula at runtime.
  private val Alpha1024 = 0.7205407583
  private val M2Pow55 = 37778931862957161709568.0 // 2^75

  // ------------------------------------------------------------------
  // q196: deterministic HLL distinct-user counts per event type — the
  // approximate-distinct operator whose REGISTERS are oracle-checkable:
  // splitmix64(user_id), top-10 hash bits pick one of 1024 registers,
  // leading-zero rank of the remaining 54 bits is the register value,
  // estimate = alpha * m^2 / sum(2^-reg) with the harmonic sum carried
  // as an exact integer numerator (sum of 2^(55-reg) in DECIMAL(38,0))
  // until ONE final IEEE division.
  //
  // Scale shape: the corpus folds into per-partition 1 KiB register
  // buffers inside the hash-agg (HllAggregate — corpus never shuffles
  // for the sketch); the posexplode + digest run on the DIMENSION-sized
  // (event_type x 1024) register table. The exact countDistinct rides
  // the same pipeline for the error column — at 100 TB you'd drop it
  // and keep only the sketch path.
  // ------------------------------------------------------------------
  def q196HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"))
    // SEPARATE aggregations, tiny broadcast join: fusing the sketch
    // with countDistinct plants an Expand above the corpus, whose
    // thousands of (type,user) groups push the TypedImperativeAggregate
    // off ObjectHashAggregate onto sort-agg — a whole-corpus sort (the
    // round-5 fallback gotcha; measured 2.2x at 10x before the split).
    // Alone, the sketch agg has |types| groups and stays hash-based.
    val regs = ev.groupBy(col("event_type"))
      .agg(HllAggregate.hllRegisters(col("user_id"), 10).as("regs"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val perReg = regs.join(broadcast(exact), "event_type")
      .select(col("event_type"), col("exact_users"),
        explode(col("regs")).as("r"))
    perReg
      .groupBy(col("event_type"), col("exact_users"))
      .agg(
        sum(when(col("r") > 0, 1L).otherwise(0L)).as("nonzero_regs"),
        sum(col("r").cast(LongType)).as("sum_rho"),
        max(col("r").cast(LongType)).as("max_rho"),
        sum(expr("CAST(shiftleft(1L, 55 - CAST(r AS INT)) AS DECIMAL(38,0))"))
          .as("num"))
      .select(
        col("event_type"), col("exact_users"),
        col("nonzero_regs"), col("sum_rho"), col("max_rho"),
        floor(lit(Alpha1024) * lit(M2Pow55) / col("num").cast(DoubleType))
          .cast(LongType).as("hll_est"))
      .withColumn("rel_err_pct",
        round((col("hll_est") - col("exact_users")).cast(DoubleType)
          * 100.0 / col("exact_users").cast(DoubleType), 4))
  }

  /** The oracle replays the register pipeline in exact integer SQL:
    * splitmix64 via HUGEINT mul-split (z*c mod 2^64 done as low/high
    * 32-bit halves so the 128-bit product never overflows), rho via a
    * powers-of-two rank join (no floating log2). */
  val q196Sql: String = {
    val pow2 = (0 to 53).map(k => s"(${1L << k})").mkString(", ")
    s"""WITH du AS (
       |  SELECT DISTINCT event_type, user_id FROM events
       |  WHERE user_id IS NOT NULL),
       |ex AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_users
       |  FROM du GROUP BY 1),
       |h0 AS (SELECT event_type, user_id,
       |  (user_id::HUGEINT + 11400714819323198485) % 18446744073709551616 AS z0
       |  FROM du),
       |h1 AS (SELECT *, xor(z0, z0 >> 30) AS z1 FROM h0),
       |h2 AS (SELECT *,
       |  ((z1 % 4294967296) * 13787848793156543929
       |   + ((z1 // 4294967296) * 13787848793156543929 % 4294967296)
       |     * 4294967296) % 18446744073709551616 AS z2 FROM h1),
       |h3 AS (SELECT *, xor(z2, z2 >> 27) AS z3 FROM h2),
       |h4 AS (SELECT *,
       |  ((z3 % 4294967296) * 10723151780598845931
       |   + ((z3 // 4294967296) * 10723151780598845931 % 4294967296)
       |     * 4294967296) % 18446744073709551616 AS z4 FROM h3),
       |h5 AS (SELECT event_type, user_id, xor(z4, z4 >> 31) AS h FROM h4),
       |jl AS (SELECT event_type, user_id,
       |  h // 18014398509481984 AS j, h % 18014398509481984 AS lo FROM h5),
       |pw(v) AS (VALUES $pow2),
       |rk AS (SELECT event_type, j,
       |  55 - (SELECT COUNT(*) FROM pw WHERE pw.v <= jl.lo) AS rho FROM jl),
       |hit AS (SELECT event_type, j, MAX(rho) AS r FROM rk GROUP BY 1, 2),
       |grid AS (
       |  SELECT e.event_type, g.range AS j
       |  FROM (SELECT DISTINCT event_type FROM du) e, range(1024) g),
       |regs AS (
       |  SELECT grid.event_type, grid.j, COALESCE(hit.r, 0) AS r
       |  FROM grid LEFT JOIN hit
       |    ON hit.event_type = grid.event_type AND hit.j = grid.j),
       |digest AS (
       |  SELECT event_type,
       |    CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero_regs,
       |    CAST(SUM(r) AS BIGINT) AS sum_rho,
       |    CAST(MAX(r) AS BIGINT) AS max_rho,
       |    SUM(1::HUGEINT << (55 - r)) AS num
       |  FROM regs GROUP BY 1)
       |SELECT d.event_type, ex.exact_users, d.nonzero_regs, d.sum_rho,
       |  d.max_rho,
       |  CAST(FLOOR(CAST(0.7205407583 AS DOUBLE) * 37778931862957161709568.0
       |    / CAST(d.num AS DOUBLE)) AS BIGINT) AS hll_est,
       |  round(CAST(CAST(FLOOR(CAST(0.7205407583 AS DOUBLE)
       |      * 37778931862957161709568.0 / CAST(d.num AS DOUBLE)) AS BIGINT)
       |      - ex.exact_users AS DOUBLE)
       |    * 100.0 / CAST(ex.exact_users AS DOUBLE), 4) AS rel_err_pct
       |FROM digest d JOIN ex ON ex.event_type = d.event_type""".stripMargin
  }

  // Count-min seeds (q200): the first four 64-bit chunks of pi's hex
  // expansion — public nothing-up-my-sleeve constants, all < 2^63 so
  // the decimal literals are identical signed/unsigned in both engines.
  private val CmSeeds: Seq[Long] = Seq(
    0x243F6A8885A308D3L, 0x13198A2E03707344L,
    0x082EFA98EC4E6C89L, 0x452821E638D01377L)

  // ------------------------------------------------------------------
  // q200: count-min sketch of per-user event frequencies (Cormode &
  // Muthukrishnan 2005) — depth 4 x width 512, register index = top
  // 9 bits of mix64(user_id XOR seed_d). Point queries on the 20 most
  // active users compare the sketch estimate (min over the 4 rows)
  // against exact counts; `overcount` is the sketch's one-sided error,
  // structurally >= 0. Like q196, the REGISTERS are the cross-engine
  // contract — every cell replays in integer SQL.
  //
  // 100 TB shape: the 4-way seeded fan-out happens per-row ahead of
  // ONE map-side-combined (d, j) tally — 2048 groups regardless of
  // corpus size, so the exchange moves ~2048 rows per mapper. The
  // exact side is a per-user agg + TakeOrdered(20); the 2048-cell
  // sketch broadcasts onto the 20 probes. At 100 TB you'd keep the
  // sketch table and drop the exact side — it exists here to expose
  // the error, and because the oracle needs a truth column.
  // ------------------------------------------------------------------
  def q200CountMin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Mix64Expression.mix64
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"))
    val cells = ev.select(explode(array(CmSeeds.zipWithIndex.map {
        case (seed, d) => struct(
          lit(d).as("d"),
          shiftrightunsigned(mix64(col("user_id"), seed), 55).as("j"))
      }: _*)).as("c"))
      .select(col("c.d").as("d"), col("c.j").as("j"))
      .groupBy(col("d"), col("j")).agg(count(lit(1)).as("cell"))
    val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(20)
    val probes = top.select(col("user_id"), col("exact_n"),
      explode(array(CmSeeds.zipWithIndex.map { case (seed, d) =>
        struct(lit(d).as("d"),
          shiftrightunsigned(mix64(col("user_id"), seed), 55).as("j"))
      }: _*)).as("c"))
      .select(col("user_id"), col("exact_n"),
        col("c.d").as("d"), col("c.j").as("j"))
    probes.join(broadcast(cells), Seq("d", "j"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("cell")).as("cm_est"))
      .select(col("user_id"), col("exact_n"), col("cm_est"),
        (col("cm_est") - col("exact_n")).as("overcount"))
  }

  /** Oracle: per-user exact counts (cheap at oracle scale) fan out
    * through the same four-seed HUGEINT mix chain; registers are
    * SUM(user count) per (d, j); estimates are MIN over d. */
  val q200Sql: String = {
    val seeds = CmSeeds.zipWithIndex
      .map { case (s, d) => s"($d, ${java.lang.Long.toUnsignedString(s)})" }
      .mkString(", ")
    s"""WITH uc AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
       |  WHERE user_id IS NOT NULL GROUP BY 1),
       |sd(d, seed) AS (VALUES $seeds),
       |h0 AS (SELECT u.user_id, u.n, sd.d,
       |  (xor(u.user_id::HUGEINT, sd.seed::HUGEINT)
       |   + 11400714819323198485) % 18446744073709551616 AS z0
       |  FROM uc u CROSS JOIN sd),
       |h1 AS (SELECT *, xor(z0, z0 >> 30) AS z1 FROM h0),
       |h2 AS (SELECT *,
       |  ((z1 % 4294967296) * 13787848793156543929
       |   + ((z1 // 4294967296) * 13787848793156543929 % 4294967296)
       |     * 4294967296) % 18446744073709551616 AS z2 FROM h1),
       |h3 AS (SELECT *, xor(z2, z2 >> 27) AS z3 FROM h2),
       |h4 AS (SELECT *,
       |  ((z3 % 4294967296) * 10723151780598845931
       |   + ((z3 // 4294967296) * 10723151780598845931 % 4294967296)
       |     * 4294967296) % 18446744073709551616 AS z4 FROM h3),
       |hj AS (SELECT user_id, n, d,
       |  xor(z4, z4 >> 31) // 36028797018963968 AS j FROM h4),
       |cells AS (SELECT d, j, CAST(SUM(n) AS BIGINT) AS cell
       |  FROM hj GROUP BY 1, 2),
       |top AS (SELECT user_id, n AS exact_n FROM uc
       |  ORDER BY n DESC, user_id LIMIT 20)
       |SELECT t.user_id, t.exact_n, MIN(c.cell) AS cm_est,
       |  MIN(c.cell) - t.exact_n AS overcount
       |FROM top t
       |JOIN hj ON hj.user_id = t.user_id
       |JOIN cells c ON c.d = hj.d AND c.j = hj.j
       |GROUP BY 1, 2""".stripMargin
  }
}
