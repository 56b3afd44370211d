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
    val regs = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        HllAggregate.hllRegisters(col("user_id"), 10).as("regs"),
        countDistinct(col("user_id")).as("exact_users"))
    val perReg = regs.select(
      col("event_type"), col("exact_users"),
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
}
