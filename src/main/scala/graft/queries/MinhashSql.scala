package graft.queries

/**
 * DuckDB-side replay of the seeded-splitmix64 MinHash signature family
 * (the Spark kernel is `ShingleMinhashExpression.compute`). Component j
 * of a document's signature is
 *
 *   min over shingles s of  splitmix64( h64(s) XOR j·GOLDEN )
 *
 * where `h64(s)` is the first 16 hex chars of md5(s) read as an
 * unsigned 64-bit integer (= the digest's first 8 bytes, big-endian)
 * and splitmix64 is the frozen finalizer both engines already share
 * (`HllAggregate.mix64`, replayed in exact HUGEINT arithmetic by the
 * q196/q200 oracles). Components are rendered as 20-char zero-padded
 * unsigned decimals so the signature stays `list<varchar>` and
 * lexicographic order equals numeric order — band keys, slicing and
 * every downstream consumer are unchanged from the retired rotation
 * family.
 *
 * Why seeded mixes and not rotations of one digest: q260's round-15
 * calibration measured the rotation family correlated mid-range
 * (est=2..4 bins carried true J ≈ 0.01–0.03 instead of ≈ est/9), which
 * invalidated the 1−(1−s^r)^b recall math every banding claim rests
 * on. k independent seeded permutations restore the independence the
 * math assumes; the estimator-vs-truth fit is re-pinned by q260 and
 * BandedRecallSpec.
 *
 * The replay is RELATIONAL (a CTE chain over DISTINCT shingles, the
 * q196 device) rather than a lambda: DuckDB does not CSE inside lambda
 * expressions, so a nested 5-step mix would recompute its inner
 * subtrees ~32×, and hashing per distinct shingle instead of per
 * (doc, shingle) dedups repeated shingles corpus-wide. All generated
 * SQL is pure integer arithmetic on HUGEINT, exact in both engines.
 */
object MinhashSql {

  /** 2^64 as a decimal literal (DuckDB parses it as HUGEINT). */
  private val M64 = "18446744073709551616"

  /** The three splitmix64 constants, unsigned decimal. */
  private val Golden = java.lang.Long.toUnsignedString(0x9E3779B97F4A7C15L)
  private val C1 = java.lang.Long.toUnsignedString(0xBF58476D1CE4E5B9L)
  private val C2 = java.lang.Long.toUnsignedString(0x94D049BB133111EBL)

  /** Seed for component j — j·GOLDEN wrapped mod 2^64, matching the
    * repo-wide seeded-draw convention (StreamingBloom, BloomExpressions)
    * and the Spark kernel. */
  def seed(j: Int): Long = j.toLong * 0x9E3779B97F4A7C15L

  /** z·c mod 2^64 with both operands < 2^64: split z into 32-bit halves
    * so the 128-bit HUGEINT never overflows (the q196 device). */
  private def mulSplit(z: String, c: String): String =
    s"((($z) % 4294967296) * $c" +
      s" + ((($z) // 4294967296) * $c % 4294967296) * 4294967296) % $M64"

  /** Recenter an unsigned HUGEINT < 2^64 into signed BIGINT range —
    * the oracle twin of reading the same 64 bits as a Java long, so
    * "smallest k" (KMV, q266) agrees across engines. */
  def signedOf(v: String): String =
    s"CAST(CASE WHEN ($v) >= 9223372036854775808 THEN ($v) - $M64" +
      s" ELSE ($v) END AS BIGINT)"

  /** h64: the md5 hex column `h`'s first 16 nibbles folded to an
    * unsigned 64-bit HUGEINT (column reference is cheap — referencing
    * it 16 times costs nothing relationally). */
  def hex64Of(h: String): String =
    (0 until 16).map { p =>
      val mult = java.math.BigInteger.valueOf(16).pow(15 - p)
      s"(strpos('0123456789abcdef', substr($h, ${p + 1}, 1)) - 1)::HUGEINT * $mult"
    }.mkString("(", " + ", ")")

  /**
   * The signature pipeline as a comma-terminated run of CTEs, ready to
   * splice into a WITH list. Input: a CTE `src` with columns
   * `($idCol, shingles)`, shingles a non-empty `list<varchar>`.
   * Output: a CTE named `sig` with `($idCol, shingles, sig)` where
   * `sig` is the k-component signature (`list<varchar>`, each element
   * a 20-char zero-padded unsigned decimal).
   *
   * Hashing runs once per DISTINCT shingle corpus-wide; the splitmix64
   * finalizer is the explicit z0..z4 relational chain the q196 oracle
   * established, fanned out over the k seeds.
   */
  def sigCtes(src: String, idCol: String, k: Int = 9): String = {
    val seeds = (0 until k)
      .map(j => s"($j, ${java.lang.Long.toUnsignedString(seed(j))})")
      .mkString(", ")
    s"""__mh_x AS (SELECT $idCol AS __id, unnest(shingles) AS __s FROM $src),
       |__mh_h AS (
       |  SELECT __s, ${hex64Of("md5(__s)")} AS v
       |  FROM (SELECT DISTINCT __s FROM __mh_x)),
       |__mh_sd(j, seed) AS (VALUES $seeds),
       |__mh_z0 AS (SELECT __s, j, (xor(v, seed) + $Golden) % $M64 AS z
       |  FROM __mh_h CROSS JOIN __mh_sd),
       |__mh_z1 AS (SELECT __s, j, xor(z, z >> 30) AS z FROM __mh_z0),
       |__mh_z2 AS (SELECT __s, j, ${mulSplit("z", C1)} AS z FROM __mh_z1),
       |__mh_z3 AS (SELECT __s, j, xor(z, z >> 27) AS z FROM __mh_z2),
       |__mh_z4 AS (SELECT __s, j, ${mulSplit("z", C2)} AS z FROM __mh_z3),
       |__mh_m AS (SELECT __s, j, xor(z, z >> 31) AS m FROM __mh_z4),
       |__mh_c AS (
       |  SELECT x.__id, m.j, lpad(CAST(MIN(m.m) AS VARCHAR), 20, '0') AS c
       |  FROM __mh_x x JOIN __mh_m m ON m.__s = x.__s
       |  GROUP BY x.__id, m.j),
       |sig AS MATERIALIZED (
       |  SELECT s.$idCol, s.shingles, g.sig
       |  FROM $src s JOIN (
       |    SELECT __id, list(c ORDER BY j) AS sig FROM __mh_c GROUP BY __id
       |  ) g ON g.__id = s.$idCol),""".stripMargin
  }
}
