package graft.names

import java.util.Locale

/**
 * ULID generation (public spec: 26-char Crockford base32 — 48-bit
 * millisecond timestamp + 80-bit randomness) with the spec's monotonic
 * same-millisecond behavior: a second ULID in the same millisecond is
 * the previous one's randomness incremented by 1, so ULIDs from one
 * process always sort in generation order.
 *
 * Reference surface: `airbyte/_util/text_util.py:9-22`
 * (`generate_ulid` / `generate_random_suffix`) and
 * `airbyte/shared/sql_processor.py:592-612` (`_get_temp_table_name`):
 * temp-table and log-file names carry a compact, time-sortable 9-char
 * slice of a ULID rather than a bare random string, so concurrent
 * artifacts list in creation order.
 */
object Ulid {

  private val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** Injectable clock/randomness so specs can pin time and entropy. */
  @volatile private[graft] var clock: () => Long = () => System.currentTimeMillis()
  @volatile private[graft] var randomBits80: () => BigInt = {
    val rng = new java.security.SecureRandom()
    () => BigInt(80, rng)
  }

  private[this] var lastMs = -1L
  private[this] var lastRand = BigInt(0)

  /** Next ULID (26 chars, uppercase Crockford base32). Monotonic within
    * a process: same-millisecond calls increment the randomness. */
  def generate(): String = synchronized {
    val now = clock()
    if (now == lastMs) lastRand += 1 // spec's monotonic variant
    else { lastMs = now; lastRand = randomBits80() }
    encode((BigInt(now) << 80) | (lastRand & ((BigInt(1) << 80) - 1)))
  }

  private def encode(v: BigInt): String = {
    val buf = new Array[Char](26)
    var i = 25
    var x = v
    while (i >= 0) {
      buf(i) = Alphabet((x & 31).toInt)
      x >>= 5
      i -= 1
    }
    new String(buf)
  }

  /**
   * 9-char temp-name suffix: lowercase ULID first 6 + last 3 chars
   * (`text_util.py:14-22`). The leading 6 chars carry the top 28 bits
   * of the timestamp (the 130-bit char grid pads 2 zero bits), so
   * suffixes are time-sortable at ~17-minute granularity;
   * within one process the monotonic increment keeps same-window
   * suffixes in generation order (until the 15-bit tail wraps — the
   * reference makes the same "sufficient, not guaranteed" trade).
   */
  def randomSuffix(): String = {
    val u = generate().toLowerCase(Locale.ROOT)
    u.substring(0, 6) + u.substring(23)
  }

  /** 9-char log-file suffix: ULID chars [2, 11) (`logs.py:159` —
    * `str(ulid.ULID())[2:11]`). */
  def logfileSuffix(): String = generate().substring(2, 11)

  /** Reference `_get_temp_table_name` (`sql_processor.py:592-612`):
    * `<stream>_<9-char suffix>`, batch-id–pinned when one is supplied. */
  def tempTableName(streamName: String, batchId: Option[String] = None): String = {
    val suffix = batchId match {
      case Some(b) if b.length > 9 =>
        (b.substring(0, 6) + b.substring(b.length - 3)).toLowerCase(Locale.ROOT)
      case Some(b) => b.toLowerCase(Locale.ROOT)
      case None => randomSuffix()
    }
    NameNormalizer.normalize(s"${streamName}_$suffix")
  }

  /** Reset generator state (specs that pin the clock call this first). */
  private[graft] def reset(): Unit = synchronized {
    lastMs = -1L
    lastRand = BigInt(0)
  }
}
