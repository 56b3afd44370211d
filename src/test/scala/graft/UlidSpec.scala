package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.names.Ulid

/** ULID generation and the reference's 9-char time-sortable suffixes
  * (`_util/text_util.py:9-22`, `sql_processor.py:592-612`). */
class UlidSpec extends AnyFunSuite {

  /** Pin clock + entropy, reset generator state, restore in finally. */
  private def withPinned[T](ms: () => Long, rand: () => BigInt)(body: => T): T = {
    val (pc, pr) = (Ulid.clock, Ulid.randomBits80)
    Ulid.clock = ms
    Ulid.randomBits80 = rand
    Ulid.reset()
    try body finally {
      Ulid.clock = pc
      Ulid.randomBits80 = pr
      Ulid.reset()
    }
  }

  test("shape: 26 Crockford chars, timestamp decodes back") {
    val t = 1700000000123L
    withPinned(() => t, () => BigInt(42)) {
      val u = Ulid.generate()
      assert(u.length == 26)
      assert(u.forall("0123456789ABCDEFGHJKMNPQRSTVWXYZ".contains(_)))
      // decode the 10 leading chars back to the 48-bit ms timestamp
      val decoded = u.take(10).foldLeft(0L)((acc, c) =>
        acc * 32 + "0123456789ABCDEFGHJKMNPQRSTVWXYZ".indexOf(c))
      assert(decoded == t)
    }
  }

  test("monotonic: same-ms calls increment, so ULIDs sort in generation order") {
    var now = 1700000000000L
    withPinned(() => now, () => BigInt(7)) {
      val sameMs = Seq.fill(100)(Ulid.generate())
      assert(sameMs == sameMs.sorted, "same-millisecond ULIDs out of order")
      assert(sameMs.distinct.size == 100)
      val before = Ulid.generate()
      now += 5
      val after = Ulid.generate()
      assert(before < after, "time advance must sort later")
    }
  }

  test("randomSuffix: 9 chars, lowercase, time-sortable across calls") {
    var now = 1700000000000L
    withPinned(() => now, () => BigInt(3)) {
      // within one millisecond: monotonic increment keeps suffixes sorted
      val burst = Seq.fill(50)(Ulid.randomSuffix())
      burst.foreach { s =>
        assert(s.length == 9 && s == s.toLowerCase(java.util.Locale.ROOT))
      }
      assert(burst == burst.sorted, "same-ms suffixes out of order")
      assert(burst.distinct.size == 50)
      // coarse time advance: the 130-bit char grid pads 2 zero bits, so
      // the first 6 suffix chars carry the TOP 28 timestamp bits — a
      // 2^20 ms (~17.5 min) window. Jumping past it sorts strictly
      // later even against fresh randomness.
      now += (1L << 21)
      val later = Ulid.randomSuffix()
      assert(burst.forall(_ < later), "later window must sort after")
    }
  }

  test("tempTableName: stream + 9-char suffix, batch-id pinning, normalized") {
    withPinned(() => 1700000000000L, () => BigInt(9)) {
      val t1 = Ulid.tempTableName("users")
      assert(t1.startsWith("users_") && t1.length == "users_".length + 9)
      // a >9-char batch id collapses to first-6 + last-3, lowercased
      val t2 = Ulid.tempTableName("users", Some("01HXYZABCDEFGHJKMNPQRSTVWX"))
      assert(t2 == "users_01hxyzvwx")
      // a short batch id passes through
      assert(Ulid.tempTableName("users", Some("b1")) == "users_b1")
      // name goes through the normalizer (spaces → underscores, etc.)
      assert(Ulid.tempTableName("My Stream", Some("b1")) == "my_stream_b1")
    }
  }

  test("logfileSuffix: 9 chars from ULID positions [2,11)") {
    withPinned(() => 1700000000123L, () => BigInt(1)) {
      val s = Ulid.logfileSuffix()
      assert(s.length == 9)
      Ulid.reset()
      val full = Ulid.generate()
      assert(full.substring(2, 11) == s)
    }
  }
}
