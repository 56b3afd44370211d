package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.names.NameNormalizer

/**
 * Property-based invariants (beyond the reference's test approach —
 * SURVEY §5 notes it has no property testing despite normalizer-shaped
 * candidates). Pure functions only: fast, no SparkSession. Deterministic
 * seeds so failures reproduce.
 */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val weird: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '-', '.', '!', 'É', 'ß', '字', '0', '9', '_')))
    .map(_.mkString)

  test("normalize is idempotent and yields valid snake_case identifiers") {
    samples(weird).foreach { s =>
      NameNormalizer.normalizeOpt(s).foreach { n =>
        assert(NameNormalizer.normalize(n) == n, s"not idempotent for: $s")
        assert(n.matches("[a-z0-9_]+"), s"bad charset for: $s -> $n")
        assert(!n.head.isDigit, s"leading digit for: $s -> $n")
      }
    }
  }

  test("word shingles: count and width invariants") {
    val words = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta")))
    samples(words).foreach { ws =>
      val text = ws.mkString(" ")
      val sh = graft.functions.TextHash.shingles(text, 3)
      if (ws.nonEmpty) assert(sh.length == math.max(ws.length - 2, 0))
      sh.foreach(s => assert(s.split(" ").length == 3))
    }
  }

  test("md5hex matches JDK MessageDigest for arbitrary strings") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val jdk = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(graft.functions.TextHash.md5hex(s) == jdk)
    }
  }

  test("protocol parser never throws on arbitrary input, parses valid records") {
    // fuzz: arbitrary strings, truncated JSON, wrong shapes → None, no throw
    val junk: Gen[String] = Gen.oneOf(
      weird,
      weird.map("{" + _),
      weird.map(s => s"""{"type":"$s"}"""),
      weird.map(s => s"""{"type":"RECORD","record":$s}"""),
      Gen.const("""{"type":"RECORD"}"""),
      Gen.const("""{"type":"RECORD","record":{}}"""))
    samples(junk, 400).foreach { s =>
      graft.protocol.AirbyteMessage.parse(s) // must not throw
    }
    val ok = graft.protocol.AirbyteMessage.parse(
      """{"type":"RECORD","record":{"stream":"s","data":{"a":1},"emitted_at":7}}""")
    assert(ok.exists(m => m.streamName.contains("s") && m.emittedAt.contains(7L)))
  }

  test("prefix filter (q114) is complete: every Jaccard-1/2 pair shares a prefix token") {
    // pure re-implementation of the q114 candidate rule over random
    // small set collections: rare-first (df, token) order, prefix
    // length |s|/2 + 1 — the AllPairs bound must never miss a pair
    // with 3·|a∩b| ≥ |a|+|b|
    val setsGen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 8).flatMap(k =>
        Gen.listOfN(k, Gen.choose('a', 'j').map(_.toString)).map(_.toSet))))
    samples(setsGen, 200).foreach { sets =>
      val dfm = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def prefix(s: Set[String]): Set[String] =
        s.toSeq.sortBy(t => (dfm(t), t)).take(s.size / 2 + 1).toSet
      for (i <- sets.indices; j <- i + 1 until sets.size) {
        val (a, b) = (sets(i), sets(j))
        val inter = (a & b).size
        if (3 * inter >= a.size + b.size)
          assert((prefix(a) & prefix(b)).nonEmpty,
            s"missed pair: $a vs $b (inter=$inter)")
      }
    }
  }

  test("image header parser never throws on arbitrary bytes, dims always positive") {
    import graft.operators.ImageHeaders
    val rawBytes = Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    // plain fuzz + adversarial prefixes: valid magic numbers followed by junk
    val magics = Seq(
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      "GIF89a".getBytes("US-ASCII"), "GIF87a".getBytes("US-ASCII"),
      Array(0xff, 0xd8).map(_.toByte), "BM".getBytes("US-ASCII"))
    samples(rawBytes, 400).zipWithIndex.foreach { case (tail, i) =>
      val candidates = tail.toArray +: magics.map(_ ++ tail.toArray)
      candidates.foreach { bytes =>
        ImageHeaders.parse(bytes).foreach { m => // must not throw, ever
          assert(m.width > 0 && m.height > 0, s"case $i: bad dims $m")
        }
      }
    }
    assert(ImageHeaders.parse(null).isEmpty)
  }

  test("skyline prefix-max reduction (q119) equals brute-force dominance") {
    val ptsGen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(1L, 10L), Gen.choose(1L, 10L))))
    samples(ptsGen, 300).foreach { pts =>
      val brute = pts.filter { case (t, u) =>
        !pts.exists { case (t2, u2) =>
          t2 <= t && u2 >= u && (t2 < t || u2 > u) }
      }.toSet
      val byT = pts.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val sortedT = byT.keys.toSeq.sorted
      val pref = sortedT.zip(sortedT.scanLeft(Long.MinValue) {
        case (acc, t) => math.max(acc, byT(t)) }).toMap // strict prefix max
      val reduced = pts.filter { case (t, u) =>
        u == byT(t) && u > pref(t) }.toSet
      assert(reduced == brute, s"mismatch on $pts")
    }
  }

  test("Misra-Gries per-partition union is a superset of global heavy hitters for any partitioning") {
    // the exactness guarantee HeavyHitters.frequentTokens rests on:
    // count(w)*denom > n  ⇒  w survives MG(denom-1) in ≥1 partition
    val gen = for {
      denom <- Gen.choose(2, 12)
      toks <- Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
      nParts <- Gen.choose(1, 5)
      cutsSeed <- Gen.choose(0L, Long.MaxValue)
    } yield (denom, toks, nParts, cutsSeed)
    samples(gen, 400).foreach { case (denom, toks, nParts, cutsSeed) =>
      val rnd = new scala.util.Random(cutsSeed)
      // arbitrary contiguous partitioning (incl. empty partitions)
      val parts = Array.fill(nParts)(
        scala.collection.mutable.ArrayBuffer.empty[String])
      toks.foreach(t => parts(rnd.nextInt(nParts)) += t)
      val candidates = parts.flatMap(p =>
        graft.operators.HeavyHitters.misraGries(p.iterator, denom - 1)).toSet
      val n = toks.size.toLong
      val heavy = toks.groupBy(identity)
        .collect { case (w, ws) if ws.size.toLong * denom > n => w }.toSet
      assert(heavy.subsetOf(candidates),
        s"missed ${heavy -- candidates} (denom=$denom, n=$n, parts=$nParts)")
    }
  }
}
