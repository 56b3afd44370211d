package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TarArchive
import graft.operators.TarArchive.Entry

/**
 * ustar container + Unicode kernel contracts beyond what the q169/q171
 * oracles can see: exact archive round-trips, the published size
 * arithmetic, honest rejection of corrupted archives, and the NFKC
 * compatibility foldings that have no DuckDB twin.
 */
class TarUnicodeSpec extends AnyFunSuite {

  private def entries(n: Int): Seq[Entry] =
    (0 until n).map(i => Entry(s"doc_$i.txt",
      ("payload-" * (i + 1) + i.toString).getBytes("UTF-8")))

  test("tar round-trip preserves names, order, and exact bytes") {
    val in = entries(5) :+ Entry("empty.bin", Array.emptyByteArray)
    val out = TarArchive.read(TarArchive.write(in))
    assert(out.isDefined)
    assert(out.get.map(_.name) == in.map(_.name))
    in.zip(out.get).foreach { case (a, b) =>
      assert(a.data.sameElements(b.data), a.name)
    }
  }

  test("archive size follows the ustar arithmetic exactly") {
    val in = entries(4)
    val tar = TarArchive.write(in)
    val expected = in.map(e => 512 + ((e.data.length + 511) / 512) * 512).sum + 1024
    assert(tar.length == expected)
  }

  test("writes are deterministic: same entries, identical bytes") {
    assert(TarArchive.write(entries(3)).sameElements(TarArchive.write(entries(3))))
  }

  test("corrupted archives are rejected, never partially parsed") {
    val tar = TarArchive.write(entries(2))
    assert(TarArchive.read(null).isEmpty)
    assert(TarArchive.read(tar.take(700)).isEmpty)            // not block-aligned
    assert(TarArchive.read(tar.take(1024)).isEmpty)           // missing trailer
    val badCk = tar.clone(); badCk(150) = '9'                 // checksum field
    assert(TarArchive.read(badCk).isEmpty)
    val badMagic = tar.clone(); badMagic(257) = 'X'
    assert(TarArchive.read(badMagic).isEmpty)
    val flipped = tar.clone(); flipped(30) = 'z'              // name byte → checksum breaks
    assert(TarArchive.read(flipped).isEmpty)
  }

  test("foreign typeflags and prefix-split names are rejected, not misread") {
    // mutating header bytes breaks the checksum, so re-seal it to
    // isolate the typeflag/prefix checks themselves
    def reseal(b: Array[Byte]): Array[Byte] = {
      java.util.Arrays.fill(b, 148, 156, ' '.toByte)
      var sum = 0L
      (0 until 512).foreach(i => sum += (b(i) & 0xff))
      val s = "%06o".format(sum).getBytes("US-ASCII")
      System.arraycopy(s, 0, b, 148, 6); b(154) = 0; b(155) = ' '
      b
    }
    val tar = TarArchive.write(entries(2))
    assert(TarArchive.read(tar).nonEmpty) // sanity: well-formed baseline
    val dir = tar.clone(); dir(156) = '5' // directory entry
    assert(TarArchive.read(reseal(dir)).isEmpty)
    val link = tar.clone(); link(156) = '2' // symlink entry
    assert(TarArchive.read(reseal(link)).isEmpty)
    val pfx = tar.clone(); pfx(345) = 'p' // prefix-split long name
    assert(TarArchive.read(reseal(pfx)).isEmpty)
  }

  test("NFKC folds compatibility forms the NFC oracle path cannot") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.UnicodeNormalizeExpression
    def nfkc(s: String): String =
      UnicodeNormalizeExpression(Literal(s), "NFKC", stripZeroWidth = true)
        .eval(null).toString
    assert(nfkc("ﬁle") == "file")        // ﬁ ligature → fi
    assert(nfkc("x²") == "x2")           // superscript two → 2
    assert(nfkc("ａbc") == "abc")         // fullwidth a → a
    assert(nfkc("e\u0301") == "é")       // composition still applies
    assert(nfkc("a\u200Bb\uFEFFc") == "abc")  // zero-width scrub
    // idempotence: normalize twice = normalize once
    val s = "Cafe\u0301 ﬁne x²\u200B"
    assert(nfkc(nfkc(s)) == nfkc(s))
  }
}
