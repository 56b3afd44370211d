package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PdfHeaders, ZipHeaders}

/**
 * PDF and ZIP container contracts — the real parse paths behind
 * q213/q214. Beyond the DuckDB oracle gates, these pin what the
 * oracles cannot see: exact metadata round-trips, the xref offset /
 * local-header offset validation paths, CRC-32 corruption detection
 * on actual bytes, honest rejection of malformed payloads, and
 * never-throws fuzz sweeps.
 */
class PdfZipHeadersSpec extends AnyFunSuite {

  // ---- PDF ----

  test("pdf build→parse round-trips version, pages, box, title, offsets") {
    for ((v, p, w, h) <- Seq(("1.4", 1, 612, 792), ("1.7", 5, 595, 842),
        ("1.3", 100, 420, 595))) {
      val bytes = PdfHeaders.buildPdf(v, p, w, h, s"t-$p")
      val m = PdfHeaders.parse(bytes).getOrElse(fail(s"parse failed p=$p"))
      assert(m.version == v && m.nPages == p && m.title == s"t-$p")
      assert(m.boxWidth == w && m.boxHeight == h)
      assert(m.nObjects == p + 3 && m.offsetsValid)
    }
  }

  test("pdf: a corrupted xref offset is reported, not trusted") {
    val bytes = PdfHeaders.buildPdf("1.7", 2, 612, 792, "x")
    val s = new String(bytes, "ISO-8859-1")
    val xref = s.indexOf("xref")
    // overwrite object 1's offset (first real entry after the free head)
    val entry = s.indexOf('\n', s.indexOf('\n', xref) + 1) + 1 + 20
    val broken = bytes.clone()
    "0000000007".getBytes.copyToArray(broken, entry)
    val m = PdfHeaders.parse(broken).get
    assert(!m.offsetsValid, "a mispointed xref entry must flag offsetsValid")
  }

  test("pdf: malformed payloads parse to None, never throw") {
    val good = PdfHeaders.buildPdf("1.7", 2, 612, 792, "x")
    assert(PdfHeaders.parse(null).isEmpty)
    assert(PdfHeaders.parse("%PDF-1.7\nnot really".getBytes).isEmpty)
    assert(PdfHeaders.parse("hello world, long enough to pass the length gate"
      .getBytes).isEmpty)
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      PdfHeaders.parse(good.take(rnd.nextInt(good.length)))
      val a = new Array[Byte](rnd.nextInt(128)); rnd.nextBytes(a)
      PdfHeaders.parse(a)
    }
  }

  test("pdf build rejects unrepresentable params") {
    intercept[IllegalArgumentException](PdfHeaders.buildPdf("2.0", 1, 612, 792, "x"))
    intercept[IllegalArgumentException](PdfHeaders.buildPdf("1.7", 0, 612, 792, "x"))
    intercept[IllegalArgumentException](PdfHeaders.buildPdf("1.7", 1, 612, 792, "a(b"))
  }

  // ---- ZIP ----

  private def payload(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i) & 0xFF).toByte)

  test("zip build→parse round-trips entries, sizes, names; CRC clean") {
    val entries = Seq("a.txt" -> payload(10, 1), "b/c.json" -> payload(0, 2),
      "d.bin" -> payload(300, 3))
    val m = ZipHeaders.parse(ZipHeaders.buildZip(entries)).get
    assert(m.nEntries == 3 && m.totalBytes == 310L)
    assert(m.crcMismatches == 0 && m.offsetsValid)
    assert(m.names == Seq("a.txt", "b/c.json", "d.bin"))
  }

  test("zip: one flipped payload byte is caught by the CRC audit") {
    val bytes = ZipHeaders.buildZip(Seq("a.txt" -> payload(50, 9)))
    val broken = bytes.clone()
    broken(30 + 5 + 10) = (broken(30 + 5 + 10) ^ 0x1).toByte
    val m = ZipHeaders.parse(broken).get
    assert(m.crcMismatches == 1, "a corrupted stored byte must fail its CRC")
  }

  test("zip: trailing comment, truncations, and fuzz never throw") {
    val good = ZipHeaders.buildZip(Seq("a" -> payload(20, 4)))
    val withComment = good ++ "shard comment".getBytes
    // EOCD declares comment len 0 but the backward scan still finds it
    assert(ZipHeaders.parse(withComment).exists(_.nEntries == 1))
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      ZipHeaders.parse(good.take(rnd.nextInt(good.length)))
      val a = new Array[Byte](rnd.nextInt(96)); rnd.nextBytes(a)
      ZipHeaders.parse(a)
    }
    assert(ZipHeaders.parse(Array.emptyByteArray).isEmpty)
  }
}
