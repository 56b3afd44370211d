package graft.operators

import java.nio.charset.StandardCharsets

/**
 * Minimal PDF 1.x metadata codec — the document container every
 * text-extraction pipeline triages BEFORE rendering: version, object
 * count, page count, media box, and Info-dictionary title come from
 * the xref table and two dictionaries, no content-stream decoding.
 * Build side writes a structurally valid classic-xref PDF (catalog →
 * pages → page objects + Info, byte-exact xref offsets, trailer,
 * startxref); parse side finds `startxref` from the end, walks the
 * real xref table, validates every object offset actually points at
 * its `i 0 obj` header, and reads /Count and /Title from the
 * dictionaries — malformed input yields None, never an exception and
 * never fabricated metadata. Public ISO 32000 layout; completes the
 * per-format family in [[ImageHeaders]]/[[TiffHeaders]]/
 * [[WebpHeaders]]/[[Mp4Headers]]/[[AudioHeaders]].
 *
 * Scale shape: like every codec here, build→parse runs as per-row
 * kernels inside the scan partitions; only the tally's grouped rows
 * ever cross an exchange.
 */
object PdfHeaders {

  final case class PdfMeta(
      version: String, // "1.4" | "1.7" | ...
      nObjects: Int, // xref entry count minus the free head
      nPages: Int,
      boxWidth: Int,
      boxHeight: Int,
      title: String,
      offsetsValid: Boolean) // every xref offset hits "i 0 obj"

  /** Build a minimal valid PDF: catalog, pages node, `nPages` page
    * objects sharing one media box, and an Info dictionary. */
  def buildPdf(version: String, nPages: Int, boxWidth: Int, boxHeight: Int,
      title: String): Array[Byte] = {
    require(nPages >= 1 && nPages <= 1000 && boxWidth > 0 && boxHeight > 0
        && version.matches("1\\.[0-9]")
        && title.forall(c => c >= ' ' && c != '(' && c != ')' && c != '\\'),
      s"invalid pdf params: v=$version pages=$nPages box=${boxWidth}x$boxHeight")
    val sb = new java.lang.StringBuilder()
    val offsets = Array.newBuilder[Int]
    sb.append(s"%PDF-$version\n")
    def obj(body: String): Unit = {
      offsets += sb.length()
      sb.append(body).append("\n")
    }
    val kids = (0 until nPages).map(j => s"${3 + j} 0 R").mkString(" ")
    obj("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    obj(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj")
    (0 until nPages).foreach { j =>
      obj(s"${3 + j} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $boxWidth $boxHeight] >> endobj")
    }
    val infoId = 3 + nPages
    obj(s"$infoId 0 obj << /Producer (graft) /Title ($title) >> endobj")
    val n = infoId + 1 // xref size including the free head
    val xrefOff = sb.length()
    sb.append("xref\n").append(s"0 $n\n")
    sb.append("0000000000 65535 f \n")
    offsets.result().foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append("trailer << /Size " + n + " /Root 1 0 R /Info " + infoId +
      " 0 R >>\n")
    sb.append("startxref\n").append(xrefOff).append("\n%%EOF\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Parse PDF metadata; None for anything that is not a well-formed
    * classic-xref file (honest failure, no fabrication). */
  def parse(bytes: Array[Byte]): Option[PdfMeta] = {
    if (bytes == null || bytes.length < 40) return None
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) return None
    val nl = s.indexOf('\n')
    if (nl < 0) return None // '%PDF-' header with no newline: malformed
    val version = s.substring(5, nl).trim
    if (!version.matches("1\\.[0-9]")) return None
    val sx = s.lastIndexOf("startxref")
    if (sx < 0) return None
    val xrefOff =
      try s.substring(sx + 9, s.indexOf("%%EOF", sx)).trim.toInt
      catch { case _: Exception => return None }
    if (xrefOff < 0 || xrefOff >= s.length || !s.startsWith("xref", xrefOff))
      return None
    // subsection header "0 n", then n 20-byte entries
    val hdrEnd = s.indexOf('\n', xrefOff)
    val subEnd = s.indexOf('\n', hdrEnd + 1)
    val Array(first, count) =
      try s.substring(hdrEnd + 1, subEnd).trim.split(" ").map(_.toInt)
      catch { case _: Exception => return None }
    if (first != 0 || count < 2) return None
    var offsetsValid = true
    var i = 1 // skip the free head
    while (i < count) {
      val e = subEnd + 1 + i * 20
      if (e + 20 > s.length) return None
      val off =
        try s.substring(e, e + 10).toInt
        catch { case _: Exception => return None }
      if (!s.startsWith(s"$i 0 obj", off)) offsetsValid = false
      i += 1
    }
    def dict(objId: Int): Option[String] = {
      val start = s.indexOf(s"$objId 0 obj")
      if (start < 0) None
      else {
        val end = s.indexOf("endobj", start)
        if (end < 0) None else Some(s.substring(start, end))
      }
    }
    def find(rx: scala.util.matching.Regex, in: String): Option[String] =
      rx.findFirstMatchIn(in).map(_.group(1))
    val trailer = {
      val t = s.lastIndexOf("trailer")
      if (t < 0) return None
      s.substring(t, sx)
    }
    val rootId = find("/Root (\\d+) 0 R".r, trailer)
      .getOrElse(return None).toInt
    val pagesId = dict(rootId).flatMap(find("/Pages (\\d+) 0 R".r, _))
      .getOrElse(return None).toInt
    val pagesDict = dict(pagesId).getOrElse(return None)
    val nPages = find("/Count (\\d+)".r, pagesDict)
      .getOrElse(return None).toInt
    val firstKid = find("/Kids \\[(\\d+) 0 R".r, pagesDict)
      .getOrElse(return None).toInt
    val pageDict = dict(firstKid).getOrElse(return None)
    val box = "/MediaBox \\[0 0 (\\d+) (\\d+)\\]".r.findFirstMatchIn(pageDict)
      .getOrElse(return None)
    val title = find("/Info (\\d+) 0 R".r, trailer)
      .flatMap(id => dict(id.toInt))
      .flatMap(find("/Title \\(([^)]*)\\)".r, _))
      .getOrElse("")
    Some(PdfMeta(version, count - 1, nPages,
      box.group(1).toInt, box.group(2).toInt, title, offsetsValid))
  }
}
