package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML → text extraction: the boilerplate-stripping stage every web
 * corpus runs before any text analysis (the jusText/trafilatura
 * family's first step). ONE pass over the markup with an explicit
 * state machine — not a regex chain, which mis-handles `<` inside
 * script bodies unless scripts are elided first (exactly the trap the
 * q175 oracle's carefully-ordered regex chain has to step around):
 *
 *  - `<script…>…</script>` and `<style…>…</style>` elided whole
 *    (case-insensitive), including any `<`/`>` in their bodies;
 *  - `<!-- … -->` comments elided;
 *  - all other tags dropped (text inside kept);
 *  - entities decoded: the five predefined XML entities plus GENERIC
 *    numeric forms `&#123;` / `&#x1F;`; an unknown NAMED entity keeps
 *    its literal `&` (never swallowed), while a numeric reference to a
 *    surrogate / U+0000 / past U+10FFFF emits U+FFFD per WHATWG
 *    character-reference error recovery.
 *
 * Unterminated constructs run to end-of-input (a truncated crawl page
 * yields the text before the break, never an exception).
 */
case class HtmlTextExtractExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(HtmlText.extract(input.toString))

  /** Real codegen (round 16, static-invoke pattern): the state machine
    * runs as one static call inside the enclosing whole-stage span. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HtmlText.extract($c.toString()))")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "html_text"
}

private[graft] object HtmlText {

  def extract(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (regionMatchesIgnoreCase(s, i, "<script")) {
          i = skipElement(s, i, "</script")
        } else if (regionMatchesIgnoreCase(s, i, "<style")) {
          i = skipElement(s, i, "</style")
        } else {
          val end = s.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // cap 12: the longest reference we decode is a numeric form like
        // &#xFFFFFFFF; (whose overflow must still reach the WHATWG
        // U+FFFD recovery, not fall off the scanner)
        val decoded =
          if (semi > i && semi - i <= 12) decodeEntity(s.substring(i + 1, semi))
          else None
        decoded match {
          case Some(t) => out.append(t); i = semi + 1
          case None => out.append('&'); i += 1
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Past the matching close tag (case-insensitive), or end-of-input. */
  private def skipElement(s: String, from: Int, close: String): Int = {
    var i = from + 1
    while (i < s.length) {
      if (s.charAt(i) == '<' && regionMatchesIgnoreCase(s, i, close)) {
        val gt = s.indexOf('>', i)
        return if (gt < 0) s.length else gt + 1
      }
      i += 1
    }
    s.length
  }

  private def regionMatchesIgnoreCase(s: String, off: Int, pat: String): Boolean =
    s.regionMatches(true, off, pat, 0, pat.length)

  private def decodeEntity(name: String): Option[String] = name match {
    case "amp" => Some("&")
    case "lt" => Some("<")
    case "gt" => Some(">")
    case "quot" => Some("\"")
    case "apos" => Some("'")
    case _ if name.startsWith("#x") || name.startsWith("#X") =>
      numeric(name.substring(2), 16)
    case _ if name.startsWith("#") => numeric(name.substring(1), 10)
    case _ => None
  }

  private def numeric(digits: String, radix: Int): Option[String] =
    try {
      if (digits.isEmpty) None
      // WHATWG treats a sign as "no digits": '&#+65;' / '&#-17;' are NOT
      // numeric references — fall through to literal text. (parseInt
      // would otherwise accept the sign and decode/emit U+FFFD.)
      else if (digits.exists(d => Character.digit(d, radix) < 0)) None
      else {
        val cp = Integer.parseInt(digits, radix)
        // WHATWG "character reference code" error recovery (HTML spec
        // §13.2.5.80): a numeric reference to a surrogate (U+D800..
        // U+DFFF), to U+0000, or past U+10FFFF is a parse error whose
        // recovery EMITS U+FFFD — the reference consumes either way.
        // (We deliberately skip the spec's legacy windows-1252 remap of
        // C1 controls 0x80..0x9F: a data-cleaning kernel preserves the
        // author's actual code point rather than simulating legacy
        // browser charset sniffing.)
        if (cp == 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff))
          Some("�")
        else if (cp < 0) Some("�") // > Int range wrapped negative
        else Some(new String(Character.toChars(cp)))
      }
    } catch {
      case _: NumberFormatException if digits.forall(d =>
          Character.digit(d, radix) >= 0) =>
        Some("�") // all-valid digits that overflow Int: out of range
      case _: Exception => None
    }
}

object HtmlFunctions {
  import org.apache.spark.sql.GraftBridge

  def htmlText(html: Column): Column =
    GraftBridge.column(HtmlTextExtractExpression(GraftBridge.expression(html)))
}
