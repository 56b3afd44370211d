package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode canonicalization kernels — the first stage of text curation
 * (Unicode-normalize BEFORE hashing/dedup, or visually-identical texts
 * land in different dedup classes). Per-row compiled expressions over
 * the JDK's `java.text.Normalizer` (the standard UAX#15 implementation
 * the JVM ships — no library): NFC/NFKC normalization plus removal of
 * the zero-width characters that defeat fingerprinting (ZWSP/ZWNJ/ZWJ
 * U+200B-D, BOM/ZWNBSP U+FEFF).
 *
 * The DuckDB oracle gates NFC exactly (`nfc_normalize` is utf8proc's
 * UAX#15 — same algorithm, independent implementation); NFKC has no
 * DuckDB twin and is spec-gated (UnicodeNormSpec) instead.
 */
case class UnicodeNormalizeExpression(child: Expression, form: String,
    stripZeroWidth: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpression.compute(input.toString, form, stripZeroWidth)

  /** Real codegen (round 16, static-invoke pattern): the form and
    * strip flag inline as literals, so the normalize call stays inside
    * the enclosing whole-stage span. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalizeExpression.compute($c.toString(), "$form", $stripZeroWidth)""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"unicode_${form.toLowerCase(java.util.Locale.ROOT)}"
}

object UnicodeNormalizeExpression {

  /** Shared by the interpreted eval and the generated code (parity by
    * construction). `Form.valueOf` is an enum map lookup \u2014 negligible
    * next to the normalize pass itself. */
  def compute(s: String, form: String, stripZeroWidth: Boolean): UTF8String = {
    val normalized =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form))
    val out =
      if (!stripZeroWidth) normalized
      else {
        val sb = new java.lang.StringBuilder(normalized.length)
        var i = 0
        while (i < normalized.length) {
          val c = normalized.charAt(i)
          if (c != '\u200B' && c != '\u200C' && c != '\u200D' && c != '\uFEFF')
            sb.append(c)
          i += 1
        }
        sb.toString
      }
    UTF8String.fromString(out)
  }
}

object UnicodeFunctions {
  import org.apache.spark.sql.GraftBridge

  def nfcNormalize(text: Column, stripZeroWidth: Boolean = false): Column =
    GraftBridge.column(UnicodeNormalizeExpression(
      GraftBridge.expression(text), "NFC", stripZeroWidth))

  def nfkcNormalize(text: Column, stripZeroWidth: Boolean = false): Column =
    GraftBridge.column(UnicodeNormalizeExpression(
      GraftBridge.expression(text), "NFKC", stripZeroWidth))
}
