package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val normalized = java.text.Normalizer.normalize(input.toString, nf)
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

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"unicode_${form.toLowerCase(java.util.Locale.ROOT)}"
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
