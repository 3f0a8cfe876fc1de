package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup/matching. */
object NormalizeUtil {

  /** The canonicalization pipeline, in the standard order:
    *   1. Unicode NFKD — compatibility decomposition (fullwidth forms,
    *      ligatures, superscripts fold to their plain letters, accents
    *      split from their base letters),
    *   2. drop combining marks (the accents just split off),
    *   3. lowercase in Locale.ROOT (locale-independent — never the
    *      default locale: Turkish dotless-i would make normalization
    *      machine-dependent),
    *   4. collapse every whitespace run to one space and trim.
    *
    * Deterministic on every JVM (the Unicode tables ship with the
    * class library and are version-stable for these classes).
    * Case/accent/width/ligature variants of the same text normalize
    * identically: "Café", "café", "CAFE" all -> "cafe".
    */
  def normalize(s: UTF8String): UTF8String = {
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      i += Character.charCount(cp)
      val t = Character.getType(cp)
      val isMark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK || t == Character.ENCLOSING_MARK
      if (!isMark) {
        if (Character.isWhitespace(cp)) { if (started) pendingSpace = true }
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.appendCodePoint(Character.toLowerCase(cp))
          started = true
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** See [[NormalizeUtil.normalize]]. Composes with the dedup stack:
  * `md5(normalize_text(text))` groups case/accent/width variants of
  * the same content into one digest — the canonical-form exact dedup
  * between plain exact and MinHash near-dup.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NormalizeUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeExpressions {

  def normalizeText(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))
}
