package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode text normalization for corpus cleaning — the first stage every
 * LLM data pipeline runs before dedup/scoring (mismatched composed vs
 * decomposed accents defeat exact and near dedup alike). NFC is the
 * web-canonical form; it is oracle-checkable because DuckDB ships
 * `nfc_normalize` and NFC is stable across Unicode versions for assigned
 * code points.
 */
object Normalize {

  /** Unicode NFC normalization of a string column (codegen'd; null-safe). */
  def nfc(text: Column): Column = columnOf(NfcNormalizeExpr(expressionOf(text)))

  /**
   * Full corpus text cleaning, one codegen'd pass per step:
   *  1. NFC-normalize (compose combining sequences);
   *  2. control characters (C0 except `\n`, DEL) and tabs become spaces;
   *  3. runs of spaces collapse to one; 4. trim.
   * Newlines survive — paragraph structure is signal (quality scoring,
   * line dedup). Every step has an exact DuckDB spelling, so operators on
   * cleaned text stay hash-checkable end to end.
   */
  def cleanText(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(nfc(text), "[\\x00-\\x09\\x0B-\\x1F\\x7F]", " "),
        " +", " "))

  /**
   * HTML → text for crawl corpora, the regex tier (a full DOM parse is an
   * external stage; this is the deterministic, oracle-checkable cut every
   * pipeline applies first): drop script/style SUBTREES and comments
   * wholesale, turn every remaining tag into a space, then decode the six
   * entities that dominate real pages (`&lt; &gt; &quot; &#39; &nbsp;`
   * and `&amp;` LAST, so `&amp;lt;` decodes to the literal `&lt;` exactly
   * once — the standard single-pass rule). Compose with [[cleanText]] for
   * whitespace discipline. Every step is a regex/replace with identical
   * Java-regex and RE2 semantics, so the operator hash-checks cross-engine.
   */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      html, "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to))
      }
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.NfcNormalizeExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: java.text.Normalizer's isNormalized is a cheap scan and
    // almost all real text is already NFC — skip the allocation
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
