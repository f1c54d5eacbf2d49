package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text-statistics kernel: `string -> struct<quality:double,
 * lang:string, n_tokens:int>` computing EXACTLY the values of the Column
 * formulations in [[Text]] ([[Text.qualityScore]], [[Text.languageId]],
 * [[Text.tokenCount]]) in one pass over the tokens instead of seven
 * interpreted higher-order-function traversals (quality alone re-splits the
 * text three times; languageId five more). Bit-equality against the Column
 * forms is pinned by `TextSpec` over a real corpus, and the DuckDB oracle
 * checks the same values independently, so any semantic drift fails two
 * gates.
 *
 * Semantics mirrored precisely:
 *  - `trim` strips 0x20 space chars only (Spark's StringTrim default);
 *  - `length` counts code points (UTF8String.numChars);
 *  - `lower` lower-cases the whole string (ASCII fast path, else JDK);
 *  - token split is regex `\s+`; quality's alpha ratio uses
 *    `[^A-Za-z ]` removal; round is HALF_UP at 6 decimals;
 *  - language winner = max (hits, lang) struct, binary string order.
 */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("quality", DoubleType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)
  ))
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TextStatsExpr.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  def stats(text: Column): Column = columnOf(TextStatsExpr(expressionOf(text)))

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val nonAlpha = java.util.regex.Pattern.compile("[^A-Za-z ]")

  private val stopWords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Text.StopWords.foreach(s.add)
    s
  }
  // (lang, marker set) in declaration order; winner = max (hits, lang)
  private val profiles: Array[(String, java.util.HashSet[String])] =
    Text.LangProfiles.map { case (lang, markers) =>
      val s = new java.util.HashSet[String]()
      markers.foreach(s.add)
      (lang, s)
    }.toArray

  /** Spark `trim`: strip 0x20 only. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** UTF8String.toLowerCase: ASCII fast path, else full-string JDK lower. */
  private def lowerLikeSpark(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Char](s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        out(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        j += 1
      }
      new String(out)
    } else s.toLowerCase
  }

  private def codePoints(s: String): Int = s.codePointCount(0, s.length)

  def compute(text: String): InternalRow = {
    val trimmed = trimSpaces(text)
    // tokenCount: split of the TRIMMED original (case untouched)
    val rawTokens: Array[String] =
      if (trimmed.isEmpty) Array.empty else ws.split(trimmed, -1)
    val nTok = rawTokens.length

    // tokens(): lower(trim) then split, empties dropped
    val lowered = lowerLikeSpark(trimmed)
    val lowTokens: Array[String] =
      if (lowered.isEmpty) Array.empty else ws.split(lowered, -1)

    var stopHits = 0
    val langHits = new Array[Int](profiles.length)
    var i = 0
    while (i < lowTokens.length) {
      val t = lowTokens(i)
      if (t.nonEmpty) {
        if (stopWords.contains(t)) stopHits += 1
        var p = 0
        while (p < profiles.length) {
          if (profiles(p)._2.contains(t)) langHits(p) += 1
          p += 1
        }
      }
      i += 1
    }

    // quality (Text.qualityScore formula, double arithmetic order preserved)
    val nTokD = nTok.toDouble
    val nChars = codePoints(text).toDouble
    val meanWordLen = if (nTokD > 0) nChars / nTokD else 0.0
    val alphaChars = codePoints(nonAlpha.matcher(text).replaceAll("")).toDouble
    val alphaRatio = if (nChars > 0) alphaChars / nChars else 0.0
    val stopRatio = if (nTokD > 0) stopHits.toDouble / nTokD else 0.0
    val lenScore = math.min(nTokD / 50.0, 1.0)
    val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 10.0) 1.0 else 0.3
    val stopScore = math.min(stopRatio * 5.0, 1.0)
    val quality = java.math.BigDecimal
      .valueOf(lenScore * 0.3 + wordLenScore * 0.2 + alphaRatio * 0.3 + stopScore * 0.2)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

    // language: max (hits, lang) with binary string tiebreak, like array_max
    var bestHits = Int.MinValue
    var bestLang = ""
    var p = 0
    while (p < profiles.length) {
      val (lang, _) = profiles(p)
      if (langHits(p) > bestHits || (langHits(p) == bestHits && lang.compareTo(bestLang) > 0)) {
        bestHits = langHits(p)
        bestLang = lang
      }
      p += 1
    }
    val lang = if (bestHits > 0) bestLang else "und"

    new GenericInternalRow(Array[Any](quality, UTF8String.fromString(lang), nTok))
  }
}
