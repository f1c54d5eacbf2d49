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
 * Native repetition-statistics kernel for Gopher-style quality filtering
 * (Rae et al. 2021, "Scaling Language Models", table A1's repetition
 * filters): `string -> struct<top2:double, dup3:double>` where
 *
 *  - `top2` = fraction of normalized characters covered by the most frequent
 *    word 2-gram (count × gram length / normalized length; ties break to the
 *    lexicographically smallest gram);
 *  - `dup3` = fraction of normalized characters covered by word 3-grams that
 *    occur more than once (all occurrences counted, overlaps double-counted —
 *    the standard formulation of the heuristic).
 *
 * Normalization: tokens are the `\s+` split of `lower(trim(text))` with
 * empties dropped; the character denominator is the length of the tokens
 * re-joined with single spaces, so runs of whitespace don't dilute the
 * fraction. Texts with fewer than 2 (resp. 3) tokens score 0.0.
 *
 * One hash-map pass per row, codegen'd via a static call (the
 * [[TextStatsExpr]] pattern) — map-only at corpus scale, no shuffle. The
 * fractions are a single division of exact integers, so the DuckDB oracle
 * (grouped unnest + QUALIFY top-1) reproduces them bit-for-bit, and
 * `CorpusSpec` pins bit-equality against the explode-based Column spelling
 * in [[graft.operators.Corpus]].
 */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("top2", DoubleType, nullable = false),
    StructField("dup3", DoubleType, nullable = false)
  ))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.RepetitionStatsExpr.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  def stats(text: Column): Column = columnOf(RepetitionStatsExpr(expressionOf(text)))

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Spark `trim`: strip 0x20 only (see TextStatsExpr.trimSpaces). */
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
    val lowered = lowerLikeSpark(trimSpaces(text))
    val toks0: Array[String] =
      if (lowered.isEmpty) Array.empty else ws.split(lowered, -1)
    // drop empties (leading separator can produce one)
    val toks = if (toks0.exists(_.isEmpty)) toks0.filter(_.nonEmpty) else toks0
    val n = toks.length

    // denominator: tokens re-joined with single spaces
    var denom = if (n > 0) n - 1 else 0
    var i = 0
    while (i < n) { denom += codePoints(toks(i)); i += 1 }

    var top2 = 0.0
    if (n >= 2 && denom > 0) {
      val counts = new java.util.HashMap[String, Int](n * 2)
      i = 0
      while (i < n - 1) {
        val g = toks(i) + " " + toks(i + 1)
        counts.merge(g, 1, (a, b) => a + b)
        i += 1
      }
      var bestCount = 0
      var bestGram: String = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCount ||
          (e.getValue == bestCount && e.getKey.compareTo(bestGram) < 0)) {
          bestCount = e.getValue
          bestGram = e.getKey
        }
      }
      top2 = bestCount.toLong * codePoints(bestGram) / denom.toDouble
    }

    var dup3 = 0.0
    if (n >= 3 && denom > 0) {
      val counts = new java.util.HashMap[String, Int](n * 2)
      i = 0
      while (i < n - 2) {
        val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        counts.merge(g, 1, (a, b) => a + b)
        i += 1
      }
      var covered = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue >= 2) covered += e.getValue.toLong * codePoints(e.getKey)
      }
      dup3 = covered / denom.toDouble
    }

    new GenericInternalRow(Array[Any](top2, dup3))
  }
}
