package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** One-pass scalar kernel behind [[GopherStatsExpr]]: every counter the
  * Gopher rule battery needs, in a single character walk. The HOF
  * formulation ([[graft.ops.TextAnalysis.gopherFlags]]) materializes
  * the token array, the line array, a lowercased token copy and four
  * interpreted lambda filters per document; this walks the string once.
  * Both eval AND the generated code call THIS method, so the
  * interpreted and codegen paths cannot drift.
  *
  * Semantics pinned to the HOF/DuckDB twin: words split on the ASCII
  * \s class with empties dropped; lines split on \n (trailing empty
  * line kept, matching split/string_split); bullet/ellipsis line trims
  * strip ' ' ONLY (ltrim/rtrim default); '...' runs count
  * non-overlapping left-to-right (replace semantics); stop-word hits
  * are DISTINCT matches under ASCII lowercasing (a non-ASCII
  * "lookalike" word differs under both lowercasings, so both sides
  * no-match). */
object GopherScan {

  private def isWordWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar /* vertical tab */ || c == '\f' ||
      c == '\r'

  private def lowEq(s: String, start: Int, len: Int, w: String): Boolean = {
    if (w.length != len) return false
    var i = 0
    while (i < len) {
      val c = s.charAt(start + i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != w.charAt(i)) return false
      i += 1
    }
    true
  }

  // bit positions follow TextAnalysis.GopherStopwords order
  private def stopBit(s: String, start: Int, len: Int): Int = {
    if (lowEq(s, start, len, "the")) 1 << 0
    else if (lowEq(s, start, len, "be")) 1 << 1
    else if (lowEq(s, start, len, "to")) 1 << 2
    else if (lowEq(s, start, len, "of")) 1 << 3
    else if (lowEq(s, start, len, "and")) 1 << 4
    else if (lowEq(s, start, len, "that")) 1 << 5
    else if (lowEq(s, start, len, "have")) 1 << 6
    else if (lowEq(s, start, len, "with")) 1 << 7
    else 0
  }

  /** Returns {n_words, sum_word_len, alpha_words, hash_chars,
    * ellipsis_runs, n_lines, bullet_lines, ellipsis_lines, stop_hits}. */
  def scan(s: String): Array[Long] = {
    val n = s.length
    var nWords = 0L; var sumLen = 0L; var alphaWords = 0L
    var hashChars = 0L; var ellipsisRuns = 0L
    var nLines = 1L; var bulletLines = 0L; var ellipsisLines = 0L
    var stopMask = 0
    var inWord = false; var wordStart = 0; var wordAlpha = false
    var dotRun = 0
    var lineStart = 0; var firstNonSpace: Char = 0; var lastNonSpace = -1

    def closeWord(end: Int): Unit = {
      nWords += 1
      val len = end - wordStart
      sumLen += len
      if (wordAlpha) alphaWords += 1
      if (len >= 2 && len <= 4) stopMask |= stopBit(s, wordStart, len)
      inWord = false
    }
    def closeLine(): Unit = {
      if (firstNonSpace == '-' || firstNonSpace == '•' ||
          firstNonSpace == '*') bulletLines += 1
      if (lastNonSpace - 2 >= lineStart &&
          s.charAt(lastNonSpace) == '.' && s.charAt(lastNonSpace - 1) == '.' &&
          s.charAt(lastNonSpace - 2) == '.') ellipsisLines += 1
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '.') {
        dotRun += 1
        if (dotRun == 3) { ellipsisRuns += 1; dotRun = 0 }
      } else dotRun = 0
      if (c == '#') hashChars += 1
      if (c == '\n') {
        if (inWord) closeWord(i)
        closeLine()
        nLines += 1
        lineStart = i + 1; firstNonSpace = 0; lastNonSpace = -1
      } else {
        if (c != ' ') {
          if (firstNonSpace == 0) firstNonSpace = c
          lastNonSpace = i
        }
        if (isWordWs(c)) { if (inWord) closeWord(i) }
        else {
          if (!inWord) { inWord = true; wordStart = i; wordAlpha = false }
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) wordAlpha = true
        }
      }
      i += 1
    }
    if (inWord) closeWord(n)
    closeLine()
    Array(nWords, sumLen, alphaWords, hashChars, ellipsisRuns,
      nLines, bulletLines, ellipsisLines, Integer.bitCount(stopMask).toLong)
  }
}

object GopherExpressions {

  /** Column wrapper: the nine Gopher battery counters in one fused
    * character walk (struct<n_words,sum_word_len,alpha_words,
    * hash_chars,ellipsis_runs,n_lines,bullet_lines,ellipsis_lines,
    * stop_hits: bigint>). */
  def gopherStats(text: Column): Column =
    GraftColumnBridge.column(
      GopherStatsExpr(GraftColumnBridge.expression(text)))
}

/** Fused Gopher rule-battery counters as a codegen expression: one
  * character walk per document instead of the HOF twin's token array +
  * line array + lowercased copy + four interpreted lambda filters.
  * Returns a struct of the nine counters; threshold logic stays in
  * plain (codegen) column arithmetic so the rule battery remains
  * declarative and oracle-replayable. Value-identical to the HOF
  * formulation (asserted field-for-field in ExtensionsSpec). */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    "n_words", "sum_word_len", "alpha_words", "hash_chars",
    "ellipsis_runs", "n_lines", "bullet_lines", "ellipsis_lines",
    "stop_hits").map(StructField(_, LongType, nullable = false)))

  override def prettyName: String = "gopher_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val counts = GopherScan.scan(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      counts.map(v => v: Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("gfCounts")
      s"""
         |long[] $counts = graft.functions.GopherScan.scan($c.toString());
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $counts[0], $counts[1], $counts[2], $counts[3],
         |      $counts[4], $counts[5], $counts[6], $counts[7], $counts[8] });
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
