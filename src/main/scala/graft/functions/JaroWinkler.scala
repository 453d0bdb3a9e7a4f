package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the record-linkage scorer levenshtein
  * under-serves (it favors shared prefixes and tolerates transpositions,
  * the shape of human name/typo variation). Canonical Winkler variant:
  * prefix boost (scale 0.1, up to 4 chars) applied only when the Jaro
  * score exceeds 0.7.
  *
  * The expression participates in whole-stage codegen by emitting a call
  * to the static scorer — the same pattern Spark's own levenshtein uses
  * (generated code calling UTF8String.levenshteinDistance), so the DP
  * arrays live in one tight JVM method instead of interpreted Expression
  * eval. */
object JaroWinkler {

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Static scorer the generated code calls. Operates on UTF-16 CODE
    * UNITS of the UTF8 strings' toString (String.length/charAt):
    * supplementary-plane characters (emoji, rare CJK) count as two units,
    * which can shift the match window for such inputs — deterministic and
    * symmetric either way, and exact for the BMP text record linkage
    * runs on. (Names at linkage time are short; the char-array copy is
    * the levenshtein cost model too.) */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val (n1, n2) = (s1.length, s2.length)
    if (n1 == 0 && n2 == 0) return 1.0
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](n1)
    val matched2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of relative order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / n1 + m.toDouble / n2 + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxPrefix = math.min(4, math.min(n1, n2))
      while (l < maxPrefix && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two strings, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.functions.JaroWinkler.similarity($c1, $c2)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
