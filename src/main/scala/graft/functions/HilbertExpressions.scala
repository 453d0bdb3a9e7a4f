package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hilbert-curve index — the locality-preserving sibling of the Morton
  * (Z-order) interleave in [[graft.core.Zorder]].
  *
  * Both curves map a d-dimensional cell grid onto one sort key so that
  * range-partitioned files become hyper-rectangles of the column space;
  * the difference is the walk order INSIDE the grid. Morton's bit
  * interleave takes long diagonal jumps every time a high-order bit
  * flips, so a file covering a contiguous Morton range can span two
  * distant plates of the space — its min/max footer stats widen and
  * skip less. The Hilbert curve takes only unit steps (consecutive
  * indices are always grid neighbors), so equal-size index ranges are
  * tighter rectangles; Databricks ships exactly this upgrade as liquid
  * clustering's layout, and WriterSpec measures the effect on real
  * parquet footers here rather than trusting the theory.
  *
  * The coordinate→index transform is Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * standard public-domain formulation): Gray-decode the coordinate
  * bits in place, then read the index out as an MSB-first interleave.
  * It is a per-bit state machine (each bit level's rotation/reflection
  * depends on every higher bit), which is why this is a compiled
  * Catalyst expression and not a fold of built-in shift/mask columns
  * like the Morton key — the state would need an exponential CASE
  * expansion to stay declarative. */
object Hilbert {

  /** Hilbert index of `codes` — d coordinates, each in [0, 2^bits) —
    * as a non-negative long. d·bits must fit a signed long. The input
    * array is NOT mutated (the transform works on a copy). */
  def index(codes: Array[Long], bits: Int): Long = {
    val n = codes.length
    require(n >= 1 && bits >= 1 && n * bits <= 62,
      s"$n coords x $bits bits must fit a signed long")
    val x = java.util.Arrays.copyOf(codes, n)
    // AxesToTranspose (Skilling): inverse-undo the rotations …
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // … then Gray-encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → index: bit j of coordinate k lands MSB-first
    var h = 0L
    var j = bits - 1
    while (j >= 0) {
      var k = 0
      while (k < n) {
        h = (h << 1) | ((x(k) >> j) & 1L)
        k += 1
      }
      j -= 1
    }
    h
  }

  /** [[index]] over Catalyst array data — the eval/codegen entry (both
    * modes call THIS, so interpreted and compiled results are the same
    * code path, bit-identical by construction). */
  def indexOf(codes: ArrayData, bits: Int): Long = {
    val n = codes.numElements()
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = codes.getLong(i); i += 1 }
    index(x, bits)
  }

  /** Column wrapper: the Hilbert index of an array<long> of cell
    * codes. */
  def hilbertIndex(codes: Column, bits: Int): Column =
    GraftColumnBridge.column(
      HilbertIndexExpr(GraftColumnBridge.expression(codes), bits))
}

/** Compiled Hilbert coordinate→index transform (see [[Hilbert]]). */
case class HilbertIndexExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(input: Any): Any =
    Hilbert.indexOf(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hilbert.indexOf($c, $bits);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
