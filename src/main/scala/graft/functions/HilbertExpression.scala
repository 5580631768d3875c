package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Hilbert-curve index of two 16-bit coordinates — the
  * better-locality sibling of [[MortonInterleave]]: consecutive Hilbert
  * indexes are ALWAYS unit Manhattan steps (adjacent grid cells), where
  * the Z-curve takes a long diagonal jump at every power-of-two seam —
  * the property behind production clustering engines' move from Z-order
  * to Hilbert for multi-dimensional layout. LayoutSpec proves the
  * unit-step/bijection properties against an independent d2xy inverse
  * and measures the walk over real occupied key cells (strictly shorter
  * than Z's); see Layout.hilbertLayout for the honest bounding-box
  * caveat on this corpus's thin key strip.
  *
  * Algorithm: the classic xy2d walk (Hilbert 1891; the bit-twiddling
  * formulation popularized by Warren and the Wikipedia reference
  * implementation): per bit-plane s = 2^15..2^0, accumulate the quadrant
  * offset s²·((3·rx) ⊕ ry) and rotate/reflect the frame for the next
  * level (ry = 0: optional point reflection through the FULL grid when
  * rx = 1, then swap axes). Same loop in eval and codegen, like the
  * Morton kernel; the DuckDB oracle replays the identical walk as a
  * 16-step recursive CTE, so the key is bit-exact cross-engine.
  *
  * Semantics: inputs masked to 16 bits (`& 0xFFFF`) — callers own
  * range-reduction of wider keys, exactly like the Morton kernel
  * (Layout.hilbertLayout masks explicitly so the truncation is visible
  * in the query and the oracle).
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) inputs, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertFunctions.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertFunctions.xy2d($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertFunctions {
  /** The shared eval/codegen kernel: 16-bit-per-dim Hilbert index in
    * [0, 2³²). Public static so generated code can call it directly —
    * one JIT-compiled body for both paths. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = 0xFFFFL - x
          y = 0xFFFFL - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column API for [[HilbertIndex]]. */
  def hilbert(x: Column, y: Column): Column =
    ColumnShim.column(HilbertIndex(ColumnShim.expression(x), ColumnShim.expression(y)))
}
