package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Morton (Z-order) interleave of the low 16 bits of two longs:
  * bit i of `x` lands at position 2i, bit i of `y` at 2i+1, giving a 32-bit
  * space-filling-curve key. Sorting or range-partitioning by this key
  * clusters rows that are close in BOTH dimensions, which is what makes
  * multi-column min/max data skipping work (the single-column sort ordering
  * clusters only its leading key — see operators/Layout.scala for the
  * measured comparison).
  *
  * A custom Expression rather than a 32-term shiftleft/or tree: the fold
  * formulation analyzes and codegens fine but produces an expression whose
  * generated Java is ~60 lines per reference vs this one's 5-line loop, and
  * the loop form is what the classic bit-twiddling literature ships
  * (Morton 1966; the interleave-with-masks trick in Warren, Hacker's
  * Delight §7-2 — here the plain loop, which JIT unrolls, keeps the eval
  * and codegen paths obviously identical).
  *
  * Semantics: inputs are masked to 16 bits (`& 0xFFFF`) — callers own
  * range-reduction of wider keys (Layout.zorderLayout masks explicitly so
  * the truncation is visible in the query, and the DuckDB oracle mirrors
  * the same 16-term bit arithmetic).
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_morton"

  // analysis-time typing: a non-long child (e.g. an Int column) must fail
  // at analysis like the other graft expressions, not as a runtime
  // ClassCastException inside nullSafeEval's asInstanceOf
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) inputs, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long] & 0xFFFFL
    val y = b.asInstanceOf[Long] & 0xFFFFL
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonFunctions {
  /** Column API for [[MortonInterleave]]. */
  def morton(x: Column, y: Column): Column =
    ColumnShim.column(MortonInterleave(ColumnShim.expression(x), ColumnShim.expression(y)))
}
