package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two double arrays (SURVEY.md §2.B10 — the one
  * place a custom Catalyst Expression is genuinely warranted here).
  *
  * The HOF formulation `aggregate(zip_with(a, b, (x,y) -> x*y), ...)` is
  * CodegenFallback: every element round-trips through boxed Doubles and
  * megamorphic lambda dispatch, and a 2M-pair similarity join allocates
  * enough garbage to degrade the whole session (measured: 40s vs 4s for the
  * same query). This expression reads primitive doubles straight out of
  * UnsafeArrayData in a tight loop, in both codegen and interpreted mode,
  * summing in ascending index order — the exact evaluation order the DuckDB
  * oracle's list_reduce mirror uses, so results stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // call sites guarantee array<double> inputs (built via transform-cast)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]; `dot(v, v)` is the squared L2 norm. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Make `graft_dot(a, b)` callable from SQL strings on this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnShim.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
}
