package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

/** Codegen'd squared L2 distance over two long arrays: Σ (a_i − b_i)²,
  * summed in ascending index order in plain long arithmetic — bit-identical
  * (including any overflow wrap) to the interpreted HOF
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, (s,x) -> s+x)` it
  * replaces (r16 optimization, guide §4: the HOF form is CodegenFallback —
  * boxed Longs and megamorphic lambda dispatch on every element — and sits
  * on the hot path of every ANN probe/assign/re-rank and k-means round).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { val d = x.getLong(i) - y.getLong(i); s += d * d; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $x.getLong($i) - $y.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd dot product over two long arrays: Σ a_i·b_i in ascending index
  * order, plain long arithmetic — bit-identical to the interpreted
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (s,x) -> s+x)` it replaces
  * (PCA projections, JL sums, trace terms). `dotLong(v, v)` is the exact
  * squared norm. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd upper-triangle self-products of one long array: for a length-d
  * input, the d·(d+1)/2 products a_i·a_j for i ≤ j in row-major order
  * (i ascending, then j from i to d−1) — exactly the element order of the
  * nested-HOF expansion
  * `flatten(transform(a, (x,i) -> transform(slice(a, i+1, d-i), (y,k) -> x*y)))`
  * it replaces in the exact-covariance / raw-moment family (r16: the HOF
  * form allocated interpreted structs per cell — 2,080 per row — and was the
  * whole cost of q_pca_cov). Pair (i,j) lives at position
  * i·d − i·(i−1)/2 + (j − i); consumers recover (i,j) from the exploded
  * position via literal lookup arrays built with [[VectorFunctions.triIdx]].
  */
case class UpperTriProducts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_tri_products"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n * (n + 1) / 2)
    var p = 0
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      var j = i
      while (j < n) { out(p) = xi * x.getLong(j); p += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val xi = ctx.freshName("xi")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |long[] $out = new long[$n * ($n + 1) / 2];
         |int $p = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = $x.getLong($i);
         |  for (int $j = $i; $j < $n; $j++) {
         |    $out[$p++] = $xi * $x.getLong($j);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]; `dot(v, v)` is the squared L2 norm. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[SqDistLong]]. */
  def sqDistLong(a: Column, b: Column): Column =
    ColumnShim.column(SqDistLong(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[DotLong]]. */
  def dotLong(a: Column, b: Column): Column =
    ColumnShim.column(DotLong(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[UpperTriProducts]]. */
  def triProducts(a: Column): Column =
    ColumnShim.column(UpperTriProducts(ColumnShim.expression(a)))

  /** (i, j) index vectors for a length-d [[UpperTriProducts]] output, in
    * its row-major position order — the literal lookup consumers attach to
    * the exploded position. */
  def triIdx(d: Int): (IndexedSeq[Long], IndexedSeq[Long]) = {
    val pairs = for { i <- 0 until d; j <- i until d } yield (i.toLong, j.toLong)
    (pairs.map(_._1), pairs.map(_._2))
  }

  /** Make the vector kernels callable from SQL strings on this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    ColumnShim.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
    ColumnShim.registerFunction(spark, "graft_sqdist_long",
      exprs => SqDistLong(exprs(0), exprs(1)))
    ColumnShim.registerFunction(spark, "graft_dot_long",
      exprs => DotLong(exprs(0), exprs(1)))
    ColumnShim.registerFunction(spark, "graft_tri_products",
      exprs => UpperTriProducts(exprs.head))
  }
}
