package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY.md §4's "only if we add a custom as-of-join
  * physical operator" stretch): for every left row, the greatest right-side
  * time at or before the left row's time within the same key — emitted as
  * one extra Long column (-1 when no right row qualifies). Every left row
  * survives (left-outer semantics).
  *
  * Physical shape: the textbook sort-merge as-of. Both children are
  * hash-clustered on the key and sorted by (key, time) — the same
  * requirements a SortMergeJoin declares, satisfied by EnsureRequirements
  * with one exchange + sort per side — and each co-partition is merged in
  * ONE forward pass holding O(1) state (the last seen right time for the
  * current key). No candidate pairs ever materialize, which is the whole
  * advantage over the join-then-filter formulation: a key with n left and
  * m right rows costs n + m, not n * m.
  *
  * The window-composition form (Relational.asOfJoin) remains the
  * API-surface twin; both share one DuckDB oracle.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression,
                    asOfAttr: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asOfAttr
  override def producedAttributes: AttributeSet = AttributeSet(asOfAttr)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, attr) =>
      AsOfJoinExec(lk, rk, lt, rt, attr, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        asOfAttr: Attribute,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asOfAttr
  override def producedAttributes: AttributeSet = AttributeSet(asOfAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val leftOutput = left.output
    val attr = asOfAttr
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      // key/time are extracted the moment a right row is read, so iterator
      // row-object reuse is safe — no copies anywhere in the merge.
      // evalLong fails fast on null: a null key/time would otherwise unbox
      // to 0L and silently merge null-key rows into key 0, corrupting the
      // merge order (the sorted-input contract puts nulls first, not at 0).
      def evalLong(e: Expression, row: InternalRow, role: String): Long =
        e.eval(row) match {
          case l: java.lang.Long => l.longValue()
          case null => throw new IllegalStateException(
            s"AsOfJoin: null $role value — as-of key/time columns must be non-null")
          case other => other.asInstanceOf[Long]
        }
      var rKeyCur = 0L
      var rTimeCur = 0L
      var rValid = false
      def advanceRight(): Unit =
        if (rit.hasNext) {
          val r = rit.next()
          rKeyCur = evalLong(rk, r, "right key")
          rTimeCur = evalLong(rt, r, "right time")
          rValid = true
        } else rValid = false
      advanceRight()
      var heldKey = 0L
      var heldTime = 0L
      var held = false
      val proj = UnsafeProjection.create(leftOutput :+ attr, leftOutput :+ attr)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(1)
      lit.map { l =>
        val k = evalLong(lk, l, "left key")
        val t = evalLong(lt, l, "left time")
        while (rValid && (rKeyCur < k || (rKeyCur == k && rTimeCur <= t))) {
          if (rKeyCur == k) { heldKey = k; heldTime = rTimeCur; held = true }
          advanceRight()
        }
        extra.update(0, if (held && heldKey == k) heldTime else -1L)
        proj(joined(l, extra))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
