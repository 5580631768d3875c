package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator Catalyst extension (SURVEY.md §2 / brief option (c)):
  * per-group top-k as a first-class plan node — logical node, planning
  * strategy, and physical operator with bounded per-key heaps.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY o)
  * <= k`) must hash-exchange ALL rows and fully sort every partition before
  * it can discard anything. This operator holds only O(groups × k) rows at
  * any moment: each task keeps a k-bounded heap per key, so a 100 TB input
  * with a million groups and k=3 peaks at a few MB of state per task and
  * nothing is ever sorted beyond the k survivors. (A map-side partial pass
  * would compose the same way Spark does partial aggregation — the operator
  * satisfies its distribution requirement with one hash exchange here.)
  *
  * Registered per-session via `spark.experimental.extraStrategies` (the
  * public hook that works on harness-created sessions).
  */
case class GroupTopK(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                     k: Int, rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn is generated here, not read from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(groupExprs, ordering, k, rankAttr, child) =>
      GroupTopKExec(groupExprs, ordering, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GroupTopKExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                         k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  /** One hash exchange on the group key; no sort requirement — the heaps
    * replace it.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = GenerateOrdering.generate(ordering, childOutput)
      // max-heap by ranking order: head = worst row currently kept
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      rows.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](ord.on((r: UnsafeRow) => r)))
        if (heap.size < k) heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      val outProj = UnsafeProjection.create(output, childOutput :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val rankIsLong = rankAttr.dataType == org.apache.spark.sql.types.LongType
      heaps.iterator.flatMap { case (_, heap) =>
        val best = heap.dequeueAll.reverse // priority order is worst-first
        best.iterator.zipWithIndex.map { case (row, i) =>
          // match the declared rank type (LongType when built directly,
          // IntegerType when substituted for a row_number by TopKRewriteRule)
          rankRow.update(0, if (rankIsLong) (i + 1).toLong else i + 1)
          outProj(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
