package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator Catalyst extension (SURVEY.md §2 / brief option (c)):
  * distributed SKYLINE as a first-class plan node — the classic two-phase
  * algorithm (Börzsönyi et al., ICDE 2001): each input partition reduces
  * to its LOCAL skyline before the exchange (a point dominated within a
  * partition is dominated globally, so skyline(∪ local skylines) =
  * skyline), then one final dominance pass over the gathered candidates.
  *
  * Like GroupTopK this is planned partial → final, but the final pass
  * requires ALL candidates together (`AllTuples` — dominance is a global
  * relation with no grouping key), so the exchange is a single-partition
  * gather of the already-pruned candidate set: at 100 TB the wire carries
  * per-task local skylines (typically a few points each — bounded by the
  * frontier's size on that slice, not the slice's row count), never the
  * input. The composed-from-built-ins form (`Relational.skylineParts`)
  * keys the sweep on the price domain instead; this node exists for the
  * shape built-ins can't express — dominance pruning BEFORE any exchange,
  * with no distinct-value aggregate at all.
  *
  * Dominance is evaluated on two bound expressions: `maxExpr` (maximize)
  * MUST evaluate to DoubleType and `minExpr` (minimize) to LongType —
  * callers wrap other numeric types in `Cast` (skylineNativeOf does;
  * Spark's Decimal is not a java.lang.Number, so an unchecked numeric
  * eval would CCE on decimal columns). Rows with a NULL criterion are
  * incomparable and drop out. d dominates p iff d.max ≥ p.max ∧
  * d.min ≤ p.min with one strict.
  */
case class Skyline(maxExpr: Expression, minExpr: Expression, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): Skyline =
    copy(child = newChild)
}

object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Skyline(mx, mn, child) =>
      val partial = SkylineExec(mx, mn, planLater(child), partial = true)
      SkylineExec(mx, mn, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Candidate-list dominance filter, partial (per input partition, no
  * distribution requirement) then final (after an AllTuples gather of the
  * surviving candidates). State per task is the local frontier only.
  */
case class SkylineExec(maxExpr: Expression, minExpr: Expression,
                       child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else AllTuples :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def dominates(dp: Double, ds: Long, pp: Double, ps: Long): Boolean =
    dp >= pp && ds <= ps && (dp > pp || ds < ps)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val mx = maxExpr
    val mn = minExpr
    child.execute().mapPartitions { rows =>
      val mxB = BindReferences.bindReference(mx, childOutput)
      val mnB = BindReferences.bindReference(mn, childOutput)
      val frontier = mutable.ArrayBuffer.empty[(Double, Long, InternalRow)]
      rows.foreach { row =>
        val pv = mxB.eval(row)
        val sv = mnB.eval(row)
        // rows with a NULL criterion are incomparable under dominance and
        // drop out (the SQL NOT-EXISTS oracle's three-valued logic agrees:
        // a NULL-keyed row never survives its own comparison)
        if (pv != null && sv != null) {
          val p = pv.asInstanceOf[Double]
          val s = sv.asInstanceOf[Long]
          if (!frontier.exists { case (cp, cs, _) => dominates(cp, cs, p, s) }) {
            frontier.filterInPlace { case (cp, cs, _) => !dominates(p, s, cp, cs) }
            frontier += ((p, s, row.copy()))
          }
        }
      }
      frontier.iterator.map(_._3)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SkylineExec =
    copy(child = newChild)
}
