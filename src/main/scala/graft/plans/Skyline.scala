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
  * gather of the already-pruned candidate set: the wire carries per-task
  * local skylines — bounded by the frontier's size on that slice, not the
  * slice's row count. MEASURED boundary (SCALE.md, r11): on the sf0.1
  * part data the gather totals 3 candidates at n and 30 at 10n; on the
  * anti-correlated fixture (price and size trade off exactly, so the
  * frontier IS the input) it totals 20 000 at n = 20 000 and 200 000 at
  * 10n — i.e. the adversarial case ships every row to one task. The
  * staircase frontier (below) keeps that single task O(c log c) — 0.38 s
  * → 0.89 s measured for 10× the candidates — where the r10 candidate
  * list was O(c²); but the honest limit stands: when the frontier itself
  * approaches the input (and therefore the OUTPUT is ~the input), no
  * skyline formulation avoids a global O(f)-sized stage — the composed
  * sweep's unpartitioned running-min window hits the same wall (its
  * measured shuffle is 5n on the same fixture). Use this node where the
  * frontier is small (the operator's actual use case: multi-criteria
  * shortlists); an output ~the size of the corpus is a query-design
  * smell, not a partitioning problem. The composed-from-built-ins form
  * (`Relational.skylineParts`) keys the sweep on the price domain
  * instead; this node exists for the shape built-ins can't express —
  * dominance pruning BEFORE any exchange, with no distinct-value
  * aggregate at all.
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

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val mx = maxExpr
    val mn = minExpr
    child.execute().mapPartitions { rows =>
      val mxB = BindReferences.bindReference(mx, childOutput)
      val mnB = BindReferences.bindReference(mn, childOutput)
      // STAIRCASE frontier (r11): for the 2-criterion (max, min) case the
      // frontier is monotone — as price increases along it, size strictly
      // increases — so a TreeMap keyed on price answers both dominance
      // questions in O(log f) instead of the candidate-list's O(f) scan:
      //   * the new point (p, s) is dominated iff the frontier's CEILING
      //     entry at p (smallest price ≥ p; by monotonicity the smallest
      //     size among all entries with price ≥ p) has size ≤ s — unless
      //     it is the exact tie (p, s), which joins the frontier (ties
      //     don't dominate each other: neither criterion is strict);
      //   * entries the new point dominates (price ≤ p, size ≥ s, one
      //     strict) sit contiguously just below p — walk the floor
      //     entries downward while size ≥ s and remove (each row enters
      //     and leaves the map at most once, so maintenance is amortized
      //     O(log f) per input row).
      // This keeps the ANTI-CORRELATED boundary tractable: with the whole
      // input on the frontier (f = n) the candidate list degraded to
      // O(n²) pairwise scans; the staircase is O(n log n) with O(f) state.
      val frontier = new java.util.TreeMap[Double, (Long, mutable.ArrayBuffer[InternalRow])]()
      rows.foreach { row =>
        val pv = mxB.eval(row)
        val sv = mnB.eval(row)
        // rows with a NULL criterion are incomparable under dominance and
        // drop out — a DELIBERATE divergence from the SQL NOT-EXISTS
        // three-valued reading, which would EMIT a NULL-keyed row (its
        // dominance subquery is vacuously empty because every comparison
        // with NULL is unknown). The registered oracle therefore carries
        // an explicit IS NOT NULL pre-filter so both formulations state
        // the same semantics; PropertySpec pins the null-bearing case.
        if (pv != null && sv != null) {
          val p = pv.asInstanceOf[Double]
          val s = sv.asInstanceOf[Long]
          val ceil = frontier.ceilingEntry(p)
          if (ceil != null && ceil.getKey == p && ceil.getValue._1 == s) {
            ceil.getValue._2 += row.copy() // exact tie: joins the frontier
          } else if (ceil == null || ceil.getValue._1 > s) {
            // not dominated: evict everything the new point dominates
            var lower = frontier.floorEntry(p)
            while (lower != null && lower.getValue._1 >= s) {
              frontier.remove(lower.getKey)
              lower = frontier.floorEntry(p)
            }
            frontier.put(p, (s, mutable.ArrayBuffer(row.copy())))
          } // else: ceiling has price ≥ p and size ≤ s with one strict — dominated
        }
      }
      import scala.jdk.CollectionConverters._
      frontier.values().iterator().asScala.flatMap(_._2)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SkylineExec =
    copy(child = newChild)
}
