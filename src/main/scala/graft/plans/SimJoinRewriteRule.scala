package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayDistinct, ArrayIntersect, ArrayMin, AttributeReference, Cast, Ceil, EqualNullSafe, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Multiply, PredicateHelper, Size, Slice}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

import graft.functions.JaccardSorted

/** Optimizer rule: rewrites a brute-force similarity join
  *
  *   SELECT ... FROM L CROSS JOIN R WHERE graft_jaccard_sorted(a, b) >= tau
  *
  * (the declarative way to ask for "all pairs within Jaccard distance")
  * into a PPJoin-style prefix-filtered EQUI join — the SURVEY §4.2
  * documented stretch. Unlike LSH this rewrite is EXACT, so it is a
  * legitimate semantics-preserving optimization: by the two-sided prefix
  * lemma (Xiao et al., WWW'08), jaccard(A,B) >= tau > 0 implies A and B
  * share an element inside their first ceil((1-tau)·|S|)+1 elements under
  * any fixed total order — here the arrays' own ascending value order
  * (graft_jaccard_sorted's input contract is sorted distinct arrays, which
  * is also exactly what `graft_shingle_hashes` emits). The rewritten plan
  *
  *   Project(L.out ++ R.out,
  *     Filter(tok = array_min(array_intersect(pref(a), pref(b)))
  *            && <all original conjuncts>,
  *       Join(Generate(explode(pref(a)), L),
  *            Generate(explode(pref(b)), R), Inner, tok_a = tok_b)))
  *
  * shuffles on the 8-byte prefix token instead of materializing |L|·|R|
  * rows: a CartesianProduct that evaluates the Jaccard kernel 25M times at
  * sf0.1 becomes a hash join over ~240k collisions. The
  * `tok = min(pref ∩ pref)` conjunct re-emits each qualifying pair exactly
  * once (a pair colliding on k prefix tokens appears k times in the equi
  * join; exactly one row has the minimum shared token), so no
  * row-identity tagging and no Distinct over nondeterministic ids is
  * needed — multiset semantics survive verbatim. The original Jaccard
  * conjunct stays in the residual filter as the verify step.
  *
  * Fires only when: the threshold is a positive double literal, both
  * Jaccard arguments are deterministic and each sides entirely with one
  * join input, and NO other conjunct is already an equi-join predicate
  * (an equi conjunct means the planner would pick a hash/merge join
  * anyway — and the guard also makes the rule idempotent, since the
  * rewritten join's own `tok_a = tok_b` blocks a second application).
  */
object SimJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Extract (aExpr, bExpr, tau) from a `jaccard >= tau`-shaped conjunct;
    * strict `>` keeps the same prefix bound (x > tau implies x >= tau).
    */
  private def simConjunct(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case GreaterThanOrEqual(JaccardSorted(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
    case GreaterThan(JaccardSorted(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
    case LessThanOrEqual(Literal(t: Double, DoubleType), JaccardSorted(a, b)) => Some((a, b, t))
    case LessThan(Literal(t: Double, DoubleType), JaccardSorted(a, b)) => Some((a, b, t))
    case _ => None
  }

  private def isEqui(l: LogicalPlan, r: LogicalPlan)(e: Expression): Boolean = e match {
    case EqualTo(x, y) => splitsSides(l, r, x, y)
    case EqualNullSafe(x, y) => splitsSides(l, r, x, y)
    case _ => false
  }

  private def splitsSides(l: LogicalPlan, r: LogicalPlan, x: Expression, y: Expression): Boolean =
    (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet) ||
      x.references.subsetOf(r.outputSet) && y.references.subsetOf(l.outputSet)) &&
      x.references.nonEmpty && y.references.nonEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // after PushPredicateThroughJoin the threshold usually lives in the
    // join condition; before it (or under extraOptimizations, which runs
    // as its own batch) it is a Filter over a condition-less cross join —
    // match both shapes
    case j @ Join(l, r, Inner | Cross, Some(cond), _) =>
      rewrite(l, r, splitConjunctivePredicates(cond), j.hint).getOrElse(j)
    case f @ Filter(cond, Join(l, r, Inner | Cross, None, hint)) =>
      rewrite(l, r, splitConjunctivePredicates(cond), hint).getOrElse(f)
  }

  private def rewrite(l: LogicalPlan, r: LogicalPlan,
                      conjuncts: Seq[Expression], hint: JoinHint): Option[LogicalPlan] = {
    if (conjuncts.exists(isEqui(l, r))) return None
    val hit = conjuncts.iterator.map(simConjunct).collectFirst {
      case Some((a, b, tau)) if tau > 0.0 && tau <= 1.0 &&
          a.deterministic && b.deterministic &&
          a.dataType.isInstanceOf[ArrayType] =>
        // align the jaccard arguments with the join sides
        if (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) &&
            a.references.nonEmpty && b.references.nonEmpty)
          Some((a, b, tau))
        else if (b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet) &&
            a.references.nonEmpty && b.references.nonEmpty)
          Some((b, a, tau))
        else None
    }
    hit.flatten.map { case (aL, bR, tau) =>
      val at = aL.dataType.asInstanceOf[ArrayType]
      // prefix of the array's first ceil((1-tau)·|S|)+1 elements, then
      // array_distinct: a no-op on contract-valid (sorted distinct) input,
      // but it pins exactly-once pair emission even when an array carries
      // duplicate elements (the exploded dup token would otherwise match
      // the min-shared-token conjunct once per copy). Unsorted input is
      // outside graft_jaccard_sorted's own contract (the kernel's
      // two-pointer result is unspecified there), so the rewrite preserves
      // semantics on every input the kernel defines them for.
      def prefix(arr: Expression): Expression = {
        val len = Add(
          Cast(Ceil(Multiply(Literal(1.0 - tau),
            Cast(Size(arr), DoubleType))), IntegerType),
          Literal(1))
        ArrayDistinct(Slice(arr, Literal(1), len))
      }
      val tokA = AttributeReference("_sj_tok_a", at.elementType, at.containsNull)()
      val tokB = AttributeReference("_sj_tok_b", at.elementType, at.containsNull)()
      val genL = Generate(Explode(prefix(aL)), Nil, outer = false, None, Seq(tokA), l)
      val genR = Generate(Explode(prefix(bR)), Nil, outer = false, None, Seq(tokB), r)
      // carry the original join's hint: a user's broadcast()/hint() on a
      // side survives the rewrite instead of silently degrading to NONE
      val joined = Join(genL, genR, Inner, Some(EqualTo(tokA, tokB)), hint)
      val minTok = EqualTo(tokA, ArrayMin(ArrayIntersect(prefix(aL), prefix(bR))))
      val verified = Filter((minTok +: conjuncts).reduce(org.apache.spark.sql.catalyst.expressions.And), joined)
      Project(l.output ++ r.output, verified)
    }
  }
}
