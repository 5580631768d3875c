package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY.md §4's "only if we add a custom as-of-join
  * physical operator" stretch): for every left row, the nearest right-side
  * time within the same key — emitted as one extra Long column (-1 when no
  * right row qualifies). Every left row survives (left-outer semantics).
  *
  * Matching modes (the standard surface of pandas `merge_asof` / Flink
  * temporal joins):
  *  - `forward = false` (default): greatest right time AT OR BEFORE the
  *    left time;
  *  - `forward = true`: smallest right time AT OR AFTER the left time;
  *  - `tolerance >= 0`: the match must additionally lie within
  *    `tolerance` time units of the left time (max-gap); `-1` = unbounded.
  *
  * Physical shape: the textbook sort-merge as-of. Both children are
  * hash-clustered on the key and sorted by (key, time) — the same
  * requirements a SortMergeJoin declares, satisfied by EnsureRequirements
  * with one exchange + sort per side — and each co-partition is merged in
  * ONE forward pass holding O(1) state (backward: the last seen right time
  * for the current key; forward: the frontier right row, never consumed
  * past the first candidate). No candidate pairs ever materialize, which is
  * the whole advantage over the join-then-filter formulation: a key with n
  * left and m right rows costs n + m, not n * m. Tolerance and direction
  * are one extra comparison in the same loop — the cost model is unchanged.
  *
  * Null semantics: right rows with a null key or time are skipped (they
  * sort first under the required ordering and can never match); left rows
  * with a null key or time emit the -1 sentinel and survive, preserving
  * left-outer semantics end to end.
  *
  * The window-composition form (Relational.asOfJoin) remains the
  * API-surface twin; both share one DuckDB oracle.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression,
                    asOfAttr: Attribute,
                    forward: Boolean = false,
                    tolerance: Long = -1L,
                    emitRight: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (emitRight) left.output ++ right.output.map(_.withNullability(true)) :+ asOfAttr
    else left.output :+ asOfAttr
  override def producedAttributes: AttributeSet = AttributeSet(asOfAttr)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, attr, fwd, tol, emitR) =>
      AsOfJoinExec(lk, rk, lt, rt, attr, fwd, tol, emitR, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        asOfAttr: Attribute,
                        forward: Boolean, tolerance: Long, emitRight: Boolean,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  /** With `emitRight` the matched right row's columns ride along (nullable,
    * null-filled on no-match) — the full pandas-`merge_asof` surface rather
    * than a time lookup. Costs one defensive row copy per right row read;
    * the merge remains one pass, O(1) state.
    */
  override def output: Seq[Attribute] =
    if (emitRight) left.output ++ right.output.map(_.withNullability(true)) :+ asOfAttr
    else left.output :+ asOfAttr
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
    val fwd = forward
    val tol = tolerance
    val emitR = emitRight
    val rightWidth = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      // key/time are extracted the moment a right row is read, so iterator
      // row-object reuse is safe; in emitRight mode the row itself is
      // defensively copied at read (one copy per right row — the same cost
      // an SMJ pays to buffer its streamed side).
      // Null handling per the class contract: null-key/time right rows are
      // skipped here (nulls sort FIRST under the required ascending order,
      // so skipping them never breaks merge monotonicity); null-key/time
      // left rows short-circuit to the -1 sentinel below.
      var rKeyCur = 0L
      var rTimeCur = 0L
      var rRowCur: InternalRow = null
      var rValid = false
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rit.hasNext) {
          val r = rit.next()
          val kAny = rk.eval(r)
          val tAny = rt.eval(r)
          if (kAny != null && tAny != null) {
            rKeyCur = kAny.asInstanceOf[Long]
            rTimeCur = tAny.asInstanceOf[Long]
            if (emitR) rRowCur = r.copy()
            rValid = true
          }
        }
      }
      advanceRight()
      var heldKey = 0L
      var heldTime = 0L
      var heldRow: InternalRow = null
      var held = false
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val joinedR = new JoinedRow
      val extra = new GenericInternalRow(1)
      val nullRight = new GenericInternalRow(rightWidth) // all-null, reused
      lit.map { l =>
        val kAny = lk.eval(l)
        val tAny = lt.eval(l)
        var result = -1L
        var matchRow: InternalRow = null
        if (kAny != null && tAny != null) {
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          if (fwd) {
            // stop at the first right row with time >= t for this key; do
            // NOT consume it — it may also be the match for later left rows
            while (rValid && (rKeyCur < k || (rKeyCur == k && rTimeCur < t)))
              advanceRight()
            if (rValid && rKeyCur == k && (tol < 0 || rTimeCur - t <= tol)) {
              result = rTimeCur
              matchRow = rRowCur
            }
          } else {
            while (rValid && (rKeyCur < k || (rKeyCur == k && rTimeCur <= t))) {
              if (rKeyCur == k) {
                heldKey = k; heldTime = rTimeCur; heldRow = rRowCur; held = true
              }
              advanceRight()
            }
            if (held && heldKey == k && (tol < 0 || t - heldTime <= tol)) {
              result = heldTime
              matchRow = heldRow
            }
          }
        }
        extra.update(0, result)
        if (emitR)
          proj(joined(joinedR(l, if (matchRow == null) nullRight else matchRow), extra))
        else
          proj(joined(l, extra))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
