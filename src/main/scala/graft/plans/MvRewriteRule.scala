package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, ExprId, IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import scala.collection.mutable

/** Materialized-view registry + aggregate-rewrite rule (SURVEY §2 B10 /
  * §4's documented optimizer-extension family, round 11) — the classic
  * summary-table optimization every warehouse ships (Oracle query rewrite,
  * Calcite materialized views; Goldstein & Larson, SIGMOD'01): a fact-side
  *
  *   SELECT dims, sum(measure), count(*) FROM fact [WHERE dim-pred] GROUP BY dims
  *
  * is answered from a pre-aggregated cube at a grain AT OR BELOW the
  * query's — sum folds as sum-of-partial-sums, count(*) as sum of the
  * stored per-cell row counts. The rewrite is EXACT here because every
  * registered measure is pre-summed in DECIMAL (order- and
  * grouping-insensitive addition), so serving from the cube is
  * hash-identical to scanning the fact.
  *
  * At 100 TB this is the difference between re-scanning a multi-billion-row
  * fact per dashboard query and reading a cube of |distinct dim
  * combinations| rows built once: the rule turns the former plan into the
  * latter with no query change.
  *
  * OPT-IN MARKER: the rule only fires on scans opened with
  * `.option("graft.mv", "true")` (the option rides
  * [[HadoopFsRelation.options]] into the plan). A production deployment
  * would enable rewrite globally; here the marker keeps the other ~200
  * registered query plans byte-stable regardless of whether an MV-building
  * query ran earlier in the session — plan determinism is part of this
  * repo's bench/hygiene contract.
  *
  * MATCHING: expression templates are compared structurally with attribute
  * identity by NAME (fact columns are uniquely named), via a shared
  * name→ExprId normalization then `semanticEquals` — so the same DataFrame
  * shapes match across separately-analyzed reads of the fact. A rewrite is
  * all-or-nothing: if any grouping expression, aggregate, or filter
  * conjunct fails to map onto the cube's dims/measures, the plan is left
  * untouched (e.g. an `avg` or a predicate on a non-dim column).
  */
object MvRegistry {

  /** One registered cube: `factPaths` identifies the scan to rewrite,
    * `mvPlan` is an analyzed relation over the stored cube, `dims` map
    * fact-side expressions to cube columns, `measures` map fact-side SUM
    * arguments to the cube's pre-sum columns, `cntCol` holds per-cell row
    * counts (serves `count(*)`). */
  final case class MvDef(
      factPaths: Set[String],
      mvPlan: LogicalRelation,
      dims: Seq[(Expression, String)],
      measures: Seq[(Expression, String)],
      cntCol: String)

  private val defs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), MvDef]()

  private[graft] def register(spark: SparkSession, d: MvDef): Unit = {
    graft.operators.SessionMemos.arm(spark, defs)
    defs.put((spark, d.factPaths.toSeq.sorted.mkString(",")), d)
  }

  private[graft] def lookup(spark: SparkSession, paths: Set[String]): Option[MvDef] =
    Option(defs.get((spark, paths.toSeq.sorted.mkString(","))))

  private[graft] def clear(spark: SparkSession): Unit =
    defs.keySet.removeIf(_._1 eq spark)
}

object MvRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    SparkSession.getActiveSession match {
      case Some(spark) =>
        plan.transformUp { case agg: Aggregate => tryRewrite(spark, agg).getOrElse(agg) }
      case None => plan
    }

  /** Unwrap Filter / attribute-only Project layers down to a marked fact
    * scan; collect the filter conjuncts on the way. */
  private def unwrap(p: LogicalPlan, filters: List[Expression])
      : Option[(LogicalRelation, HadoopFsRelation, List[Expression])] = p match {
    case Filter(cond, child) => unwrap(child, cond :: filters)
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(child, filters)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation if fs.options.get("graft.mv").contains("true") =>
          Some((lr, fs, filters))
        case _ => None
      }
    case _ => None
  }

  private def tryRewrite(spark: SparkSession, agg: Aggregate): Option[Aggregate] = {
    val (_, fs, filters) = unwrap(agg.child, Nil).getOrElse(return None)
    val paths = fs.location.rootPaths.map(_.toString).toSet
    val mv = MvRegistry.lookup(spark, paths).getOrElse(return None)

    // Structural equality with attributes identified by (lowercased) name:
    // both sides are normalized onto one shared name→ExprId table, then
    // compared with semanticEquals. Fact column names are unique, so this
    // matches the same expression shape across independent reads.
    val ids = mutable.Map.empty[String, ExprId]
    def norm(e: Expression): Expression = e.transformUp {
      case ar: AttributeReference =>
        ar.withExprId(ids.getOrElseUpdate(ar.name.toLowerCase, NamedExpression.newExprId))
    }
    val dimN = mv.dims.map { case (t, c) => (norm(t), c) }
    val meaN = mv.measures.map { case (t, c) => (norm(t), c) }
    def dimCol(e: Expression): Option[String] = {
      val n = norm(e)
      dimN.collectFirst { case (t, c) if t.semanticEquals(n) => c }
    }
    def meaCol(e: Expression): Option[String] = {
      val n = norm(e)
      meaN.collectFirst { case (t, c) if t.semanticEquals(n) => c }
    }

    val mvRel = mv.mvPlan.newInstance()
    val mvAttr: Map[String, Attribute] =
      mvRel.output.map(a => a.name.toLowerCase -> a).toMap
    def mvc(name: String): Attribute = mvAttr(name.toLowerCase)

    // Rewrite one expression tree onto the cube, TOP-DOWN, returning None
    // unless every piece maps positively. SUM(measure) → the cube-side
    // re-sum of the pre-sums (cast back to the original result type — the
    // re-sum widens decimal precision), COUNT(*)/COUNT(1) → sum of the
    // per-cell counts, dim-template subtrees → cube dim columns.
    //
    // AggregateExpressions are matched against their ORIGINAL children
    // before any child substitution, and an aggregate the rule cannot
    // positively map aborts the whole rewrite. This is the load-bearing
    // all-or-nothing guard: a bottom-up substitution would rewrite the dim
    // subtree UNDER an unmapped aggregate (count(l_returnflag),
    // sum(year(l_shipdate))) or leave a reference-free one
    // (count(lit(1L))) untouched — either way the aggregate would then be
    // evaluated over the ~tens of cube cells instead of the fact rows and
    // return a silently wrong result, while a reference-subset check alone
    // would wave it through.
    def rewrite(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        if (ae.isDistinct || ae.filter.nonEmpty) None
        else ae.aggregateFunction match {
          case s: Sum =>
            meaCol(s.child).map { c =>
              val re = ae.copy(aggregateFunction = Sum(mvc(c)))
              if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
            }
          // count(*) analyzes to Count(1); accept any single non-null
          // foldable literal argument (count(lit(1L)) counts every row
          // too). Count over a real column could be null-sensitive and is
          // NOT mapped — it aborts the rewrite via the None above.
          case c: Count =>
            c.children match {
              case Seq(l: Literal) if l.value != null =>
                val re = ae.copy(aggregateFunction = Sum(mvc(mv.cntCol)))
                Some(if (re.dataType == ae.dataType) re else Cast(re, ae.dataType))
              case _ => None
            }
          case _ => None
        }
      // Constraint-inferred null guards (InferFiltersFromConstraints adds
      // `isnotnull(l_shipdate)` next to a `year(l_shipdate) >= y` conjunct
      // once that batch has run): every registered dim template is
      // null-INTOLERANT in its single source attribute (identity columns,
      // `year(ts)`), so IsNotNull(attr) ⇔ IsNotNull(dim(attr)) and the
      // guard rewrites onto the cube's dim column. Without this the
      // all-or-nothing mapping check would reject the whole rewrite
      // whenever the rule first fires after constraint inference.
      case inn @ IsNotNull(a: AttributeReference) =>
        Some(dimN.collectFirst {
          case (t, c) if t.references.map(_.name.toLowerCase) == Set(a.name.toLowerCase) =>
            IsNotNull(mvc(c))
        }.getOrElse(inn))
      case other if dimCol(other).isDefined => Some(mvc(dimCol(other).get))
      case other =>
        // Non-aggregate connective (comparison, arithmetic, literal, …):
        // rewrite every child or fail. Unmapped bare attributes survive
        // here and are rejected by the reference-subset check below.
        val kids = other.children.map(rewrite)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    def rewriteAll(es: Seq[Expression]): Option[Seq[Expression]] = {
      val rs = es.map(rewrite)
      if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
    }

    def mapped(e: Expression): Boolean = e.references.subsetOf(mvRel.outputSet)

    val newFilters = rewriteAll(filters).getOrElse(return None)
    if (!newFilters.forall(mapped)) return None
    val newGroupings = rewriteAll(agg.groupingExpressions).getOrElse(return None)
    if (!newGroupings.forall(mapped)) return None
    val newOutput: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al @ Alias(child, name) =>
        Alias(rewrite(child).getOrElse(return None), name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = al.explicitMetadata)
      case ar: AttributeReference =>
        dimCol(ar) match {
          case Some(c) => Alias(mvc(c), ar.name)(exprId = ar.exprId)
          case None => return None
        }
      case _ => return None
    }
    if (!newOutput.forall(mapped)) return None

    val scanned: LogicalPlan =
      newFilters.foldLeft(mvRel: LogicalPlan)((p, c) => Filter(c, p))
    Some(Aggregate(newGroupings, newOutput, scanned))
  }
}
