package graft

/** Plan hygiene over the ENTIRE registered query surface: build every
  * `SparkEntry.queries` physical plan at sf0.001 and assert the
  * scale-safety invariants SCALE.md claims — no CartesianProduct and no
  * BroadcastNestedLoopJoin anywhere (since r9 both q_theta_join names run
  * the banded equi-join plan; the broadcast-NLJ demo form is unregistered
  * and lives only in RelationalSpec). A regression that silently
  * degrades a join to a nested loop (a lost equi-condition, a dropped
  * broadcast, a rewrite rule gone wrong) fails here by name before it
  * ever reaches a benchmark.
  *
  * LIMITATION: for the driver-iterative queries (q_textrank,
  * q_neardup_clusters family), `fn(spark, sf)` runs the full multi-round
  * job just to build the final frame, and the assertions below see only
  * that final presentation plan — each round's intermediate plan is
  * checkpoint-truncated out of it. The representative-round test at the
  * bottom covers the textrank loop body directly (on its FULL lineage, a
  * stricter check than the checkpointed form the loop actually runs);
  * the connected-components round is join+agg on (long,long) labels with
  * the same shape. The BPE trainer no longer iterates Spark jobs at all
  * (driver-local replay over the collected vocabulary).
  */
class PlanHygieneSpec extends SparkSpec {

  /** Documented exceptions — EMPTY since r9: no registered query may plan
    * a deliberate nested loop (the theta-join BNLJ demo is unregistered). */
  private val allowNestedLoop = Set.empty[String]

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.sorted.mkString(", ")}")
  }

  /** BNLJ whose broadcast side is BOUNDED by documented design (not a
    * scalar aggregate): the brute-force cosine scorers broadcast the
    * corpus/25 query panel — the honest all-pairs baseline their ANN
    * siblings exist to replace at scale — and the nearest-centroid
    * classifier broadcasts the langs x 64 centroid table, whose
    * cardinality is fixed by the VALUE DOMAIN (languages), not the corpus.
    */
  private val allowBoundedBroadcast =
    Set("q_cosine_topk", "q_hard_negatives", "q_centroid_classify",
      // the IVF operator scores vectors against the broadcast centroid
      // table (n/CentroidStride rows — the coarse quantizer, not the
      // corpus); its bracket audit additionally embeds q_cosine_topk's
      // exact companion with the same bounded query-panel broadcast
      "q_ivf_topk", "q_ivf_audit",
      // hybrid retrieval's lexical arm shares the cosine family's kernel
      // shape (per-query 0/1 vocab masks broadcast against per-doc weight
      // vectors, one codegen'd dot per pair — the broadcast side is the
      // bounded query panel), and its semantic arm IS q_cosine_topk at
      // pool depth 20 (q_bm25_topk's literal panel uses the plain
      // posting-list equi-join and needs no allowance)
      "q_rrf_fusion",
      // semantic decontamination broadcasts the BENCHMARK slice — in
      // production a fixed-size eval set while the corpus grows, so the
      // broadcast side does not scale with the input
      "q_semantic_decontaminate",
      // the recall audit composes q_cosine_topk (bounded panel) with the
      // bucketed ANN — same allowance as q_ivf_audit's exact companion
      "q_ann_recall")

  test("every BroadcastNestedLoopJoin broadcasts a global aggregate (a scalar row)") {
    // a BNLJ is scale-safe in exactly one shape: the broadcast side is a
    // global (groupless) aggregate — one row of corpus totals joined onto
    // every row (N for idf, min count for rates, ...) — plus the two
    // documented bounded-broadcast baselines above. Anything else is a
    // real nested loop and fails by name. The walk descends INTO
    // AdaptiveSparkPlanExec (whose children are Nil, so a plain collect
    // over an AQE-planned query inspects nothing — the round-5 version of
    // this test had exactly that blind spot).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect(pf) ++
        p.collect { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => deepCollect(a.inputPlan)(pf))
    def isScalarSide(p: SparkPlan): Boolean =
      deepCollect(p) {
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
      }.nonEmpty
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (allowNestedLoop(name) || allowBoundedBroadcast(name)) None
      else {
        val bad = deepCollect(fn(spark, sf).queryExecution.executedPlan) {
          case j: BroadcastNestedLoopJoinExec
            if !isScalarSide(j.left) && !isScalarSide(j.right) => j
        }
        if (bad.nonEmpty) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"non-scalar nested-loop joins in: ${offenders.sorted.mkString(", ")}")
  }

  test("loose-τ embedding queries plan no B²-tile stage (r9: the last scale-killer)") {
    // the demoted exact-audit form (Dedup.embeddingPairsExact) builds its
    // tile space from a generated block-pair Range; the registered
    // cluster-local queries must plan a plain hash equi join on the
    // k-means cluster id with no generated-range tile source anywhere
    for (name <- Seq("q_dedup_embedding", "q_embedding_clusters")) {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("Range ("), s"$name plans a generated tile range:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ")
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }

  test("a representative iterative-loop round plans no nested loop") {
    // the textrank rank-update round, on full (uncheckpointed) lineage —
    // covers the per-round plans the registry-wide tests never see
    val graph = operators.TextAnalysis.textrankGraph(spark, sf)
    val ranks0 = graph.select(org.apache.spark.sql.functions.col("src").as("word"))
      .distinct()
      .withColumn("rank", org.apache.spark.sql.functions.lit(1.0))
    val plan = operators.TextAnalysis.textrankRound(graph, ranks0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "textrank round plans a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "textrank round plans a BNLJ")
  }
}
