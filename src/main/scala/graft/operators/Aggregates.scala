package graft.operators

import graft.Tables
import graft.operators.Relational.{davg, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2.B4). Spark's hash aggregate is always
  * two-phase (partial map-side + final after the Exchange) — the MapReduce
  * combiner generalized — so every groupBy here ships only one row per
  * (partition, group) across the wire. Exact-decimal sums (see
  * Relational.dsum) keep float aggregates engine-portable.
  */
object Aggregates {

  /** TPC-H Q1-style: big filter + 2-key group + 8 aggregates in one pass. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Arbitrary GROUPING SETS (neither rollup nor cube): per-status totals,
    * per-priority totals, and the grand total in ONE pass — Spark expands
    * the sets into a single Expand + hash aggregate, so the input is read
    * once however many sets there are. SQL-expressed (the DataFrame API
    * exposes only the rollup/cube specializations).
    */
  def groupingSetsOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_gsets")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders_gsets
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** Pivot: one row per user, one column per event type (explicit value
    * list — required for a deterministic schema and a plan with NO extra
    * distinct-values job; an implicit pivot runs a driver-blocking distinct
    * first). Compiles to a single two-phase hash aggregate with CASE
    * projections — same shuffle as any groupBy.
    */
  def pivotEventCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"), col("error").as("n_error"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"),
        col("view").as("n_view"))
      .orderBy("user_id")

  /** Global (grand-total) aggregate — no grouping keys, one row out. */
  def globalAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_extendedprice")).as("avg_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  /** Exact COUNT(DISTINCT) per group (planner: Expand + two-phase agg). */
  def countDistinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Approximate distinct via HyperLogLog++ — the at-scale substitute for
    * exact distinct when 2-phase Expand is too expensive.
    *
    * BRACKET ORACLE: the HLL estimate itself is engine-specific (DuckDB's
    * HLL differs), so the registered output carries what IS portable — the
    * exact count, and a verdict column asserting the sketch landed within
    * 10% of it (the same tolerance AggregatesSpec bounds; rsd 0.02 makes
    * 10% a ≥5σ envelope). The DuckDB twin computes the exact count and
    * expects the verdict TRUE, so a drifting sketch hash-mismatches by
    * name instead of hiding behind a rows-only check. The raw estimate is
    * displayed and bounded in AggregatesSpec.
    */
  def approxDistinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          <= col("exact_users").cast("double") * 0.10).as("hll_within_10pct"))
      .orderBy("event_type")

  /** HLL SET-OVERLAP AUDIT (r13) — the inclusion-exclusion composition a
    * sketch warehouse actually runs: |A ∩ B| estimated as
    * est(A) + est(B) − est(A ∪ B) from three HLL sketches, never from a
    * join. Sets here: customers with an URGENT order (A) vs customers
    * ordering in 1996 (B) — genuinely overlapping-but-distinct at every
    * SF (probed: 1 297 / 1 168 / ∩ 1 019 at sf0.01). All three sketches
    * are conditional `approx_count_distinct` columns of ONE
    * map-combinable pass over the fact (CASE→NULL rows are ignored by
    * the sketch), so the audit never shuffles a fact row.
    *
    * BRACKET ORACLE (the [[approxDistinctUsers]] pattern): estimates are
    * not portable, so the output carries the EXACT |A|, |B|, |A ∪ B|,
    * |A ∩ B| and the exact Jaccard in ppm (all integers, hash-checked)
    * plus a verdict that the composed estimate lands within 10% OF THE
    * UNION — the honest envelope for inclusion-exclusion, whose absolute
    * errors add across the three sketches and scale with the union, not
    * the intersection (a tiny intersection of huge sets is exactly where
    * the composition degrades, and the verdict's denominator says so).
    * At 100 TB the exact arm (one multi-distinct Expand) is what you
    * drop; the sketch pass is the registered shape.
    */
  def hllOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val inA = when(col("o_orderpriority") === "1-URGENT", col("o_custkey"))
    val inB = when(year(col("o_orderdate")) === 1996, col("o_custkey"))
    val inU = when(col("o_orderpriority") === "1-URGENT"
      || year(col("o_orderdate")) === 1996, col("o_custkey"))
    o.agg(
        countDistinct(inA).as("n_a"),
        countDistinct(inB).as("n_b"),
        countDistinct(inU).as("n_union"),
        approx_count_distinct(inA, 0.02).as("ea"),
        approx_count_distinct(inB, 0.02).as("eb"),
        approx_count_distinct(inU, 0.02).as("eu"))
      .select(col("n_a"), col("n_b"), col("n_union"),
        (col("n_a") + col("n_b") - col("n_union")).as("n_intersect"),
        expr("(n_a + n_b - n_union) * 1000000 div n_union").as("jaccard_ppm"),
        (abs((col("ea") + col("eb") - col("eu"))
            - (col("n_a") + col("n_b") - col("n_union"))).cast("double")
          <= col("n_union").cast("double") * 0.10).as("inter_within_10pct_of_union"))
  }

  /** [[hllOverlap]] at its registered 100 TB shape (VERDICT r13 ask #8):
    * the same three-sketch inclusion-exclusion audit with the exact arm's
    * THREE-WAY MULTI-DISTINCT EXPAND removed from the plan. [[hllOverlap]]
    * keeps three `countDistinct` columns beside the sketches, and the
    * planner expands every order row ×3 before the distinct shuffle — the
    * row multiplication you cannot afford at 100 TB. Here the sketch pass
    * stays ONE fully map-combinable aggregate (HLLs are ordinary aggs, no
    * Expand), and the exact companions ride the [[Curation.profileOrders]]
    * construction instead: a 3-way `stack` unpivot to (set-label,
    * custkey) rows — already filtered to set members, so the unpivot
    * stream is at most 3× the QUALIFYING rows, not 3× the table — then
    * ONE single-distinct groupBy(label) aggregate whose partial pass
    * dedups map-side before the shuffle, pivoted back to a scalar row.
    * Same exact answers, no Expand anywhere (AggregatesSpec plan-asserts
    * it), same verdict envelope as [[hllOverlap]] — the composed estimate
    * within 10% of the UNION.
    */
  def hllOverlapSketch(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val inA = when(col("o_orderpriority") === "1-URGENT", col("o_custkey"))
    val inB = when(year(col("o_orderdate")) === 1996, col("o_custkey"))
    val inU = when(col("o_orderpriority") === "1-URGENT"
      || year(col("o_orderdate")) === 1996, col("o_custkey"))
    val sketch = o.agg(
      approx_count_distinct(inA, 0.02).as("ea"),
      approx_count_distinct(inB, 0.02).as("eb"),
      approx_count_distinct(inU, 0.02).as("eu"))
    val exact = o.select(expr(
      """stack(3,
        |  'a', CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey END,
        |  'b', CASE WHEN year(o_orderdate) = 1996 THEN o_custkey END,
        |  'u', CASE WHEN o_orderpriority = '1-URGENT'
        |       OR year(o_orderdate) = 1996 THEN o_custkey END
        |) AS (s, k)""".stripMargin))
      .filter(col("k").isNotNull)
      .groupBy("s").agg(countDistinct(col("k")).as("nd"))
      .groupBy().pivot("s", Seq("a", "b", "u")).agg(first(col("nd")))
    // both sides are provably scalar rows (groupless aggregates) — the
    // one BNLJ shape the hygiene sweep admits
    sketch.crossJoin(exact)
      .select(col("a").as("n_a"), col("b").as("n_b"), col("u").as("n_union"),
        (col("a") + col("b") - col("u")).as("n_intersect"),
        expr("(a + b - u) * 1000000 div u").as("jaccard_ppm"),
        (abs((col("ea") + col("eb") - col("eu"))
            - (col("a") + col("b") - col("u"))).cast("double")
          <= col("u").cast("double") * 0.10).as("inter_within_10pct_of_union"))
  }

  /** Approximate percentile sketch (companion to the HLL approx-distinct):
    * per-event-type p50/p95 via Spark's QuantileSummaries with a 100-row
    * accuracy budget.
    *
    * BRACKET ORACLE, like [[approxDistinctUsers]]: the sketch value is a
    * sampled corpus element (not portable), so the output carries the
    * exact interpolated percentiles (round-6, the construction
    * q_percentile_stats already hash-proves against quantile_cont) plus
    * verdict columns asserting each sketch value sits inside a ±5%-rank
    * window around its target — 5× the sketch's 1/accuracy = 1% rank-error
    * guarantee, so TRUE is the only correct answer and the oracle pins it.
    */
  def approxPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(100)).as("p50s"),
        percentile_approx(col("value"), lit(0.95), lit(100)).as("p95s"),
        percentile(col("value"), lit(0.5)).as("p50e"),
        percentile(col("value"), lit(0.95)).as("p95e"),
        percentile(col("value"), lit(0.45)).as("p45"),
        percentile(col("value"), lit(0.55)).as("p55"),
        percentile(col("value"), lit(0.90)).as("p90"),
        percentile(col("value"), lit(0.99)).as("p99"))
      .select(col("event_type"),
        round(col("p50e"), 6).as("p50_exact"),
        round(col("p95e"), 6).as("p95_exact"),
        (col("p50s") >= col("p45") && col("p50s") <= col("p55"))
          .as("p50_in_rank_window"),
        (col("p95s") >= col("p90") && col("p95s") <= col("p99"))
          .as("p95_in_rank_window"))
      .orderBy("event_type")

  /** KMV sample size: 64 minima → relative standard error ≈ 1/√(k−2) ≈
    * 12.7%. Small deliberately, so the estimator's error is VISIBLE in
    * the hash-checked err_ppm column instead of vanishing into rounding. */
  val KmvK = 64

  /** 2⁶⁰ — the range of the house 15-hex-digit md5 hash. Shared with the
    * DuckDB oracle (interpolated, so a hash-width change cannot silently
    * diverge the two engines). */
  val KmvTwo60: BigInt = BigInt(1) << 60

  /** KMV (k-minimum-values) DISTINCT SKETCH (r14) — the third distinct
    * estimator beside the exact Expand and HLL, and the one with a
    * property neither has: the sketch is FULLY DETERMINISTIC AND
    * ENGINE-PORTABLE (Bar-Yossef et al., RANDOM'02; Beyer et al.,
    * SIGMOD'07 — the "distinct sampling" estimator). The synopsis is the
    * [[KmvK]] smallest 60-bit md5 hashes of the distinct keys — a pure
    * function of the data under the house hash, which DuckDB recomputes
    * bit-for-bit — so the ESTIMATE ITSELF is hash-checked exactly (HLL's
    * register layout is engine-private; its queries settle for bracket
    * verdicts). est = (k−1)·2⁶⁰ div h_k, exact integer arithmetic; a
    * group with fewer than k distinct keys holds its whole key set and
    * reports the exact count. The err_ppm column makes the estimator's
    * honest ±2σ ≈ 25% envelope a visible, hash-pinned readout.
    *
    * Scale shape: one map-side-deduped (type, hash) distinct, then the
    * per-type k smallest via a rank window — which GraftExtensions'
    * TopKRewriteRule plans as the bounded-heap GroupTopK node
    * (partial→final, k·groups state, never a full sort; plan-asserted in
    * AggregatesSpec). KMV synopses are also mergeable (union the sets,
    * keep the k smallest) — the same build/append/serve lifecycle as the
    * CMS/HLL/histogram cubes, at k·8 bytes per group. The exact
    * countDistinct companion is the droppable audit arm, as everywhere.
    */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val two60 = KmvTwo60
    val dh = kmvHashes(spark, sfDir)
      .select(col("event_type"), col("h")).distinct()
    val kth = dh
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .groupBy("event_type")
      .agg(max("h").as("hk"), count(lit(1)).as("nk"))
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n_exact"))
    kth.join(exact, "event_type")
      .withColumn("kmv_est",
        when(col("nk") < KmvK, col("nk")).otherwise(
          expr(s"cast((cast(${KmvK - 1} as decimal(38,0)) * $two60) div hk as bigint)")))
      .select(col("event_type"), col("n_exact"), col("kmv_est"),
        expr("abs(kmv_est - n_exact) * 1000000 div n_exact").as("err_ppm"))
      .orderBy("event_type")
  }

  private val kmvCubeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private val kmvCubeIncrMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** The (event_type, day, hash) stream under the house 60-bit hash for
    * an arbitrary (normalized) events frame — shared by the one-shot
    * sketch, the cube builder, and the per-batch appenders. */
  private def kmvHashesFrame(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      expr("ts div 86400000000000").as("day"),
      graft.functions.TextHashFunctions.md5Top60(col("user_id").cast("string"))
        .as("h"))

  private def kmvHashes(spark: SparkSession, sfDir: String) =
    kmvHashesFrame(Tables.events(spark, sfDir))

  /** One (type, day)-grain KMV synopsis of a hash stream: the k smallest
    * DISTINCT hashes per cell — the rank window plans as the bounded-heap
    * GroupTopK node, k·cells state. */
  private def kmvSynopsisOf(hashes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    hashes.distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type", "day").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .select("event_type", "day", "h")
  }

  /** Append ONE batch's own per-(type, day) k-minima segment to a stored
    * KMV cube — per-batch facts, no serve-time recompute. Exactness of
    * the downstream fold: any hash in the union's global top-k has
    * ≤ k−1 smaller hashes in the whole union, hence ≤ k−1 smaller in its
    * own batch's slice of its cell — so it survived its batch synopsis,
    * and the union-truncate serve sees exactly the full distinct set's
    * top-k. Shared by the registered incremental twin and StreamingSpec's
    * foreachBatch maintenance. */
  private[graft] def appendKmvFrame(events: DataFrame, dir: String): Unit =
    kmvSynopsisOf(kmvHashesFrame(events)).write.mode("append").parquet(dir)

  /** Stored per-(type, day) KMV synopses — k smallest distinct hashes per
    * grain cell, built once per session (the CMS/HLL/histogram cube
    * lifecycle at k·8 bytes per cell). */
  private[graft] def kmvCubeDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, kmvCubeMemo)
    kmvCubeMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-kmv-cube")
      kmvSynopsisOf(kmvHashes(spark, sfDir))
        .write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** The APPENDED store (r15 — VERDICT r14 ask #5): two user-parity
    * batches each land their own per-(type, day) k-minima segment, so
    * every cell holds two partial synopses and the serve's
    * union-truncate merge is exercised WITHIN cells, not just across
    * days. The ≤ k−1-smaller argument above makes fold == rebuild exact,
    * so the oracle is shared verbatim with q_kmv_distinct/q_kmv_cube. */
  private[graft] def kmvCubeIncrDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, kmvCubeIncrMemo)
    kmvCubeIncrMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-kmv-cube-incr")
      val ev = Tables.events(spark, sfDir)
      appendKmvFrame(ev.filter(col("user_id") % 2 === 0), dir)
      appendKmvFrame(ev.filter(col("user_id") % 2 === 1), dir)
      dir
    })
  }

  /** KMV CUBE, SERVED (r14) — the mergeability half of [[kmvDistinct]]'s
    * story, exercised for real: per-(type, day) k-minima synopses are
    * STORED (build-once), and an all-days rollup merges them by
    * union + re-rank + truncate-to-k. The merge is EXACT, not
    * approximate-on-approximate: any hash in the union's global top-k
    * has ≤ k−1 smaller hashes in the whole union, hence ≤ k−1 smaller
    * in its own day — so it survived its day's synopsis, and the merged
    * top-k IS the top-k of the full distinct set. The served estimate
    * therefore equals the one-shot [[kmvDistinct]] bit-for-bit and the
    * oracle is shared verbatim (the ddCube additivity precedent, in
    * union-semilattice form). Serving scans ONLY the stored synopses
    * (days·types·k rows); the exact countDistinct companion is the
    * droppable audit arm, as everywhere.
    */
  def kmvCubeServed(spark: SparkSession, sfDir: String): DataFrame =
    serveKmvCube(spark, sfDir, kmvCubeDir(spark, sfDir))

  /** The appended-store readout (`q_kmv_cube_incremental`) — shares
    * [[serveKmvCube]] verbatim and the one-shot oracle (union-truncate
    * merge is exact, see [[appendKmvFrame]]). */
  def kmvCubeIncremental(spark: SparkSession, sfDir: String): DataFrame =
    serveKmvCube(spark, sfDir, kmvCubeIncrDir(spark, sfDir))

  private[graft] def serveKmvCube(spark: SparkSession, sfDir: String,
                                  dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val two60 = KmvTwo60
    val merged = Tables.cachedScan(spark, dir)
      .select(col("event_type"), col("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .groupBy("event_type")
      .agg(max("h").as("hk"), count(lit(1)).as("nk"))
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n_exact"))
    merged.join(exact, "event_type")
      .withColumn("kmv_est",
        when(col("nk") < KmvK, col("nk")).otherwise(
          expr(s"cast((cast(${KmvK - 1} as decimal(38,0)) * $two60) div hk as bigint)")))
      .select(col("event_type"), col("n_exact"), col("kmv_est"),
        expr("abs(kmv_est - n_exact) * 1000000 div n_exact").as("err_ppm"))
      .orderBy("event_type")
  }

  /** SKETCH-ONLY KMV CUBE SERVE (r15 — the VERDICT r14 "what's wrong" #2
    * note): [[kmvCubeServed]] carries the corpus-scale exact
    * countDistinct companion as its droppable audit arm; this is the
    * serve WITHOUT it — the query a 100 TB dashboard actually runs:
    * union-truncate over the stored synopses only (days·types·k rows),
    * never touching the fact table (plan-asserted in AggregatesSpec off
    * the analyzed relations, the hll-cube idiom). Still a FULL oracle —
    * the estimate is deterministic, so DuckDB replays it from the raw
    * events and the values hash-check (no bracket, unlike the HLL
    * sketch-only sibling). */
  def kmvCubeSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val two60 = KmvTwo60
    Tables.cachedScan(spark, kmvCubeDir(spark, sfDir))
      .select(col("event_type"), col("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .groupBy("event_type")
      .agg(max("h").as("hk"), count(lit(1)).as("nk"))
      .select(col("event_type"),
        when(col("nk") < KmvK, col("nk")).otherwise(
          expr(s"cast((cast(${KmvK - 1} as decimal(38,0)) * $two60) div hk as bigint)"))
          .as("kmv_est"))
      .orderBy("event_type")
  }

  /** STORE-ONLY KMV OVERLAP (r15) — [[kmvOverlap]]'s set algebra served
    * entirely FROM THE STORED CUBE: per-type synopses recovered by the
    * exact union-truncate over the (type, day) cells (the ≤ k−1-smaller
    * argument makes them equal the one-shot per-type k-minima), then the
    * same theta-rule union/intersection/Jaccard — zero fact-table
    * contact anywhere in the plan (asserted off the analyzed relations).
    * This is the composition a warehouse actually runs: overlap
    * questions answered from megabytes of synopses. Estimates identical
    * to [[kmvOverlap]]'s sketch arm, so the oracle replays them from raw
    * events and hash-checks; no exact companions by design (that is the
    * point of the store-only form). */
  def kmvOverlapSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val two60 = KmvTwo60
    // NOT checkpointed, deliberately: each of the three consumers
    // re-reads the (tiny) synopsis store, keeping the parquet relation
    // visible in the analyzed plan for the store-only assertion — a
    // checkpoint would truncate it into an opaque RDD leaf
    val topk = Tables.cachedScan(spark, kmvCubeDir(spark, sfDir))
      .select(col("event_type"), col("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .select("event_type", "h")
    val types = topk.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val session = spark
    import session.implicits._
    val pairs = (for {
      i <- types.indices; j <- (i + 1) until types.length
      m <- Seq(types(i), types(j))
    } yield (types(i), types(j), m)).toDF("ta", "tb", "member")
    val u = topk.join(broadcast(pairs), col("event_type") === col("member"))
      .select(col("ta"), col("tb"), col("h")).distinct()
    val kU = u.withColumn("rn", row_number().over(
        Window.partitionBy("ta", "tb").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .select("ta", "tb", "h")
    val sa = topk.select(col("event_type").as("ta"), col("h"), lit(1).as("ina"))
    val sb = topk.select(col("event_type").as("tb"), col("h"), lit(1).as("inb"))
    kU.join(sa, Seq("ta", "h"), "left").join(sb, Seq("tb", "h"), "left")
      .groupBy("ta", "tb")
      .agg(max("h").as("hk"), count(lit(1)).as("nk"),
        sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L).otherwise(0L)).as("c"))
      .withColumn("union_est",
        when(col("nk") < KmvK, col("nk")).otherwise(
          expr(s"cast((cast(${KmvK - 1} as decimal(38,0)) * $two60) div hk as bigint)")))
      .select(col("ta").as("type_a"), col("tb").as("type_b"), col("union_est"),
        expr("cast((cast(c as decimal(38,0)) * union_est) div nk as bigint)").as("inter_est"),
        expr("c * 1000000 div nk").as("jaccard_est_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** KMV SET ALGEBRA (r15) — the theta-sketch-style union/intersection
    * estimator over the per-type k-minima synopses (Beyer et al.
    * SIGMOD'07 §4; the Theta Sketch framework's intersection rule), and —
    * because the synopsis is deterministic under the house hash — the
    * first OVERLAP estimator in the engine whose estimates themselves
    * hash-check (q_hll_overlap settles for a ±10% bracket):
    *
    *   - union sketch of a type pair = the k smallest of Sₐ ∪ S_b; its
    *     k-th value estimates |A ∪ B| exactly as [[kmvDistinct]];
    *   - every member of the union sketch is ≤ both per-type k-th minima,
    *     so "h ∈ A" is decided EXACTLY by membership in Sₐ — count the
    *     union sketch's members present in BOTH synopses (c of nk) and
    *     |A ∩ B| ≈ c·est_union/nk, Jaccard ≈ c/nk (when nk < k the union
    *     sketch IS the union and both read exact).
    *
    * All arithmetic integer in fixed order → full oracle; the exact
    * union/intersection companions ride along as the droppable audit arm.
    * Scale shape: one distinct-hash pass builds the ≤ types·k-row
    * synopsis frame (checkpointed); everything pairwise happens on
    * synopsis-sized data via equi-joins against a LocalRelation pair
    * list (|types|² rows, value-domain bounded — the centroid-table
    * allowance); no corpus-scale join anywhere in the sketch arm. */
  def kmvOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val two60 = KmvTwo60
    val topk = kmvHashes(spark, sfDir).select(col("event_type"), col("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .select("event_type", "h")
      .localCheckpoint() // synopsis-sized (types·k rows); reused 3×
    // the pair membership list — value-domain bounded (|types|² rows),
    // built driver-side like the langs×64 centroid table
    val types = topk.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val session = spark
    import session.implicits._
    val pairs = (for {
      i <- types.indices; j <- (i + 1) until types.length
      m <- Seq(types(i), types(j))
    } yield (types(i), types(j), m)).toDF("ta", "tb", "member")
    val u = topk.join(broadcast(pairs), col("event_type") === col("member"))
      .select(col("ta"), col("tb"), col("h")).distinct()
    val kU = u.withColumn("rn", row_number().over(
        Window.partitionBy("ta", "tb").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .select("ta", "tb", "h")
    val sa = topk.select(col("event_type").as("ta"), col("h"), lit(1).as("ina"))
    val sb = topk.select(col("event_type").as("tb"), col("h"), lit(1).as("inb"))
    val agg = kU.join(sa, Seq("ta", "h"), "left").join(sb, Seq("tb", "h"), "left")
      .groupBy("ta", "tb")
      .agg(max("h").as("hk"), count(lit(1)).as("nk"),
        sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L).otherwise(0L)).as("c"))
    // exact audit arm (droppable, as everywhere): true union/intersection
    val um = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .join(broadcast(pairs), col("event_type") === col("member"))
      .select("ta", "tb", "user_id", "event_type")
    val ex = um.groupBy("ta", "tb", "user_id")
      .agg(countDistinct(col("event_type")).as("ntp"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_union"),
        sum(when(col("ntp") === 2, 1L).otherwise(0L)).as("n_inter"))
    agg.join(ex, Seq("ta", "tb"))
      .withColumn("union_est",
        when(col("nk") < KmvK, col("nk")).otherwise(
          expr(s"cast((cast(${KmvK - 1} as decimal(38,0)) * $two60) div hk as bigint)")))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_union"), col("n_inter"), col("union_est"),
        expr("cast((cast(c as decimal(38,0)) * union_est) div nk as bigint)").as("inter_est"),
        expr("n_inter * 1000000 div n_union").as("jaccard_ppm"),
        expr("c * 1000000 div nk").as("jaccard_est_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** Count-Min sketch geometry: [[CmsDepth]] independent hash rows of
    * [[CmsWidth]] cells. Width 16 over this corpus's small vocabulary
    * forces real collisions, so the estimate-vs-truth gap the spec and
    * oracle check is non-trivial. */
  val CmsDepth = 4
  val CmsWidth = 16L

  /** h_i(w): row-i cell index on [0, CmsWidth) — the same md5-top-60-bit
    * construction as the sampling hash (engine-portable; DuckDB computes
    * the identical value), seeded by the row index. */
  private def cmsCell(row: Int, w: org.apache.spark.sql.Column) =
    graft.functions.TextHashFunctions.md5Top60(concat(lit(s"$row:"), w)) % CmsWidth

  /** Count-Min sketch heavy-hitter counts over the corpus token stream —
    * the sublinear-memory frequency sketch (Cormode & Muthukrishnan 2005)
    * a 100 TB pipeline uses where an exact word count's group space no
    * longer fits: estimate(w) = min over rows i of cell[i][h_i(w)], never
    * an underestimate. Everything is DETERMINISTIC (md5-seeded hashes), so
    * unlike the HLL/QuantileSummaries sketches this one has a full DuckDB
    * oracle: per-word estimate, exact count, and overcount hash-match.
    *
    * Scale shape: the sketch build is ONE hash aggregate over (row, cell)
    * pairs — depth × corpus tokens map-side-combined into ≤ depth·width
    * rows total, shipped once; constant memory at any corpus size. The
    * probe side joins the depth·width-row sketch (broadcast) against the
    * query vocabulary. Here the probe set is the full (31-word) vocab; at
    * scale it is whatever candidate set you interrogate — the sketch cost
    * never changes. Mergeability (cell-wise sum of per-split sketches ==
    * whole-corpus sketch) is asserted in AggregatesSpec.
    */
  def cmsWordCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val tokens = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
    val cells = tokens
      .select(explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("r"), cmsCell(i, col("w")).as("cell"))): _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
    val exact = tokens.groupBy("w").agg(count(lit(1)).as("cnt"))
    val probes = exact
      .select(col("w"), col("cnt"), explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("r"), cmsCell(i, col("w")).as("cell"))): _*)).as("rc"))
      .select(col("w"), col("cnt"), col("rc.r").as("r"), col("rc.cell").as("cell"))
    probes.join(broadcast(cells), Seq("r", "cell"))
      .groupBy("w", "cnt")
      .agg(min("c").as("est"))
      .select(col("w"), col("est"), col("cnt"), (col("est") - col("cnt")).as("overcount"))
      .orderBy("w")
  }

  private val cmsCubeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Build-once path for the CMS cube: per-SOURCE Count-Min cell counts
    * written once per session, partitioned by source. CMS cells are plain
    * counts — ADDITIVE, unlike HLL registers — so any source-subset
    * rollup is an exact cell-wise sum over pruned partitions and equals
    * the sketch built directly on that subset, bit for bit. */
  private[graft] def cmsCubeDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, cmsCubeMemo)
    cmsCubeMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-cms-cube")
      Tables.documents(spark, sfDir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .select(col("source"), explode(array((0 until CmsDepth).map(i =>
          struct(lit(i).as("r"), cmsCell(i, col("w")).as("cell"))): _*)).as("rc"))
        .groupBy(col("source"), col("rc.r").as("r"), col("rc.cell").as("cell"))
        .agg(count(lit(1)).as("c"))
        .write.partitionBy("source").mode("overwrite").parquet(dir)
      dir
    })
  }

  /** [[cmsWordCounts]] SERVED from the stored per-source sketch cube —
    * the exact-additivity sibling of [[hllCubeServed]] in the lifecycle
    * family: merge = `sum(c)` per (r, cell) over the stored partitions,
    * and because cells are additive the merged sketch IS the whole-corpus
    * sketch, so the estimates hash-match [[cmsWordCounts]]'s full oracle
    * (no bracket needed). `n_sources` pins the cube grain. Serving reads
    * ≤ |sources|·depth·width tiny rows; the corpus pass happened once at
    * build. */
  def cmsCubeServed(spark: SparkSession, sfDir: String): DataFrame = {
    val merged = Tables.cachedScan(spark, cmsCubeDir(spark, sfDir))
      .groupBy("r", "cell").agg(sum("c").as("c"))
    val nSources = Tables.cachedScan(spark, cmsCubeDir(spark, sfDir))
      .agg(countDistinct(col("source")).as("n_sources"))
    val tokens = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
    val probes = tokens.groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("r"), cmsCell(i, col("w")).as("cell"))): _*)).as("rc"))
      .select(col("w"), col("cnt"), col("rc.r").as("r"), col("rc.cell").as("cell"))
    probes.join(broadcast(merged), Seq("r", "cell"))
      .groupBy("w", "cnt")
      .agg(min("c").as("est"))
      .crossJoin(broadcast(nSources))
      .select(col("w"), col("est"), col("cnt"),
        (col("est") - col("cnt")).as("overcount"), col("n_sources"))
      .orderBy("w")
  }

  /** ROLLUP: revenue by (nation, order-year) with subtotals and grand total.
    * Null group keys from the rollup are coalesced to sentinels so the sort
    * order is engine-independent.
    */
  def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val base = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("oyear"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
    // The rollup itself goes through SQL: the Expand under a DataFrame-API
    // rollup duplicates grouping attributes and trips the dataset-id based
    // ambiguous-self-join check when the super-rows are coalesced afterwards.
    // The SQL analysis path resolves by name and yields the same
    // Expand+Aggregate physical plan.
    base.createOrReplaceTempView("rollup_base")
    spark.sql(
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |       coalesce(oyear, -1L) AS oyear,
        |       CAST(sum(CAST(net AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM rollup_base
        |GROUP BY ROLLUP(n_name, oyear)
        |ORDER BY nation, oyear""".stripMargin)
  }

  /** CUBE over (status, priority) with sentinel-coalesced super rows. */
  def cubeOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))
      .orderBy("status", "priority")

  /** collect_set → sorted → joined to a string (deterministic array agg). */
  def collectEventTypes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** Exact percentiles (interpolated) + spread stats per event type.
    * stddev/corr are iterative float aggs that cannot be made bit-exact
    * across engines — rounded to 4 decimals (error ≪ grid).
    */
  def percentileStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(stddev_samp(col("value")), 4).as("sd"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
      .orderBy("event_type")

  /** Pearson correlation across lineitem measures (global). */
  def corrStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Per-(key, value) histogram of lineitem quantities — the shared input
    * for exact-median and mode below. The groupBy collapses map-side to at
    * most |keys|x|distinct values| partial rows per task, so the shuffle
    * carries the HISTOGRAM (3x50 rows here, keys x bins at any corpus
    * size), never the raw measures.
    */
  private def quantityHist(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("k"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("c"))

  /** Exact per-key median from the value histogram — no per-key sort of
    * raw rows. `percentile(col, 0.5)` collects every value of a group into
    * one aggregation buffer, so a hot key at 100 TB concentrates its whole
    * value list in a single task; the histogram route shuffles keys x bins
    * partial counts, runs a window over the (tiny) histogram, and reads the
    * median off the cumulative count: lo = smallest v with cum >=
    * floor((n+1)/2), hi = smallest v with cum >= floor(n/2)+1, median =
    * (lo+hi)/2 — the interpolated (quantile_cont) definition for even n,
    * the middle value for odd n. Exact for any discrete/bounded-cardinality
    * measure (codes, ratings, token counts); values here are integral, so
    * the midpoint arithmetic is IEEE-exact cross-engine. Oracle is DuckDB's
    * own `median()` — a fully independent formulation.
    */
  def medianHist(spark: SparkSession, sfDir: String): DataFrame =
    histMedian(quantityHist(spark, sfDir)).orderBy("k")

  /** The histogram-cumulative interpolated median on any (k, v, c) frame —
    * factored out so [[madHist]] can run it twice and PropertySpec can
    * drive it over generated multisets against a sorted reference. */
  private[graft] def histMedian(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy("k").orderBy("v")
    val totW = Window.partitionBy("k")
    hist
      .withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(totW))
      .groupBy("k")
      .agg(
        min(when(col("cum") >= floor((col("n") + 1) / 2), col("v"))).as("lo"),
        min(when(col("cum") >= floor(col("n") / 2) + 1, col("v"))).as("hi"))
      .select(col("k"), ((col("lo") + col("hi")) / 2).as("med"))
  }

  /** Per-key quantile READOUT off any (k, v, c) histogram — the one
    * integer rank algebra behind the weighted median, the quantile cube,
    * funnel latency and session stats (review r11: previously four
    * hand-rolled copies): `n` = total count/weight, `med_x2` =
    * [[histMedian]]'s lo+hi (integer-exact), `p95` = nearest rank
    * (smallest v with 100·cum ≥ 95·n — the form PropertySpec pins for
    * arbitrary quantiles), `max_v`. Extra same-grouping aggregates (e.g.
    * the cube's grain fingerprint) append via `extra`. */
  private def rankAggs(extra: Seq[org.apache.spark.sql.Column]) = Seq(
    max(col("n")).as("n"),
    (min(when(col("cum") >= floor((col("n") + 1) / 2), col("v")))
      + min(when(col("cum") >= floor(col("n") / 2) + 1, col("v"))))
      .as("med_x2"),
    min(when(col("cum") * 100 >= col("n") * 95, col("v"))).as("p95"),
    max(col("v")).as("max_v")) ++ extra

  private[graft] def histRankStats(hist: DataFrame,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy("k").orderBy("v")
    val totW = Window.partitionBy("k")
    val aggs = rankAggs(extra)
    hist
      .withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(totW))
      .groupBy("k")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The same readout on a GLOBAL (v, c) histogram — a true global
    * aggregate (one scalar row), which keeps downstream crossJoins inside
    * PlanHygieneSpec's scalar-broadcast allowance (a groupBy on a literal
    * key is one row too, but not STRUCTURALLY scalar). */
  private[graft] def histRankStatsGlobal(hist: DataFrame,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val totW = Window.partitionBy()
    val aggs = rankAggs(extra)
    hist
      .withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(totW))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic per-key mode from the same histogram: the most frequent
    * value, smallest value winning ties (a struct max on (count, -v) — one
    * aggregate, no join back). Same scale shape as the median: the raw
    * table collapses to the histogram map-side and only keys x bins rows
    * shuffle.
    */
  def modeHist(spark: SparkSession, sfDir: String): DataFrame =
    quantityHist(spark, sfDir)
      .groupBy("k")
      .agg(max(struct(col("c").as("c"), (-col("v")).as("nv"))).as("top"))
      .select(col("k"), (-col("top.nv")).as("mode_v"), col("top.c").as("cnt"))
      .orderBy("k")

  /** Robust dispersion: per-key MEDIAN ABSOLUTE DEVIATION, the outlier-
    * insensitive spread statistic (mad = median(|v − median(v)|)), computed
    * as TWO passes of the histogram-cumulative median rule above — value
    * histogram → median, deviation histogram (|v − med| re-keyed, counts
    * re-summed) → median again. `percentile`-style aggregates would
    * concentrate each key's full value list in one buffer; here both
    * medians read off keys×bins cumulative windows, so a hot key at 100 TB
    * costs its histogram, never its rows. Deviations over an integral
    * lattice step by 0.5, so every intermediate is exact in binary and the
    * DuckDB oracle's native `median(abs(v − med))` — a fully independent
    * formulation — matches bit-for-bit.
    */
  def madHist(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = quantityHist(spark, sfDir)
    val med = histMedian(hist)
    val devHist = hist.join(med, "k")
      .groupBy(col("k"), abs(col("v") - col("med")).as("v"))
      .agg(sum("c").as("c"))
    histMedian(devHist).withColumnRenamed("med", "mad")
      .join(med, "k")
      .select(col("k"), col("med"), col("mad"))
      .orderBy("k")
  }

  /** max_by / min_by semantics with deterministic struct tie-breaks: the
    * highest-value event and the first event per user in one pass.
    */
  def minMaxBy(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(max(struct(col("value"), col("event_id"))).as("top"),
        min(struct(col("ts"), col("event_id"))).as("first"))
      .select(col("user_id"),
        col("top.value").as("top_value"),
        col("top.event_id").as("top_event_id"),
        col("first.event_id").as("first_event_id"))
      .orderBy("user_id")

  /** WEIGHTED MEDIAN per key — the revenue-weighted / latency-weighted
    * "typical value" (half the MASS sits on each side, not half the
    * rows): identical cumulative-rank algebra to [[histMedian]] but the
    * histogram accumulates WEIGHT per value instead of row counts — here
    * the quantity-weighted median price cents per return flag. Exact:
    * weights are integral longs, lo/hi read off the cumulative weight,
    * median emitted as lo+hi. Same 100 TB stance as every histogram op:
    * keys × distinct-values rows shuffle, never the fact.
    */
  def weightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("k"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("c"))
    histRankStats(hist)
      .select(col("k"), col("n").as("total_weight"),
        col("med_x2").as("wmed_x2_cents"))
      .orderBy("k")
  }

  /** TUKEY IQR OUTLIER FENCES per key — the box-plot data-cleaning rule
    * (Tukey 1977): q1/q3 by the same integer nearest-rank discipline as
    * the rest of the histogram family (smallest v with 4·cum ≥ n and with
    * 4·cum ≥ 3·n), fences at q1 − 1.5·IQR and q3 + 1.5·IQR (halves exact:
    * computed as x2 integers, emitted once as doubles), and the outlier
    * mass OUTSIDE the fences counted off the SAME histogram — no second
    * scan, no sorted value list. The join back is histogram-to-quartiles
    * on the key (value-domain-bounded both sides).
    */
  def iqrOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = quantityHist(spark, sfDir)
    val cumW = Window.partitionBy("k").orderBy("v")
    val totW = Window.partitionBy("k")
    val q = hist
      .withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(totW))
      .groupBy("k")
      .agg(max(col("n")).as("n"),
        min(when(col("cum") * 4 >= col("n"), col("v"))).as("q1"),
        min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("q3"))
      // fences as x2 integers: 2·q1 − 3·IQR and 2·q3 + 3·IQR (IQR = q3−q1)
      .withColumn("lo_x2", col("q1") * 2 - (col("q3") - col("q1")) * 3)
      .withColumn("hi_x2", col("q3") * 2 + (col("q3") - col("q1")) * 3)
    q.join(hist, "k")
      .groupBy(col("k"), col("n"), col("q1"), col("q3"),
        col("lo_x2"), col("hi_x2"))
      .agg(sum(when(col("v") * 2 < col("lo_x2") || col("v") * 2 > col("hi_x2"),
        col("c")).otherwise(0L)).as("n_outliers"))
      .select(col("k"), col("n"), col("q1"), col("q3"),
        (col("lo_x2").cast("double") / 2.0).as("fence_lo"),
        (col("hi_x2").cast("double") / 2.0).as("fence_hi"),
        col("n_outliers"))
      .orderBy("k")
  }

  private val quantileCubeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Build-once path for the EXACT-QUANTILE cube: per (event_type, day)
    * value HISTOGRAMS over integer cents — the third mergeable-summary
    * species next to the CMS cube (additive counts) and the HLL cube
    * (sketch-additive distincts): histograms over a bounded value domain
    * are EXACTLY additive (cell-sum merge), so any day-range rollup
    * serves exact percentiles with zero sketch error and no fact rescan.
    * This is what t-digest/KLL buy approximately for unbounded domains;
    * for bounded discrete measures (cents, token counts, latencies in ms)
    * the exact histogram IS the right artifact. */
  private[graft] def quantileCubeDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, quantileCubeMemo)
    quantileCubeMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-quantile-cube")
      Tables.events(spark, sfDir)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** Per-type exact p50/p95 SERVED from the stored daily histogram cube:
    * merge = one grain-keyed re-sum of cell counts (histograms are exactly
    * additive), then the cumulative-rank rules read the quantiles off the
    * merged histogram — [[histMedian]]'s lo/hi interpolation for the
    * median (emitted as lo+hi to stay integer-exact) and nearest-rank for
    * p95 (smallest v with 100·cum ≥ 95·n — all-integer, no float rank).
    * Serving touches only &#8203;|types|×|days|×|distinct cents| artifact
    * rows; the fact table was scanned ONCE at build. The oracle replays
    * both rank rules over the raw table in SQL — exact equality, not a
    * bracket: that is the point of this cube vs the sketch ones.
    */
  def quantileCubeServed(spark: SparkSession, sfDir: String): DataFrame =
    serveQuantileCube(spark, quantileCubeDir(spark, sfDir))

  /** The ONE serve path both cube forms share (review r11: a forked serve
    * block would let the "incremental equals single build" test compare
    * serve-code forks instead of builds). `day` casts to long because the
    * incremental artifact reads it back as a PARTITION column. */
  private def serveQuantileCube(spark: SparkSession, dir: String): DataFrame = {
    val merged = Tables.cachedScan(spark, dir)
      .select(col("event_type").as("k"), col("cents").as("v"), col("c"),
        col("day").cast("long").as("day"))
      .groupBy(col("k"), col("v"))
      .agg(sum(col("c")).as("c"), countDistinct(col("day")).as("nd"))
    histRankStats(merged, extra = Seq(sum(col("nd")).as("cell_days")))
      .select(col("k").as("event_type"), col("n"), col("cell_days"),
        col("med_x2").as("med_x2_cents"), col("p95").as("p95_cents"))
      .orderBy("event_type")
  }

  private val quantileCubeIncrMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** INCREMENTAL maintenance for the exact-quantile cube — the same
    * append-only lifecycle the MV/BM25/ANN/DAU artifacts carry: the
    * histogram for every day before the last is written once PARTITIONED
    * BY day, the final day's cells append into their own partition (two
    * disjoint writes, history never rewritten), and because histograms
    * are exactly additive the serve-time re-sum is bit-identical to the
    * single-build cube — so the query SHARES q_quantile_cube's oracle. */
  private[graft] def quantileCubeIncrDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, quantileCubeIncrMemo)
    quantileCubeIncrMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-quantile-cube-incr")
      // fenced: the max-day collect and both writes are separate jobs;
      // unpersisted after — the build frame is never read again
      val hist = graft.operators.Dedup.fence(
        Tables.events(spark, sfDir)
          .groupBy(col("event_type"),
            expr("ts div 86400000000000").as("day"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .agg(count(lit(1)).as("c")),
        "day")
      try {
        val maxDay = hist.agg(max("day")).head.getLong(0)
        hist.filter(col("day") < maxDay)
          .write.partitionBy("day").mode("overwrite").parquet(dir)
        hist.filter(col("day") === maxDay)
          .write.partitionBy("day").mode("append").parquet(dir)
      } finally hist.unpersist()
      dir
    })
  }

  /** The quantile readout served from the APPENDED cube — equality with
    * the full-rebuild oracle proves the day-partitioned artifact holds
    * the whole history and the cell re-sum absorbs the append. Shares
    * [[serveQuantileCube]] verbatim with the single-build form. */
  def quantileCubeIncremental(spark: SparkSession, sfDir: String): DataFrame =
    serveQuantileCube(spark, quantileCubeIncrDir(spark, sfDir))

  private val hllCubeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Build-once path for the MERGEABLE-SKETCH cube: per (event_type, day)
    * Datasketches HLL sketches of the user_id set, written once per
    * session — the pre-aggregated OLAP artifact (Shavit/Datasketches
    * "mergeable summaries"): distinct counts are not additive, sketches
    * are, so the cube stores sketches and any rollup (here: all days per
    * event_type) is a cheap union over the artifact, never a fact rescan.
    */
  private[graft] def hllCubeDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, hllCubeMemo)
    hllCubeMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-hll-cube")
      Tables.events(spark, sfDir)
        .groupBy(col("event_type"), to_date(col("ts_us")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sketch"))
        .write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** Distinct-users-per-event-type SERVED from the stored daily sketch
    * cube: read the (event_type, day, sketch) artifact, union the daily
    * sketches per event_type, estimate. The aggregate-artifact member of
    * the round-10 index-lifecycle family (BM25 = retrieval index, LSH =
    * vector index, this = analytics cube): serving touches only
    * |types|×|days| sketch rows (~4 KB each), never the fact table.
    *
    * BRACKET ORACLE like [[approxDistinctUsers]]: the sketch estimate is
    * engine-specific, so the registered output carries the exact
    * companion (computed from the raw table — the AUDIT arm, present for
    * the oracle, not part of the serving cost) and a verdict that the
    * merged-union estimate lands within 10% of exact (lgConfigK=12 →
    * rsd ≈ 1.6%, so 10% is a ≥6σ envelope). `n_days` pins the cube's
    * grain portably.
    */
  def hllCubeServed(spark: SparkSession, sfDir: String): DataFrame = {
    val served = Tables.cachedScan(spark, hllCubeDir(spark, sfDir))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    served.join(exact, "event_type")
      .select(col("event_type"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")).cast("double")
          <= col("exact_users").cast("double") * 0.10).as("merged_within_10pct"))
      .orderBy("event_type")
  }

  /** DDSketch relative-accuracy parameter: every served quantile is
    * within 1% of the exact value at the same integer rank. */
  val DDAlpha = 0.01

  /** DDSketch bucket base γ = (1+α)/(1−α). */
  val DDGamma: Double = (1.0 + DDAlpha) / (1.0 - DDAlpha)

  private val ddCubeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private val ddCubeIncrMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Build-once path for the LOG-BUCKET QUANTILE SKETCH cube (VERDICT r11
    * ask #7) — the fourth mergeable-summary species, for UNBOUNDED /
    * continuous value domains where the exact histogram cube
    * ([[quantileCubeDir]]) has no bounded cell set: per (event_type, day),
    * counts over DDSketch buckets b = ⌈ln(v)/ln(γ)⌉ (Masson, Lee & Rim,
    * VLDB'19), γ = (1+α)/(1−α), α = 1%. Log buckets make the cell count
    * logarithmic in the DYNAMIC RANGE (≈ 463 buckets per decade-pair at
    * α=1% for any corpus), not in the distinct-value count — and the
    * cells are plain counts, so the cube is EXACTLY additive like the
    * cents histogram: any day-range rollup is a cell re-sum, never a
    * fact rescan, and incremental append folds bit-identically.
    * Positive-domain form (events.value > 0 corpus-wide, pinned by
    * q_expectations); [[ddCubeSigned]] is the full Masson construction
    * (mirrored negative store + zero bucket) over a signed fixture.
    */
  private[graft] def ddCubeDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, ddCubeMemo)
    ddCubeMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-dd-cube")
      Tables.events(spark, sfDir)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          ceil(log(col("value")) / lit(math.log(DDGamma))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** Day-partitioned APPEND twin of [[ddCubeDir]] — the same incremental
    * lifecycle as the exact-quantile cube: history written once
    * partitioned by day, the last day appended into its own partition;
    * additivity makes the serve-time re-sum bit-identical to the single
    * build, so both forms share one oracle. */
  private[graft] def ddCubeIncrDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, ddCubeIncrMemo)
    ddCubeIncrMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-dd-cube-incr")
      val hist = graft.operators.Dedup.fence(
        Tables.events(spark, sfDir)
          .groupBy(col("event_type"),
            expr("ts div 86400000000000").as("day"),
            ceil(log(col("value")) / lit(math.log(DDGamma))).cast("long").as("bucket"))
          .agg(count(lit(1)).as("c")),
        "day")
      try {
        val maxDay = hist.agg(max("day")).head.getLong(0)
        hist.filter(col("day") < maxDay)
          .write.partitionBy("day").mode("overwrite").parquet(dir)
        hist.filter(col("day") === maxDay)
          .write.partitionBy("day").mode("append").parquet(dir)
      } finally hist.unpersist()
      dir
    })
  }

  /** Per-type p50/p95 SERVED from the stored log-bucket cube, with the
    * sketch's relative-error guarantee turned into a BRACKET ORACLE
    * (the [[approxDistinctUsers]] / [[hllCubeServed]] pattern): the
    * served estimate 2γᵇ/(γ+1) (the bucket's geometric midpoint) is not
    * portable cross-engine (ln/pow), so the registered output carries the
    * EXACT nearest-rank quantiles (the audit arm, same integer rank rules
    * the sketch read-off uses: smallest value with 2·cum ≥ n for p50,
    * 100·cum ≥ 95·n for p95) plus verdicts that each estimate lands
    * within 2α of exact — α from the DDSketch bucket guarantee, doubled
    * to absorb a one-bucket boundary flip from IEEE ln noise. n_days
    * pins the cube grain portably. Serving touches only
    * |types|×|days|×O(log range) artifact rows.
    */
  def ddCubeServed(spark: SparkSession, sfDir: String): DataFrame =
    serveDdCube(spark, sfDir, ddCubeDir(spark, sfDir))

  /** The appended-cube readout — shares [[serveDdCube]] verbatim and the
    * single-build form's oracle (additivity ⇒ identical fold). */
  def ddCubeIncremental(spark: SparkSession, sfDir: String): DataFrame =
    serveDdCube(spark, sfDir, ddCubeIncrDir(spark, sfDir))

  private def serveDdCube(spark: SparkSession, sfDir: String, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // merge: cell re-sum per (type, bucket) — the mergeable-summary step
    val merged = Tables.cachedScan(spark, dir)
      .select(col("event_type"), col("bucket"), col("c"),
        col("day").cast("long").as("day"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
    val ranked = merged
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
    def estAt(rankPred: org.apache.spark.sql.Column) =
      min(when(rankPred,
        lit(2.0) * pow(lit(DDGamma), col("bucket")) / lit(DDGamma + 1.0)))
    val served = ranked.groupBy("event_type")
      .agg(max(col("n")).as("n"),
        estAt(col("cum") * 2 >= col("n")).as("p50_est"),
        estAt(col("cum") * 100 >= col("n") * 95).as("p95_est"))
    val nDays = Tables.cachedScan(spark, dir)
      .groupBy("event_type").agg(countDistinct(col("day")).as("n_days"))
    // audit arm: exact nearest-rank quantiles from the raw table (for the
    // oracle and the verdicts; not part of the serving cost)
    val vals = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("c"))
    val vw = Window.partitionBy("event_type").orderBy("value")
    val vr = vals
      .withColumn("cum", sum(col("c")).over(vw))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
    val exact = vr.groupBy("event_type")
      .agg(min(when(col("cum") * 2 >= col("n"), col("value"))).as("p50_exact"),
        min(when(col("cum") * 100 >= col("n") * 95, col("value"))).as("p95_exact"))
    served.join(nDays, "event_type").join(exact, "event_type")
      .select(col("event_type"), col("n"), col("n_days"),
        round(col("p50_exact"), 6).as("p50_exact"),
        round(col("p95_exact"), 6).as("p95_exact"),
        (abs(col("p50_est") - col("p50_exact"))
          <= col("p50_exact") * lit(2 * DDAlpha)).as("p50_within_2pct"),
        (abs(col("p95_est") - col("p95_exact"))
          <= col("p95_exact") * lit(2 * DDAlpha)).as("p95_within_2pct"))
      .orderBy("event_type")
  }

  private val ddSignedMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** The signed value stream for the signed-domain sketch: per-event net
    * cents (purchase = +cents, error = −cents — maxDrawdown's oscillating
    * refund/chargeback stand-in at event grain), per user-parity×4
    * cohort. ~50% of values are negative at every SF, so the negative
    * store carries real mass and p05 reads off it. */
  private def signedFlows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "error"))
      .select((col("user_id") % 4).as("cohort"),
        expr("ts div 86400000000000").as("day"),
        when(col("event_type") === "purchase",
            expr("CAST(round(value * 100) AS BIGINT)"))
          .otherwise(expr("-CAST(round(value * 100) AS BIGINT)")).as("v"))

  /** SIGNED-DOMAIN DDSketch encode (VERDICT r12 ask #4) — the full Masson
    * construction: three stores keyed by `store` ∈ {−1, 0, +1}. Positive
    * values bucket as ⌈ln(v)/ln γ⌉ in the +1 store; negative values
    * MIRROR — the same log bucket of |v| in the −1 store; exact zeros
    * land in the zero bucket (store 0, bucket 0). Cells stay plain
    * counts, so signed cubes keep the exact-additivity property of the
    * positive form. Package-private so the spec can drive the kernel
    * over a zero-containing fixture (the corpus has no zero cents). */
  private[graft] def ddSignedCells(flows: DataFrame): DataFrame =
    flows.groupBy(col("cohort"), col("day"),
        when(col("v") > 0, 1).when(col("v") < 0, -1).otherwise(0).as("store"),
        when(col("v") === 0, 0L).otherwise(
          ceil(log(abs(col("v")).cast("double")) / lit(math.log(DDGamma)))
            .cast("long")).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Build-once path for the signed cube — same day-grain artifact
    * lifecycle as [[ddCubeDir]]. */
  private[graft] def ddSignedCubeDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, ddSignedMemo)
    ddSignedMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-dd-cube-signed")
      ddSignedCells(signedFlows(spark, sfDir))
        .write.mode("overwrite").parquet(dir)
      dir
    })
  }

  private val ddSignedIncrMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Day-partitioned APPEND twin of [[ddSignedCubeDir]] — the same
    * incremental lifecycle as the positive cube's ([[ddCubeIncrDir]]):
    * history written once partitioned by day, the last day appended into
    * its own partition; signed cells are plain counts, so additivity
    * makes the serve-time re-sum bit-identical to the single build and
    * both forms share one oracle. */
  private[graft] def ddSignedIncrDir(spark: SparkSession, sfDir: String): String = {
    SessionMemos.arm(spark, ddSignedIncrMemo)
    ddSignedIncrMemo.computeIfAbsent((spark, sfDir), _ => {
      val dir = SessionMemos.tempDir(spark, "graft-dd-signed-incr")
      val hist = graft.operators.Dedup.fence(
        ddSignedCells(signedFlows(spark, sfDir)), "day")
      try {
        val maxDay = hist.agg(max("day")).head.getLong(0)
        hist.filter(col("day") < maxDay)
          .write.partitionBy("day").mode("overwrite").parquet(dir)
        hist.filter(col("day") === maxDay)
          .write.partitionBy("day").mode("append").parquet(dir)
      } finally hist.unpersist()
      dir
    })
  }

  /** The appended signed-cube readout — shares [[serveDdCubeSigned]] and
    * the single-build form's oracle (additivity ⇒ identical fold). */
  def ddCubeSignedIncremental(spark: SparkSession, sfDir: String): DataFrame =
    serveDdCubeSigned(
      Tables.cachedScan(spark, ddSignedIncrDir(spark, sfDir))
        .select(col("cohort"), col("store"), col("bucket"), col("c"),
          col("day").cast("long").as("day")),
      signedFlows(spark, sfDir))

  /** Per-cohort p05/p50/p95 SERVED from the stored SIGNED log-bucket cube
    * — [[ddCubeServed]]'s bracket-oracle pattern extended to the full
    * signed construction. The global value order over cells is
    * (store ASC, store·bucket ASC): the negative store reads in
    * DESCENDING |v| (larger magnitude = more negative = earlier), the
    * zero bucket sits between the stores, the positive store ascends.
    * Estimates are sign-mirrored geometric midpoints store·2γᵇ/(γ+1)
    * (exactly 0 for the zero bucket). p05 lands deep in the negative
    * store, p95 in the positive one, p50 near the sign boundary — and
    * the 2α verdict still holds there because a cent has |v| ≥ 1: every
    * nonzero value's bucket lives in its own sign's store, so an IEEE
    * ln boundary flip moves one bucket WITHIN the store, never across
    * the sign. Exact companions are BIGINT cents (no rounding anywhere);
    * a zero exact quantile demands est = 0 exactly (the zero bucket's
    * midpoint), asserted by the spec's zero fixture.
    */
  def ddCubeSigned(spark: SparkSession, sfDir: String): DataFrame =
    serveDdCubeSigned(Tables.cachedScan(spark, ddSignedCubeDir(spark, sfDir)),
      signedFlows(spark, sfDir))

  private[graft] def serveDdCubeSigned(cells: DataFrame, flows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = cells
      .groupBy(col("cohort"), col("store"), col("bucket"))
      .agg(sum(col("c")).as("c"))
      .withColumn("skey", col("store") * col("bucket"))
    val w = Window.partitionBy("cohort").orderBy("store", "skey")
    val ranked = merged
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("cohort")))
      .withColumn("est", col("store").cast("double")
        * lit(2.0) * pow(lit(DDGamma), col("bucket")) / lit(DDGamma + 1.0))
    // est is monotone in the (store, skey) order, so min(when(pred, est))
    // is the first qualifying cell's estimate — same read-off as the
    // positive cube
    def estAt(rankPred: org.apache.spark.sql.Column) = min(when(rankPred, col("est")))
    val served = ranked.groupBy("cohort")
      .agg(max(col("n")).as("n"),
        estAt(col("cum") * 100 >= col("n") * 5).as("p05_est"),
        estAt(col("cum") * 2 >= col("n")).as("p50_est"),
        estAt(col("cum") * 100 >= col("n") * 95).as("p95_est"))
    val nDays = cells
      .groupBy("cohort").agg(countDistinct(col("day")).as("n_days"))
    val vals = flows.groupBy(col("cohort"), col("v")).agg(count(lit(1)).as("c"))
    val vw = Window.partitionBy("cohort").orderBy("v")
    val vr = vals
      .withColumn("cum", sum(col("c")).over(vw))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("cohort")))
    val exact = vr.groupBy("cohort")
      .agg(min(when(col("cum") * 100 >= col("n") * 5, col("v"))).as("p05_exact"),
        min(when(col("cum") * 2 >= col("n"), col("v"))).as("p50_exact"),
        min(when(col("cum") * 100 >= col("n") * 95, col("v"))).as("p95_exact"))
    def verdict(est: String, ex: String) =
      when(col(ex) === 0L, col(est) === 0.0)
        .otherwise(abs(col(est) - col(ex))
          <= abs(col(ex)).cast("double") * lit(2 * DDAlpha))
    served.join(nDays, "cohort").join(exact, "cohort")
      .select(col("cohort"), col("n"), col("n_days"),
        col("p05_exact"), col("p50_exact"), col("p95_exact"),
        verdict("p05_est", "p05_exact").as("p05_within_2pct"),
        verdict("p50_est", "p50_exact").as("p50_within_2pct"),
        verdict("p95_est", "p95_exact").as("p95_within_2pct"))
      .orderBy("cohort")
  }

  /** Per-group ordinary-least-squares trend (slope/intercept/R²) of order
    * value over time, computed from EXACT integer sufficient statistics:
    * x = epoch-day of o_orderdate, y = price cents, and the five sums
    * (Σx, Σy, Σx², Σxy, Σy²) accumulate as DECIMAL(38,0) — products are
    * formed in decimal BEFORE the sum, so nothing ever wraps a long
    * (an overflow would surface as NULL, not a wrong answer). The closed
    * forms then take ONE decimal→double cast per term and a fixed IEEE
    * op order, so the emitted doubles are bit-deterministic cross-engine:
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
    *   r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * This beats `regr_slope` et al. for portability (their streaming float
    * accumulation is engine-specific); AggregatesSpec cross-checks against
    * an independent driver-side least squares. One hash-agg over the fact
    * scan (map-side partial → 5 final rows); everything after the shuffle
    * is per-group scalar arithmetic. 100 TB shape: the shuffle carries
    * |groups|×7 cells per task — same contract as q1_agg.
    */
  def olsTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = Tables.orders(spark, sfDir).select(
      col("o_orderpriority"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast(dec).as("x"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").cast(dec).as("y"))
    val s = base.groupBy("o_orderpriority").agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x")).cast(dec).as("sx"),
      sum(col("y")).cast(dec).as("sy"),
      sum(col("x") * col("x")).cast(dec).as("sxx"),
      sum(col("x") * col("y")).cast(dec).as("sxy"),
      sum(col("y") * col("y")).cast(dec).as("syy"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    s.select(
        col("o_orderpriority"), col("n").cast("long").as("n"),
        d(col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        d(col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        d(col("sy") * col("sxx") - col("sx") * col("sxy")).as("inum"),
        d(col("n") * col("syy") - col("sy") * col("sy")).as("dyy"))
      .select(
        col("o_orderpriority"), col("n"),
        // a constant-x group (den = 0) has no defined trend — NULL in
        // BOTH engines (Spark's non-ANSI divide NULLs a zero divisor,
        // DuckDB emits inf/NaN, so the guard is the portability fix)
        round(when(col("den") =!= 0, col("num") / col("den")), 6)
          .as("slope_cents_per_day"),
        round(when(col("den") =!= 0, col("inum") / col("den")), 6)
          .as("intercept_cents"),
        round(when(col("den") =!= 0 && col("dyy") =!= 0,
          (col("num") * col("num")) / (col("den") * col("dyy"))), 6).as("r2"))
      .orderBy("o_orderpriority")
  }
}
