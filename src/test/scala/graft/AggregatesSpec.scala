package graft

import graft.operators.Aggregates
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {

  test("rollup contains the grand-total row and it matches the detail sum") {
    val r = Aggregates.rollupRevenue(spark, sf)
    val grand = r.filter(col("nation") === "ALL" && col("oyear") === -1)
    assert(grand.count() == 1)
    val detailSum = r.filter(col("nation") =!= "ALL" && col("oyear") =!= -1)
      .agg(sum("n_items")).head.getLong(0)
    assert(grand.head.getAs[Long]("n_items") == detailSum)
  }

  test("cube has (status+1) x (priority+1) group combinations") {
    val c = Aggregates.cubeOrders(spark, sf)
    val statuses = Tables.orders(spark, sf).select("o_orderstatus").distinct().count()
    val priorities = Tables.orders(spark, sf).select("o_orderpriority").distinct().count()
    assert(c.count() == (statuses + 1) * (priorities + 1))
  }

  test("exact count distinct dominates the approximate one within 10%") {
    // raw-sketch bound, on the estimate itself (the registered query's
    // output carries only the portable exact + verdict columns)
    val exact = Aggregates.countDistinctUsers(spark, sf)
      .select("event_type", "n_users")
    val approx = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
    val joined = exact.join(approx, "event_type")
    val bad = joined.filter(
      abs(col("n_users") - col("approx_users")) > col("n_users") * 0.1)
    assert(bad.count() == 0)
    // the bracket-oracle verdicts the DuckDB twin pins to TRUE
    val q = Aggregates.approxDistinctUsers(spark, sf)
    assert(q.filter(!col("hll_within_10pct")).count() == 0)
  }

  test("min_by/max_by pick rows that exist in the source") {
    val m = Aggregates.minMaxBy(spark, sf)
    val evIds = Tables.events(spark, sf).select("event_id").collect().map(_.getLong(0)).toSet
    val picked = m.select("top_event_id").collect().map(_.getLong(0)).toSet
    assert(picked.subsetOf(evIds))
  }

  test("pivot counts sum to the per-user event totals") {
    import graft.operators.Aggregates
    import org.apache.spark.sql.functions._
    val p = Aggregates.pivotEventCounts(spark, sf)
    val total = p.select((col("n_click") + col("n_error") + col("n_purchase")
      + col("n_signup") + col("n_view")).as("n"), col("user_id"))
    val want = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("w"))
    assert(total.join(want, "user_id").filter(col("n") =!= col("w")).count() == 0)
  }

  test("approx percentiles bracket the exact quantiles") {
    import graft.operators.Aggregates
    import org.apache.spark.sql.functions._
    // raw-sketch bound, on the estimates themselves (the registered query
    // carries only the portable exact + rank-window verdict columns)
    val approx = Tables.events(spark, sf).groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(100)).as("p50_approx"),
        percentile_approx(col("value"), lit(0.95), lit(100)).as("p95_approx"))
    val exact = Tables.events(spark, sf).groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"), expr("percentile(value, 0.95)").as("p95"),
        min("value").as("lo"), max("value").as("hi"))
    val j = approx.join(exact, "event_type")
    // the sketch must stay within the value range and near the exact answer
    assert(j.filter(col("p50_approx") < col("lo") || col("p50_approx") > col("hi")).count() == 0)
    assert(j.filter(abs(col("p50_approx") - col("p50")) > (col("hi") - col("lo")) * 0.25).count() == 0)
    assert(j.filter(col("p95_approx") < col("p50_approx")).count() == 0)
    // the bracket-oracle verdicts the DuckDB twin pins to TRUE
    val q = Aggregates.approxPercentiles(spark, sf)
    assert(q.filter(!col("p50_in_rank_window") || !col("p95_in_rank_window")).count() == 0)
  }

  test("count-min sketch: never underestimates, exact absent collisions, mergeable") {
    import graft.operators.Aggregates
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Aggregates.cmsWordCounts(spark, sf)
    val rows = d.select("w", "est", "cnt", "overcount")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the CMS one-sided error guarantee, and internal consistency
    rows.foreach { case (w, est, cnt, over) =>
      assert(est >= cnt, s"word $w: CMS underestimated ($est < $cnt)")
      assert(over == est - cnt)
    }
    // exact count agrees with the plain word count query
    val wc = graft.operators.WordCount.wordCount(spark, sf)
      .as[(String, Long)].collect().toMap
    rows.foreach { case (w, _, cnt, _) => assert(cnt == wc(w), s"word $w") }
    // width 16 over this vocab must produce at least one real collision
    // (otherwise the estimate-vs-truth check is vacuous)
    assert(rows.exists(_._4 > 0))
    // mergeability: driver-side recompute — cell counts from disjoint doc
    // halves sum to the whole-corpus cells, so est over the merged sketch
    // equals the query's est
    val toks = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    def h(r: Int, w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$w".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % Aggregates.CmsWidth
    }
    def sketch(docs: Seq[(Long, String)]): Map[(Int, Long), Long] =
      docs.flatMap(_._2.split(" ", -1).toSeq)
        .flatMap(w => (0 until Aggregates.CmsDepth).map(r => (r, h(r, w))))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (even, odd) = toks.partition(_._1 % 2 == 0)
    val merged = (sketch(even).toSeq ++ sketch(odd).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(merged == sketch(toks.toSeq))
    rows.foreach { case (w, est, _, _) =>
      val want = (0 until Aggregates.CmsDepth).map(r => merged((r, h(r, w)))).min
      assert(est == want, s"word $w: est $est vs merged-sketch $want")
    }
  }

  test("histogram median equals the sort-based exact percentile; mode equals a full recompute") {
    import spark.implicits._
    val got = Aggregates.medianHist(spark, sf).as[(String, Double)].collect().toSeq
    // independent in-engine formulation: percentile() sorts the raw values
    // per group (the buffer-heavy route the histogram avoids)
    val want = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("k"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      .orderBy("k").as[(String, Double)].collect().toSeq
    assert(got == want)

    val gotMode = Aggregates.modeHist(spark, sf)
      .as[(String, Double, Long)].collect().toSeq
    val rows = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity")
      .as[(String, Double)].collect()
    val wantMode = rows.groupBy(_._1).toSeq.map { case (k, vs) =>
      val hist = vs.groupBy(_._2).map { case (v, g) => v -> g.size.toLong }
      val mc = hist.values.max
      // smallest value among tied maxima: the documented tie-break
      val mv = hist.filter(_._2 == mc).keys.min
      (k, mv, mc)
    }.sortBy(_._1)
    assert(gotMode == wantMode)
  }

  test("hll sketch cube: merged daily sketches estimate within tolerance over a multi-day grain") {
    val rows = Aggregates.hllCubeServed(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types)
    rows.foreach { r =>
      assert(r.getLong(1) > 1, s"${r.getString(0)}: cube grain must span multiple days")
      assert(r.getBoolean(3), s"${r.getString(0)}: merged estimate off by >10%")
    }
    // the grain matches the raw table's distinct days per type — the cube
    // is complete, not a sample
    val wantDays = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(to_date(col("ts_us"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == wantDays(r.getString(0))))
  }

  test("weighted median: lo+hi on cumulative weight equals the expanded-multiset median") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        org.apache.spark.sql.functions.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        org.apache.spark.sql.functions.expr("CAST(l_quantity AS BIGINT)"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val got = Aggregates.weightedMedian(spark, sf).collect()
    assert(got.length == rows.size)
    got.foreach { r =>
      // expand each value by its weight: the weighted median IS the plain
      // median of the expanded multiset
      val vs = rows(r.getString(0)).flatMap(t => Seq.fill(t._3.toInt)(t._2)).sorted
      val n = vs.length
      assert(r.getLong(1) == rows(r.getString(0)).map(_._3).sum)
      assert(r.getLong(2) == vs((n + 1) / 2 - 1) + vs(n / 2), s"${r.getString(0)}")
    }
  }

  test("iqr outliers: quartiles, fences and outlier mass replay from a driver-side sort") {
    import spark.implicits._
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)].collect().groupBy(_._1)
    val got = Aggregates.iqrOutliers(spark, sf).collect()
    assert(got.length == vals.size)
    got.foreach { r =>
      val s = vals(r.getString(0)).map(_._2).sorted
      val n = s.length
      def nr(q: Int) = s(((q.toLong * n + 3) / 4).toInt - 1) // smallest i: 4i >= q*n
      val (q1, q3) = (nr(1), nr(3))
      assert(r.getLong(1) == n.toLong)
      assert(r.getDouble(2) == q1 && r.getDouble(3) == q3)
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      assert(r.getDouble(4) == lo && r.getDouble(5) == hi)
      assert(r.getLong(6) == s.count(v => v < lo || v > hi).toLong)
    }
  }

  test("quantile cube: served percentiles equal a driver-side sorted replay; serve reads the artifact") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .select(col("event_type"),
        org.apache.spark.sql.functions.expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(String, Long)].collect().groupBy(_._1)
    val got = Aggregates.quantileCubeServed(spark, sf).collect()
    assert(got.length == vals.size)
    got.foreach { r =>
      val sorted = vals(r.getString(0)).map(_._2).sorted
      val n = sorted.length
      // histMedian's lo/hi interpolation, independently off the sorted list
      val lo = sorted((n + 1) / 2 - 1)
      val hi = sorted(n / 2)
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(3) == lo + hi, s"${r.getString(0)} median")
      // nearest-rank p95: smallest index i (1-based) with 100i >= 95n
      val p95 = sorted(((95L * n + 99) / 100).toInt - 1)
      assert(r.getLong(4) == p95, s"${r.getString(0)} p95")
    }
    // serving scans the stored cube, never the fact table
    val plan = Aggregates.quantileCubeServed(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-quantile-cube") && !plan.contains("events.parquet"))
  }

  test("quantile cube incremental: appended day-partitioned cells equal the single build") {
    val full = Aggregates.quantileCubeServed(spark, sf).collect().toSeq
    val incr = Aggregates.quantileCubeIncremental(spark, sf).collect().toSeq
    assert(incr == full)
    // the artifact genuinely holds >1 day partition (prefix + append)
    val dir = Aggregates.quantileCubeIncrDir(spark, sf)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("day="))
    assert(parts > 1)
  }

  test("dd cube: log-bucket sketch quantiles land within alpha of a driver-side replay (VERDICT r11 ask #7)") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").as[(String, Double)].collect().groupBy(_._1)
    val got = Aggregates.ddCubeServed(spark, sf).collect()
    assert(got.length == vals.size)
    got.foreach { r =>
      val t = r.getString(0)
      val sorted = vals(t).map(_._2).sorted
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      // exact companions replay by nearest rank
      val p50 = sorted(((n + 1) / 2) - 1)
      val p95 = sorted(((95L * n + 99) / 100).toInt - 1)
      assert(math.abs(r.getDouble(3) - math.rint(p50 * 1e6) / 1e6) < 1e-9, s"$t p50")
      assert(math.abs(r.getDouble(4) - math.rint(p95 * 1e6) / 1e6) < 1e-9, s"$t p95")
      // the verdicts hold — and re-derive the sketch estimate here to
      // bound the raw error at the DDSketch guarantee, not just 2alpha
      assert(r.getBoolean(5) && r.getBoolean(6), s"$t verdicts")
      def est(x: Double): Double = {
        val b = math.ceil(math.log(x) / math.log(Aggregates.DDGamma))
        2.0 * math.pow(Aggregates.DDGamma, b) / (Aggregates.DDGamma + 1.0)
      }
      assert(math.abs(est(p50) - p50) <= p50 * Aggregates.DDAlpha * 1.0001, s"$t p50 guarantee")
      assert(math.abs(est(p95) - p95) <= p95 * Aggregates.DDAlpha * 1.0001, s"$t p95 guarantee")
    }
    // serving reads the stored cube for the sketch arm; the raw scan in
    // the plan is the AUDIT arm only (exact companions for the oracle)
    val plan = Aggregates.ddCubeServed(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("graft-dd-cube"))
    // cell count is log(range)-bounded, far below the distinct-value count
    val cells = spark.read.parquet(Aggregates.ddCubeDir(spark, sf))
      .select("bucket").distinct().count()
    assert(cells < 1200, s"bucket count $cells not log-bounded")
  }

  test("dd cube signed: mirrored stores, zero bucket, and a driver replay of the read-off (r13)") {
    import spark.implicits._
    // kernel over a handcrafted zero-containing fixture (the corpus has
    // no zero cents): zeros land in (store 0, bucket 0), negatives
    // mirror their |v| bucket into store -1
    val fix = Seq(
      (0L, 0L, -1000L), (0L, 0L, -10L), (0L, 1L, 0L), (0L, 1L, 10L), (0L, 1L, 1000L),
      (1L, 0L, -7L), (1L, 0L, 0L), (1L, 1L, 0L), (1L, 1L, 7L))
      .toDF("cohort", "day", "v")
    // cells are (cohort, day, store, bucket) grain — fold out the day
    val cells = Aggregates.ddSignedCells(fix).collect()
      .groupBy(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
      .map { case (k, rs) => k -> rs.map(_.getLong(4)).sum }
    def bucket(x: Long): Long =
      math.ceil(math.log(x.toDouble) / math.log(Aggregates.DDGamma)).toLong
    assert(cells((0L, 0, 0L)) == 1L && cells((1L, 0, 0L)) == 2L, "zero bucket")
    assert(cells((0L, -1, bucket(1000))) == 1L && cells((0L, 1, bucket(1000))) == 1L,
      "negative values mirror the |v| bucket")
    // serve over the fixture: cohort 1's p50 is exactly 0 (rank 2 of
    // {-7, 0, 0, 7}), and the verdict demands est == 0 from the zero
    // bucket — the sign-boundary case the corpus never exercises
    val servedFix = Aggregates.serveDdCubeSigned(Aggregates.ddSignedCells(fix), fix)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(servedFix(1L).getLong(4) == 0L, "fixture p50 exact")
    assert(servedFix(1L).getBoolean(7), "zero-quantile verdict: est must be 0")
    assert(servedFix(0L).getLong(3) == -1000L && servedFix(0L).getLong(5) == 1000L)
    assert((3 to 5).forall(i => !servedFix(0L).isNullAt(i)))
    assert((6 to 8).forall(servedFix(0L).getBoolean), "fixture verdicts")
    // corpus replay: exact signed quantiles by nearest rank, all verdicts
    val flows = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "error"))
      .select((col("user_id") % 4).as("cohort"),
        when(col("event_type") === "purchase", expr("CAST(round(value*100) AS BIGINT)"))
          .otherwise(expr("-CAST(round(value*100) AS BIGINT)")).as("v"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val got = Aggregates.ddCubeSigned(spark, sf).collect()
    assert(got.length == flows.size)
    got.foreach { r =>
      val sorted = flows(r.getLong(0)).map(_._2).sorted
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      def rank(num: Long, den: Long): Long = sorted(((num * n + den - 1) / den).toInt - 1)
      assert(r.getLong(3) == rank(5, 100), s"cohort ${r.getLong(0)} p05")
      assert(r.getLong(4) == rank(1, 2), s"cohort ${r.getLong(0)} p50")
      assert(r.getLong(5) == rank(95, 100), s"cohort ${r.getLong(0)} p95")
      assert(r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8),
        s"cohort ${r.getLong(0)} verdicts")
      // the negative store is genuinely loaded
      assert(r.getLong(3) < 0, "p05 must read off the negative store")
    }
    // serving reads the stored signed cube
    val plan = Aggregates.ddCubeSigned(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("graft-dd-cube-signed"))
    // append lifecycle: the day-partitioned incremental twin folds
    // bit-identically to the single build (additive signed cells)
    val full = Aggregates.ddCubeSigned(spark, sf).collect().toSeq
    val incr = Aggregates.ddCubeSignedIncremental(spark, sf).collect().toSeq
    assert(incr == full, "appended signed cube diverged from the single build")
    val parts = new java.io.File(Aggregates.ddSignedIncrDir(spark, sf))
      .listFiles().count(_.getName.startsWith("day="))
    assert(parts > 1)
  }

  test("dd cube incremental: appended day-partitioned cells equal the single build") {
    val full = Aggregates.ddCubeServed(spark, sf).collect().toSeq
    val incr = Aggregates.ddCubeIncremental(spark, sf).collect().toSeq
    assert(incr == full)
    val dir = Aggregates.ddCubeIncrDir(spark, sf)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("day="))
    assert(parts > 1)
  }

  test("cms cube: per-source stored sketches merge to the scan-time sketch EXACTLY") {
    // cells are additive, so the cube-served estimates must be
    // bit-identical to q_cms_counts — the executed form of the
    // mergeability the CMS spec below asserts driver-side
    val served = Aggregates.cmsCubeServed(spark, sf)
      .select("w", "est", "cnt", "overcount").collect().toSeq
    val scan = Aggregates.cmsWordCounts(spark, sf).collect().toSeq
    assert(served == scan && served.nonEmpty)
    val grain = Aggregates.cmsCubeServed(spark, sf)
      .select("n_sources").head.getLong(0)
    assert(grain == Tables.documents(spark, sf)
      .select("source").distinct().count())
  }

  test("hll overlap: exact arithmetic replays driver-side, sets genuinely differ, envelope holds (r13)") {
    import spark.implicits._
    val r = Aggregates.hllOverlap(spark, sf).head()
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority"),
        year(col("o_orderdate")).as("y"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getInt(2)))
    val a = o.collect { case (k, p, _) if p == "1-URGENT" => k }.toSet
    val b = o.collect { case (k, _, y) if y == 1996 => k }.toSet
    assert(r.getLong(0) == a.size && r.getLong(1) == b.size)
    assert(r.getLong(2) == (a ++ b).size && r.getLong(3) == (a & b).size)
    assert(r.getLong(4) == (a & b).size.toLong * 1000000L / (a ++ b).size)
    assert(r.getBoolean(5), "inclusion-exclusion estimate outside the union envelope")
    // the audit is non-vacuous: the sets overlap AND differ
    assert((a & b).nonEmpty && a != b && (a -- b).nonEmpty && (b -- a).nonEmpty)
  }

  test("hll overlap sketch form: exact columns equal the audit form, verdict TRUE, NO Expand plans (r14)") {
    val sk = Aggregates.hllOverlapSketch(spark, sf)
    // the 100 TB shape: the three-way multi-distinct Expand is gone —
    // sketches are plain aggregates, exacts ride the unpivot
    // single-distinct construction (the profile_approx precedent)
    val physical = sk.queryExecution.executedPlan.toString
    assert(!physical.contains("Expand"),
      s"hllOverlapSketch planned an Expand multi-distinct:\n$physical")
    val got = sk.head()
    val audit = Aggregates.hllOverlap(spark, sf).head()
    // every exact column (all but the verdict) matches the Expand form
    assert(got.toSeq.dropRight(1) == audit.toSeq.dropRight(1))
    assert(got.getBoolean(5), "composed estimate outside the union envelope")
  }

  test("kmv distinct: estimate equals a pure-JVM replay exactly; heap node planned (r14)") {
    import spark.implicits._
    val q = Aggregates.kmvDistinct(spark, sf)
    // the rank window plans as the bounded-heap GroupTopK node — the
    // k·groups-state shape, never a per-type full sort
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("GroupTopK"),
      s"kmv k-minima did not plan the bounded-heap node:\n$physical")
    val got = q.as[(String, Long, Long, Long)].collect()
    // independent replay: JVM md5, top-60-bit hash, k smallest, estimator
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id").cast("string"))
      .as[(String, String)].collect().groupBy(_._1)
    assert(got.map(_._1).toSet == byType.keySet)
    got.foreach { case (t, nExact, est, errPpm) =>
      val hs = byType(t).map(_._2).distinct.map(h60).sorted
      assert(nExact == hs.length.toLong)
      val want =
        if (hs.length < Aggregates.KmvK) hs.length.toLong
        else ((BigInt(Aggregates.KmvK - 1) * (BigInt(1) << 60)) / hs(Aggregates.KmvK - 1)).toLong
      assert(est == want, s"$t: est $est vs replay $want")
      assert(errPpm == math.abs(est - nExact) * 1000000L / nExact)
      // the estimator is honest at k=64: within ~4 sigma of truth
      assert(errPpm <= 520000L, s"$t: err $errPpm ppm beyond the 4-sigma envelope")
    }
  }

  test("kmv cube: served merge equals the one-shot sketch; sketch arm reads only the stored synopses (r14)") {
    import spark.implicits._
    val served = Aggregates.kmvCubeServed(spark, sf)
    // the union-merge theorem in practice: served == one-shot, bit-for-bit
    val oneShot = Aggregates.kmvDistinct(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = served.as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == oneShot, "merged day synopses diverge from the one-shot KMV")
    // the SKETCH arm scans only the stored artifact (the exact
    // countDistinct companion is the audit arm and may scan the fact)
    val dir = Aggregates.kmvCubeDir(spark, sf)
    // AQE hides FileSourceScanExec pre-execution — read the relations off
    // the analyzed logical plan (the hll-cube test's idiom)
    val scans = served.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("graft-kmv-cube")),
      s"serving arm never read the synopsis store $dir: $scans")
    // synopsis store is grain-bounded: <= k rows per (type, day) cell
    val cells = spark.read.parquet(dir)
      .groupBy("event_type", "day").count().as[(String, Long, Long)].collect()
    assert(cells.nonEmpty && cells.forall(_._3 <= Aggregates.KmvK))
  }

  test("kmv sketch-only serve: estimates equal the audited form's; the PLAN never reads the fact table (r15)") {
    import spark.implicits._
    val sk = Aggregates.kmvCubeSketch(spark, sf)
    // the whole registered plan resolves to the synopsis store — unlike
    // q_kmv_cube there is no exact arm anywhere to excuse a fact scan
    val paths = sk.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(paths.nonEmpty && paths.forall(_.contains("graft-kmv-cube")),
      s"sketch-only serve read something beyond the synopsis store: $paths")
    val got = sk.as[(String, Long)].collect().sortBy(_._1).toSeq
    val audited = Aggregates.kmvDistinct(spark, sf)
      .select("event_type", "kmv_est").as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == audited, "sketch-only estimates diverge from the audited form")
  }

  test("kmv overlap: exact-regime identity, membership bounds, estimator sanity (r15)") {
    import spark.implicits._
    val rows = Aggregates.kmvOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ta, tb, nU, nI, eU, eI, jac, jacEst) =>
      assert(ta < tb, "pair not canonically ordered")
      assert(nI <= nU && eI <= eU, s"($ta,$tb): intersection exceeds union")
      assert(jac >= 0 && jac <= 1000000 && jacEst >= 0 && jacEst <= 1000000)
      // when the union sketch held the WHOLE union (nk < k ⇒ est == n),
      // the intersection count is exact too — the theta-rule degenerates
      // to set arithmetic and every estimate must equal its exact twin
      if (eU == nU && nU < Aggregates.KmvK)
        assert(eI == nI && jacEst == jac,
          s"($ta,$tb): exact-regime sketch disagrees with set arithmetic")
    }
  }

  test("kmv overlap store-only serve: estimates equal the audited form's; the PLAN never reads the fact table (r15)") {
    import spark.implicits._
    val sk = Aggregates.kmvOverlapSketch(spark, sf)
    val paths = sk.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(paths.nonEmpty && paths.forall(_.contains("graft-kmv-cube")),
      s"store-only overlap read something beyond the synopsis store: $paths")
    val got = sk.as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val audited = Aggregates.kmvOverlap(spark, sf)
      .select("type_a", "type_b", "union_est", "inter_est", "jaccard_est_ppm")
      .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == audited, "store-only overlap estimates diverge from the audited form")
  }

  test("hll sketch cube serving arm scans only the stored artifact, never the fact table") {
    // the serving arm (sketch read + union) must resolve to the cube dir;
    // the fact scan in the registered query belongs to the exact-audit
    // companion only
    val dir = Aggregates.hllCubeDir(spark, sf)
    val serving = spark.read.parquet(dir)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
    assert(serving.count() > 0)
    val paths = serving.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(paths.nonEmpty && paths.forall(_.contains("graft-hll-cube")))
  }

  test("mad equals the interpolated-median definition, recomputed driver-side") {
    import spark.implicits._
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)].collect()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val want = vals.groupBy(_._1).map { case (k, g) =>
      val vs = g.map(_._2).toSeq
      val med = median(vs)
      (k, med, median(vs.map(v => math.abs(v - med))))
    }.toSeq.sortBy(_._1)
    val got = Aggregates.madHist(spark, sf).as[(String, Double, Double)].collect().toSeq
    assert(got == want) // exact: the 0.5-step lattice is binary-representable
    assert(got.forall { case (_, med, mad) => mad >= 0 && mad <= med })
  }

  test("ols trend matches an independent driver-side least squares") {
    import spark.implicits._
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val got = Aggregates.olsTrend(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == rows.map(_._1).distinct.sorted.toSeq)
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-6 * (1 + math.abs(b))
    for ((pri, n, slope, icept, r2) <- got) {
      val g = rows.filter(_._1 == pri)
      assert(n == g.length)
      // independent formulation: centered double least squares
      val xs = g.map(_._2.toDouble); val ys = g.map(_._3.toDouble)
      val xm = xs.sum / n; val ym = ys.sum / n
      val sxy = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
      val sxx = xs.map(x => (x - xm) * (x - xm)).sum
      val syy = ys.map(y => (y - ym) * (y - ym)).sum
      assert(close(slope, sxy / sxx), s"$pri slope $slope vs ${sxy / sxx}")
      assert(close(icept, ym - (sxy / sxx) * xm), s"$pri intercept")
      assert(close(r2, (sxy * sxy) / (sxx * syy)), s"$pri r2")
      assert(r2 >= 0 && r2 <= 1)
    }
  }
}
