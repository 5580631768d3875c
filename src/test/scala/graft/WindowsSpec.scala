package graft

import graft.operators.Windows
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {

  test("per-user top-k emits at most k rows per user with unique ranks") {
    val df = Windows.topKPerUser(spark, sf)
    val perUser = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct("rn").as("nd"))
    assert(perUser.filter(col("n") > 3 || col("n") =!= col("nd")).count() == 0)
  }

  test("running total tops out at each customer's full order total") {
    val df = Windows.runningTotal(spark, sf)
    val perCust = df.groupBy("o_custkey").agg(max("cum_total").as("got"))
    val want = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(sum("o_totalprice").as("want"))
    val bad = perCust.join(want, "o_custkey")
      .filter(abs(col("got") - col("want")) > 1e-4)
    assert(bad.count() == 0)
  }

  test("custom GroupTopK operator equals the window formulation") {
    val custom = Windows.topKPerUserCustom(spark, sf).collect().toSeq
    val window = Windows.topKPerUser(spark, sf)
      .select("user_id", "rn", "event_id", "value").collect().toSeq
    assert(custom == window)
  }

  test("distributed ntile equals the global-window ntile row-for-row") {
    val w = Windows.ntileBalance(spark, sf).collect().toSeq
    val d = Windows.ntileBalanceDist(spark, sf).collect().toSeq
    assert(d == w)
  }

  test("ntile quartiles are balanced within 1") {
    val df = Windows.ntileBalance(spark, sf)
    val sizes = df.groupBy("quartile").count().collect().map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
  }

  test("navigation funcs: first/third/last agree with a driver-side ordered walk") {
    import spark.implicits._
    val got = Windows.navFunctions(spark, sf)
      .select("event_id", "user_id", "first_v", "third_v", "last_v")
      .as[(Long, Long, Double, Option[Double], Double)].collect()
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byUser = events.groupBy(_._2).map { case (u, es) =>
      val ord = es.sortBy(e => (e._3, e._1)).map(_._4)
      u -> (r6(ord.head), if (ord.length >= 3) Some(r6(ord(2))) else None, r6(ord.last))
    }
    got.foreach { case (id, u, f, t, l) =>
      assert((f, t, l) == byUser(u), s"event $id user $u")
    }
  }

  test("twap equals the duration-weighted mean, recomputed driver-side") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, Long, Long, Long)].collect()
    val want = ev.groupBy(_._1).flatMap { case (u, g) =>
      val s = g.sortBy(e => (e._2, e._3))
      val iv = s.zip(s.tail).map { case (a, b) => (BigInt(a._4), BigInt(b._2 - a._2)) }
      val den = iv.map(_._2).sum
      if (iv.isEmpty || den == 0) None
      else {
        val num = iv.map { case (y, dt) => y * dt }.sum
        Some((u, iv.length.toLong,
          BigDecimal(num.toDouble / den.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toSeq.sortBy(_._1)
    val got = Windows.twapPerUser(spark, sf).as[(Long, Long, Double)].collect().toSeq
    assert(got.map(g => (g._1, g._2)) == want.map(w => (w._1, w._2)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) <= 1e-6 * (1 + math.abs(w._3)), s"user ${g._1}")
    }
  }

  test("period-over-period deltas telescope back to the daily series") {
    import spark.implicits._
    val got = Windows.periodOverPeriod(spark, sf)
      .as[(String, Long, Long, Option[Long], Option[Double])].collect()
    for ((_, rows) <- got.groupBy(_._1)) {
      val s = rows.sortBy(_._2)
      // first day has no predecessor; every later delta is exact
      assert(s.head._4.isEmpty && s.head._5.isEmpty)
      s.zip(s.tail).foreach { case (prev, cur) =>
        assert(cur._4.contains(cur._3 - prev._3))
        if (prev._3 == 0) assert(cur._5.isEmpty) // zero divisor → NULL
        else {
          val want = (cur._3 - prev._3).toDouble / prev._3.toDouble * 100
          assert(math.abs(cur._5.get - want) <= 5e-7 + 1e-9 * math.abs(want))
        }
      }
    }
    assert(got.nonEmpty)
  }

  test("gini equals the rank-weighted closed form, recomputed driver-side") {
    import spark.implicits._
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(String, Long)].collect()
    val got = Windows.giniRevenue(spark, sf).as[(String, Long, Double)].collect()
    for ((pri, n, gini) <- got) {
      val ys = rows.filter(_._1 == pri).map(r => BigInt(r._2)).sorted
      assert(n == ys.length)
      val s1 = ys.sum
      val s2 = ys.zipWithIndex.map { case (y, i) => y * (i + 1) }.sum
      val want = (BigDecimal(s2 * 2) / BigDecimal(s1 * n)
        - BigDecimal(n + 1) / BigDecimal(n)).toDouble
      assert(math.abs(gini - want) <= 1e-6 * (1 + math.abs(want)), s"$pri")
      assert(gini >= 0 && gini < 1)
    }
    assert(got.nonEmpty)
  }

  test("pareto abc classes follow the cumulative revenue share, recomputed driver-side") {
    import spark.implicits._
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, g) => k -> g.map(r => BigInt(r._2)).sum }
    val total = rev.values.sum
    var cum = BigInt(0)
    val want = rev.toSeq.sortBy { case (k, r) => (-r, k) }.map { case (k, r) =>
      cum += r
      k -> (if (cum * 100 <= total * 80) "A" else if (cum * 100 <= total * 95) "B" else "C")
    }.sortBy(_._1)
    val got = Windows.paretoAbc(spark, sf)
      .select("l_partkey", "abc_class").as[(Long, String)].collect().toSeq
    assert(got == want)
    assert(got.map(_._2).toSet == Set("A", "B", "C"))
  }

  test("twap and gini plan a single fact exchange (agg reuses the window clustering)") {
    // the 10.0x-at-rows+output shuffle measurement in SCALE.md, as a
    // mechanical plan assertion: HashPartitioning(user/priority) from the
    // window satisfies the following aggregate's distribution, so the
    // fact crosses the wire exactly once
    for ((name, df) <- Seq(
        "twap" -> Windows.twapPerUser(spark, sf),
        "gini" -> Windows.giniRevenue(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"$name: expected 1 shuffle, got $exchanges:\n$plan")
    }
  }

  test("gapfill emits a dense per-type hour grid with interior gaps interpolated") {
    import spark.implicits._
    val r = Windows.gapfillHourly(spark, sf)
      .as[(String, Long, Boolean, Double)].collect()
    assert(r.exists(_._3), "no gap was interpolated — fixture has no missing hours")
    for ((_, rows) <- r.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      val hours = sorted.map(_._2)
      // dense grid: every hour between the type's first and last, once
      assert(hours.distinct.length == hours.length)
      assert((hours.last - hours.head) / 3600 + 1 == hours.length)
      // grid edges are present hours by construction, never extrapolated
      assert(!sorted.head._3 && !sorted.last._3)
      // every interpolated point lies on the segment between its
      // bracketing present hours (recomputed from the emitted values)
      val present = sorted.filter(!_._3)
      for (g <- sorted.filter(_._3)) {
        val prev = present.takeWhile(_._2 < g._2).last
        val next = present.dropWhile(_._2 < g._2).head
        val f = (g._2 - prev._2).toDouble / (next._2 - prev._2).toDouble
        val want = prev._4 + (next._4 - prev._4) * f
        assert(math.abs(g._4 - want) < 1e-4, s"interp at ${g._2}: ${g._4} vs $want")
      }
    }
  }

  test("rfm quartile scores match a driver-side ntile replay") {
    import spark.implicits._
    val got = operators.Windows.rfmSegments(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    val cust = got.map(r => (r._1, r._2, r._3, r._4))
    // ntile(4) reference: SQL equal-fill — base size n/4, the n%4
    // remainder goes one-each to the LEADING buckets
    def ntile4(ordered: Seq[Long]): Map[Long, Long] = {
      val n = ordered.size
      val q = n / 4
      val rem = n % 4
      def bucket(i: Int): Long = {
        val big = (q + 1) * rem // rows covered by the enlarged buckets
        if (i < big) (i / (q + 1) + 1).toLong else ((i - big) / q + rem + 1).toLong
      }
      ordered.zipWithIndex.map { case (k, i) => k -> bucket(i) }.toMap
    }
    val r = ntile4(cust.sortBy(c => (-c._2, c._1)).map(_._1))
    val f = ntile4(cust.sortBy(c => (-c._3, c._1)).map(_._1))
    val m = ntile4(cust.sortBy(c => (-c._4, c._1)).map(_._1))
    got.foreach { row =>
      assert(row._5 == r(row._1) && row._6 == f(row._1) && row._7 == m(row._1),
        s"cust ${row._1}: got (${row._5},${row._6},${row._7})")
      assert(row._8 == s"${row._5}${row._6}${row._7}")
    }
    assert(got.map(_._5).distinct.sorted == Seq(1L, 2L, 3L, 4L))
  }

  test("seasonal naive backtest equals a driver-side lag-7 replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts_us")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .as[(String, java.sql.Date, Long)].collect()
      .map { case (t, d, c) => (t, d.toLocalDate, c) }
    val byKey = daily.map { case (t, d, c) => (t, d) -> c }.toMap
    val want = daily.flatMap { case (t, d, c) =>
      byKey.get((t, d.minusDays(7))).map(fc => (t, c - fc))
    }.groupBy(_._1).map { case (t, es) =>
      val n = es.length
      t -> (n.toLong,
        math.rint(es.map(e => math.abs(e._2)).sum.toDouble / n * 1e6) / 1e6,
        math.rint(es.map(_._2).sum.toDouble / n * 1e6) / 1e6)
    }
    val got = Windows.seasonalNaive(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (t, n, mae, bias) =>
      val (wn, wm, wb) = want(t)
      assert(n == wn && math.abs(mae - wm) < 1e-6 && math.abs(bias - wb) < 1e-6,
        s"$t: got ($n,$mae,$bias) want ($wn,$wm,$wb)")
    }
  }

  test("ewma equals a driver-side ordered fold bit-for-bit") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Double)].collect()
    val want = events.groupBy(_._1).map { case (u, es) =>
      val xs = es.sortBy(e => (e._2, e._3)).map(_._4)
      u -> (xs.length.toLong, xs.tail.foldLeft(xs.head)((acc, x) => 0.5 * x + 0.5 * acc))
    }
    val got = Windows.ewmaPerUser(spark, sf).as[(Long, Long, Double)].collect()
    assert(got.length == want.size)
    got.foreach { case (u, n, e) =>
      val (wn, we) = want(u)
      assert(n == wn && e == we, s"user $u: got ($n, $e) want ($wn, $we)")
    }
  }

  test("ewmaFold equals the list-based ewma bit-for-bit on real data") {
    import spark.implicits._
    val list = Windows.ewmaPerUser(spark, sf).as[(Long, Long, Double)].collect().toSeq
    val fold = Windows.ewmaFold(spark, sf).as[(Long, Long, Double)].collect().toSeq
    assert(fold == list, "O(1)-state fold diverged from the collect_list form")
    assert(fold.nonEmpty)
  }

  test("ewmaFold handles a hot user with a long event stream in O(1) state") {
    // one user emits 500k events; the list form would build a 500k-element
    // aggregation buffer — the fold kernel streams it with two scalars of
    // state. Expected EWMA is the driver-side seeded fold over the same
    // order; control users pin the boundary flush (first/last in stream,
    // single-event user).
    val hotVals = (0 until 500000).map(i => ((i * 37) % 101).toDouble / 7.0)
    val hot = hotVals.zipWithIndex.map { case (v, i) => (5L, 1000L + i, i.toLong, v) }
    val rows = Seq((1L, 10L, 0L, 2.5)) ++ hot ++
      Seq((9L, 1L, 0L, 4.0), (9L, 2L, 1L, 8.0))
    val got = Windows.ewmaFoldPartition(rows.iterator).toSeq
    val wantHot = hotVals.tail.foldLeft(hotVals.head)((acc, x) => 0.5 * x + 0.5 * acc)
    assert(got == Seq((1L, 1L, 2.5), (5L, 500000L, wantHot), (9L, 2L, 6.0)))
  }

  test("lag features replay driver-side: lags NULL where history is short, trailing window calendar-correct") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        org.apache.spark.sql.functions.expr("ts div 86400000000000").as("day"),
        org.apache.spark.sql.functions.expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).map { case ((u, d), rs) => (u, d, rs.map(_._3).sum) }
    val got = operators.Windows.lagFeatures(spark, sf).collect()
    val byUser = daily.groupBy(_._1).map { case (u, rs) => u -> rs.toSeq.sortBy(_._2) }
    got.foreach { r =>
      val (u, d) = (r.getLong(0), r.getLong(1))
      val hist = byUser(u)
      val idx = hist.indexWhere(_._2 == d)
      assert(r.getLong(2) == hist(idx)._3)
      def lagAt(k: Int) = if (idx >= k) Some(hist(idx - k)._3) else None
      assert(Option(if (r.isNullAt(3)) null else r.getLong(3)).asInstanceOf[Option[Any]]
        == lagAt(1).asInstanceOf[Option[Any]])
      assert(Option(if (r.isNullAt(4)) null else r.getLong(4)).asInstanceOf[Option[Any]]
        == lagAt(7).asInstanceOf[Option[Any]])
      // trailing window is CALENDAR days: gaps shrink the count
      val win = hist.filter(h => h._2 >= d - 6 && h._2 <= d)
      assert(r.getLong(5) == win.map(_._3).sum && r.getLong(6) == win.size.toLong)
    }
    // gaps exist somewhere, so row-frame vs range-frame is load-bearing
    assert(got.exists(r => r.getLong(6) < 7 && r.getLong(1) > byUser(r.getLong(0)).head._2 + 6))
  }

  test("sla compliance: ppm share replays; within-SLA never exceeds item count") {
    import spark.implicits._
    val got = operators.Windows.slaCompliance(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    val bdRows = operators.Windows.businessDays(spark, sf)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    got.foreach { case (p, n, within, ppm) =>
      assert(n == bdRows(p)) // same join cardinality as the lag readout
      assert(within <= n && ppm == within * 1000000L / n)
    }
    assert(got.exists(_._3 > 0) && got.exists(g => g._3 < g._2))
  }

  test("business days: closed form equals a day-by-day weekday count") {
    import spark.implicits._
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1970-01-01")))
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), datediff(col("l_shipdate"), lit("1970-01-01")))
      .as[(Long, Int)].collect()
    // independent reference: literally count weekdays day by day. SIGNED:
    // the synthetic ship dates are independent of order dates, so sd < od
    // occurs and the closed form H(b) − H(a) counts it negative (a
    // data-quality signal worth surfacing, not clamping away)
    def bd(a: Int, b: Int): Long =
      if (b >= a) (a + 1 to b).count(d => (d + 3) % 7 < 5).toLong
      else -(b + 1 to a).count(d => (d + 3) % 7 < 5).toLong
    val want = l.flatMap { case (k, sd) => o.get(k).map { case (p, od) => (p, bd(od, sd)) } }
      .groupBy(_._1).map { case (p, xs) =>
        val n = xs.length.toLong; val s = xs.map(_._2).sum
        (p, n, s, math.rint(s.toDouble / n * 1e6) / 1e6)
      }.toSeq.sortBy(_._1)
    val got = Windows.businessDays(spark, sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(g => (g._1, g._2, g._3)) == want.map(w => (w._1, w._2, w._3)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._4 - w._4) < 1e-9) }
  }

  test("top-k with ties: rank keeps whole tie groups; ties genuinely occur") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .as[(Long, Long)].collect()
      .groupBy(identity).map { case ((u, d), xs) => (u, d, xs.size.toLong) }.toSeq
    val want = daily.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(-_._3)
      val withRank = sorted.map { r => (r, 1L + sorted.count(_._3 > r._3)) }
      withRank.filter(_._2 <= 3).map { case ((_, d, n), rk) => (u, d, n, rk) }
    }.toSeq.sortBy(t => (t._1, t._4, t._2))
    val got = Windows.topKDaysWithTies(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // the WITH TIES semantics is genuinely exercised: some user keeps >3 days
    assert(got.groupBy(_._1).values.exists(_.size > 3))
  }

  test("max drawdown replays from a driver-side cumulative walk; drawdowns genuinely occur") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "error"))
      .select((col("user_id") % 4).as("cohort"),
        org.apache.spark.sql.functions.expr("ts div 86400000000000").as("day"),
        when(col("event_type") === "purchase",
          org.apache.spark.sql.functions.expr("CAST(round(value * 100) AS BIGINT)"))
          .otherwise(org.apache.spark.sql.functions.expr("-CAST(round(value * 100) AS BIGINT)"))
          .as("c"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).map { case ((t, d), rs) => (t, d, rs.map(_._3).sum) }
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      // running peak INCLUSIVE of the current day (day one's dd = 0), the
      // engine's max(cum) OVER rows-unbounded-preceding semantics
      var cum = 0L; var peak = Long.MinValue; var dd = -1L; var troughDay = 0L
      var finalCum = 0L
      rows.toSeq.sortBy(_._2).foreach { case (_, d, c) =>
        cum += c; finalCum = cum
        if (cum > peak) peak = cum
        if (peak - cum > dd) { dd = peak - cum; troughDay = d }
      }
      (t, rows.size.toLong, finalCum, dd, troughDay)
    }.toSeq.sortBy(_._1)
    val got = Windows.maxDrawdown(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // the statistic is NON-vacuous on this data: the signed net-flow walk
    // must actually draw down somewhere (review r11: the gross-revenue
    // grouping made dd identically 0 and verified nothing)
    assert(got.exists(_._4 > 0), "no drawdown anywhere — the fixture is degenerate again")
  }

  test("ohlc bars replay from a driver-side sort; invariants hold per bar") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select("event_type", "ts", "event_id", "value")
      .as[(String, Long, Long, Double)].collect()
      .map(e => (e._1, e._2 / 3600000000000L, e._2, e._3, math.rint(e._4 * 100).toLong))
    val want = events.groupBy(e => (e._1, e._2)).map { case ((t, h), es) =>
      // mapped tuple is (type, hour, ts, event_id, cents): _3/_4 = (ts,
      // event_id), matching the engine's struct min/max key order — NOT
      // (ts, value), which would replay a different open/close on a ts tie
      val s = es.sortBy(e => (e._3, e._4))
      (t, h, s.head._5, es.map(_._5).max, es.map(_._5).min, s.last._5, es.length.toLong)
    }.toSeq.sortBy(b => (b._1, b._2))
    val got = Windows.ohlcBars(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    got.foreach { case (_, _, o, h, l, c, v) =>
      assert(l <= o && o <= h && l <= c && c <= h && v >= 1)
    }
  }
}
