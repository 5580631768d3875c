package graft

import graft.operators.Funnels
import org.apache.spark.sql.functions.col

class FunnelsSpec extends SparkSpec {

  private def eventRows(): Array[(Long, Long, String)] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select("user_id", "ts", "event_type")
      .as[(Long, Long, String)].collect()
  }

  test("funnel: stage counts match an independent per-user scan") {
    import spark.implicits._
    val got = Funnels.funnel(spark, sf)
      .as[(String, Int, Long)].collect().toSeq
    val byUser = eventRows().groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      val vTs = evs.filter(_._3 == "view").map(_._2).minOption
      val cTs = vTs.flatMap(v =>
        evs.filter(e => e._3 == "click" && e._2 > v).map(_._2).minOption)
      val pTs = cTs.flatMap(c =>
        evs.filter(e => e._3 == "purchase" && e._2 > c).map(_._2).minOption)
      if (vTs.isDefined) nv += 1
      if (cTs.isDefined) nc += 1
      if (pTs.isDefined) np += 1
    }
    assert(got == Seq(("view", 1, nv), ("click", 2, nc), ("purchase", 3, np)))
    // the funnel must actually narrow on this data — all-equal counts would
    // mean the strict-order constraint tested nothing
    assert(nv >= nc && nc >= np && np > 0)
    // the O(1)-state fold is the same query: identical rows
    val fold = Funnels.funnelFold(spark, sf)
      .as[(String, Int, Long)].collect().toSeq
    assert(fold == got)
  }

  test("funnelFold handles a hot user with a long event stream in O(1) state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one user emits 200k interleaved events (every view-click-purchase
    // cycle strictly ordered), plus two small control users; the list-based
    // funnel would build a 200k-element array for the hot user — the fold
    // streams it. Expected counts are hand-derivable: the hot user converts
    // fully, u2 stops at click, u3 never views.
    val hot = (0 until 200000).map { i =>
      val et = i % 3 match { case 0 => "view"; case 1 => "click"; case _ => "purchase" }
      (1L, 1000000L + i.toLong, et)
    }
    val controls = Seq(
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 15L, "error"),
      (3L, 10L, "click"), (3L, 20L, "purchase"))
    val df = (hot ++ controls).toDF("user_id", "ts", "event_type")
    // write through a temp view-free path: reuse the fold's kernel by
    // repartition + sortWithinPartitions + the same per-partition machine
    val partials = df
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_type")
      .as[(Long, Long, String)]
      .mapPartitions(it => Iterator.single(graft.operators.Funnels.foldPartition(it)))
      .toDF("nv", "nc", "np")
    val (nv, nc, np) = partials.agg(sum("nv"), sum("nc"), sum("np"))
      .as[(Long, Long, Long)].head()
    assert((nv, nc, np) == (2L, 2L, 1L))
  }

  test("transitions: matrix matches a per-user timeline recompute, totals conserve") {
    import spark.implicits._
    val got = Funnels.transitions(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    val rows = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val want = rows.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1)))
    }.toSeq.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sorted
    assert(got == want)
    // conservation: total transitions = total events - distinct users
    val nUsers = rows.map(_._1).distinct.length
    assert(got.map(_._3).sum == rows.length - nUsers)
  }

  test("anomaly z-score: flags match an independent two-pass recompute") {
    import spark.implicits._
    val got = Funnels.anomalyZscore(spark, sf)
      .as[(Long, String, Double, Double)].collect().toSeq
    val vals = Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect()
    val byType = vals.groupBy(_._2)
    val want = vals.flatMap { case (id, t, v) =>
      val g = byType(t).map(_._3)
      val n = g.length
      val mean = g.sum / n
      val variance = (g.map(x => x * x).sum - n * mean * mean) / (n - 1)
      val z = BigDecimal(((v - mean) / math.sqrt(variance)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (math.abs(z) >= 2.0) Some((id, t, v, z)) else None
    }.sortBy(_._1).toSeq
    // the recompute's plain double sums are order-sensitive where the
    // operator's decimal sums are exact, so compare z at 3 dp
    assert(got.size == want.size)
    got.zip(want).foreach { case ((gi, gt, gv, gz), (wi, wt, wv, wz)) =>
      assert(gi == wi && gt == wt && gv == wv && math.abs(gz - wz) < 5e-4)
    }
    assert(got.nonEmpty, "no outliers at all would mean the threshold tested nothing")
  }

  test("retention: cohort grid matches an independent recompute") {
    import spark.implicits._
    val got = Funnels.retention(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val nsDay = 86400000000000L
    val active = eventRows().map { case (u, ts, _) => (u, ts / nsDay) }.distinct
    val cohort = active.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
    val want = active
      .groupBy { case (u, day) => (cohort(u), day - cohort(u)) }
      .map { case (k, v) => (k._1, k._2, v.map(_._1).distinct.size.toLong) }
      .toSeq.sorted
    assert(got == want)
    // day-0 cohorts must cover every user exactly once
    assert(got.filter(_._2 == 0L).map(_._3).sum == cohort.size.toLong)
  }

  test("new vs returning split conserves daily actives and cohort totals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val active = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 86400000000000"))
      .distinct().as[(Long, Long)].collect()
    val first = active.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val got = Funnels.newVsReturning(spark, sf).as[(Long, Long, Long)].collect()
    for ((day, nu, ru) <- got) {
      val dayUsers = active.filter(_._2 == day).map(_._1)
      assert(nu == dayUsers.count(u => first(u) == day), s"day $day new")
      assert(ru == dayUsers.count(u => first(u) != day), s"day $day returning")
    }
    // every user is new exactly once
    assert(got.map(_._2).sum == first.size)
  }

  test("welch guards yield NULL on empty, single-sample and zero-variance arms") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows =
      // empty B arm
      Seq(("only_a", true, 100L), ("only_a", true, 200L), ("only_a", true, 300L)) ++
      // single-sample B arm (variance undefined)
      Seq(("one_b", true, 100L), ("one_b", true, 200L), ("one_b", false, 150L)) ++
      // both arms constant: pooled variance exactly zero
      Seq(("flat", true, 100L), ("flat", true, 100L),
        ("flat", false, 100L), ("flat", false, 100L)) ++
      // healthy control
      Seq(("ok", true, 100L), ("ok", true, 300L), ("ok", false, 150L), ("ok", false, 250L))
    val ev = rows.toDF("event_type", "va", "y")
      .select(col("event_type"), col("va"), col("y").cast("decimal(38,0)").as("y"))
    val got = operators.Funnels.welchOf(ev)
      .as[(String, Long, Long, Option[Double], Option[Double], Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("only_a")._5.isEmpty && got("only_a")._6.isEmpty && got("only_a")._7.isEmpty)
    assert(got("only_a")._4.contains(200.0)) // the populated arm's mean survives
    assert(got("one_b")._6.isEmpty, "n=1 arm must not produce a t statistic")
    assert(got("flat")._6.isEmpty, "zero pooled variance must not produce a t statistic")
    assert(got("ok")._6.nonEmpty && got("ok")._7.nonEmpty)
  }

  test("attribution models agree with a driver-side replay and conserve credit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[(Long, Long, String, Long)].collect()
    val look = 7L * 86400 * 1000000000L
    val convs = ev.filter(_._3 == "purchase")
    val touchLists = convs.map { c =>
      c._2 -> ev.filter(e => e._1 == c._1 && e._4 >= c._4 - look && e._4 < c._4)
        .sortBy(e => (e._4, e._2))
    }.filter(_._2.nonEmpty)
    val wantFirst = touchLists.groupBy(_._2.head._3).view.mapValues(_.size.toLong).toMap
    val wantLast = touchLists.groupBy(_._2.last._3).view.mapValues(_.size.toLong).toMap
    val wantLinear = touchLists.flatMap { case (_, ts) =>
      ts.map(t => t._3 -> (1000000L / ts.length))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Funnels.attribution(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    for ((t, nT, ppm, ft, lt) <- got) {
      assert(ppm == wantLinear(t), s"$t linear")
      assert(ft == wantFirst.getOrElse(t, 0L), s"$t first")
      assert(lt == wantLast.getOrElse(t, 0L), s"$t last")
      assert(nT == touchLists.map(_._2.count(_._3 == t)).sum)
    }
    // first/last conserve exactly one credit per attributed conversion;
    // linear conserves up to the dropped ppm remainders
    assert(got.map(_._4).sum == touchLists.size && got.map(_._5).sum == touchLists.size)
    val totalPpm = got.map(_._3).sum
    assert(totalPpm <= 1000000L * touchLists.size
      && totalPpm > 1000000L * touchLists.size - touchLists.map(_._2.size.toLong).sum)
  }

  test("cusum changepoint equals the integer argmax, recomputed driver-side") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts_sec div 3600"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val got = Funnels.cusumChangepoint(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    for ((t, nHours, cpSec, dev) <- got) {
      val hourly = rows.filter(_._1 == t).groupBy(_._2)
        .map { case (h, g) => h -> g.map(r => BigInt(r._3)).sum }
        .toSeq.sortBy(_._1)
      assert(nHours == hourly.length)
      val n = BigInt(hourly.length)
      val total = hourly.map(_._2).sum
      var p = BigInt(0)
      val devs = hourly.zipWithIndex.map { case ((h, x), i) =>
        p += x
        (h, (n * p - BigInt(i + 1) * total).abs)
      }
      val (wantH, wantD) = devs.maxBy { case (h, d) => (d, -h) }
      assert(cpSec == wantH * 3600 && BigInt(dev) == wantD, s"$t")
    }
    assert(got.nonEmpty)
  }

  test("ks statistic equals the max ECDF gap, recomputed driver-side") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val got = Funnels.ksTest(spark, sf)
      .as[(String, Long, Long, Double, Double, Boolean)].collect()
    for ((t, nA, nB, ks, crit, sig) <- got) {
      val g = rows.filter(_._1 == t)
      val (a, b) = g.partition(_._2 % 2 == 0)
      assert(nA == a.length && nB == b.length)
      val av = a.map(_._3); val bv = b.map(_._3)
      val ksWant = (av ++ bv).distinct.map { v =>
        math.abs(av.count(_ <= v).toDouble / nA - bv.count(_ <= v).toDouble / nB)
      }.max
      assert(math.abs(ks - ksWant) <= 1e-6 * (1 + ksWant), s"$t ks=$ks vs $ksWant")
      val critWant = 1.36 * math.sqrt((nA + nB).toDouble / (nA.toDouble * nB))
      assert(math.abs(crit - critWant) <= 1e-6 * (1 + critWant))
      assert(sig == (ks > crit))
    }
    assert(got.nonEmpty)
  }

  test("abtest welch matches an independent driver-side computation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val got = Funnels.abtestWelch(spark, sf)
      .as[(String, Long, Long, Double, Double, Double, Boolean)].collect()
    // the engine emits 4-dp-rounded stats, so compare on the rounding grid
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-4 * (1 + math.abs(b))
    for ((t, nA, nB, mA, mB, tw, sig) <- got) {
      val g = rows.filter(_._1 == t)
      val (a, b) = g.partition(_._2 % 2 == 0)
      assert(nA == a.length && nB == b.length)
      def stats(xs: Array[Long]) = {
        val n = xs.length.toDouble
        val m = xs.map(_.toDouble).sum / n
        val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
        (n, m, v)
      }
      val (na, ma, va) = stats(a.map(_._3)); val (nb, mb, vb) = stats(b.map(_._3))
      assert(close(mA, ma) && close(mB, mb), s"$t means")
      val twWant = (ma - mb) / math.sqrt(va / na + vb / nb)
      assert(close(tw, twWant), s"$t t=$tw vs $twWant")
      assert(sig == (math.abs(tw) >= 1.96))
    }
    assert(got.nonEmpty)
  }

  test("session paths equal a driver-side sessionize-and-fold replay") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[(Long, Long, String, Long)].collect()
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val sessions = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev != Long.MinValue && r._4 - prev >= operators.Funnels.SessionGapNs)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += r._3
        prev = r._4
      }
      sessions.map(s => (s.mkString(">"), s.length.toLong))
    }
    val want = paths.groupBy(_._1).map { case (p, ss) =>
      (p, ss.size.toLong, ss.map(_._2).sum)
    }.toSeq.sortBy(t => (-t._2, t._1)).take(20)
    val got = operators.Funnels.sessionPaths(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty && got.exists(_._1.contains(">"))) // multi-event paths exist
  }

  test("rolling dau/wau: trailing-7 distinct replayed driver-side, dau <= wau") {
    import spark.implicits._
    val ud = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.expr("ts div 86400000000000").as("day"),
        col("user_id"))
      .distinct().as[(Long, Long)].collect().toSet
    val days = ud.map(_._1)
    val want = days.toSeq.sorted.map { d =>
      val dau = ud.count(_._1 == d).toLong
      val wau = ud.filter(u => u._1 >= d - 6 && u._1 <= d).map(_._2).toSet.size.toLong
      (d, dau, wau, math.rint(dau.toDouble / wau * 1e6) / 1e6)
    }
    val got = operators.Funnels.rollingDau(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == want.map(r => (r._1, r._2, r._3)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._4 - w._4) < 1e-6) }
    got.foreach { case (_, dau, wau, s) => assert(dau <= wau && s > 0 && s <= 1) }
  }

  test("session stats: duration/depth quantiles replay from a driver-side sessionization") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val sessions = evs.values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val buf = scala.collection.mutable.ArrayBuffer[Vector[Long]]()
      sorted.foreach { r =>
        if (buf.isEmpty || r._3 - buf.last.last >= operators.Funnels.SessionGapNs)
          buf += Vector(r._3)
        else buf(buf.size - 1) = buf.last :+ r._3
      }
      buf.map(ts => (Math.floorDiv(ts.max - ts.min, 1000000000L), ts.size.toLong))
    }.toSeq
    def stats(vs: Seq[Long]): (Long, Long, Long) = {
      val s = vs.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s(n / 2), s(((95L * n + 99) / 100).toInt - 1), s.last)
    }
    val (d2, d95, dmax) = stats(sessions.map(_._1))
    val (e2, e95, emax) = stats(sessions.map(_._2))
    val row = operators.Funnels.sessionStats(spark, sf).collect().head
    assert(row.getLong(0) == sessions.size.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((d2, d95, dmax)))
    assert((row.getLong(4), row.getLong(5), row.getLong(6)) == ((e2, e95, emax)))
  }

  test("mann-whitney: U and z replay from driver-side midranks; U_a + U_b conserves") {
    import spark.implicits._
    val obs = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value"))
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2 % 2 == 0, math.rint(r._3 * 100).toLong))
    val got = operators.Funnels.mannWhitney(spark, sf).collect()
    got.foreach { r =>
      val t = r.getString(0)
      val ys = obs.filter(_._1 == t)
      val sorted = ys.map(_._3).sorted
      // midrank of value v (1-based, ties averaged)
      val rank = sorted.distinct.map { v =>
        val lt = sorted.count(_ < v); val c = sorted.count(_ == v)
        v -> (lt + (c + 1) / 2.0)
      }.toMap
      val na = ys.count(_._2).toLong; val nb = ys.count(!_._2).toLong
      val ra = ys.filter(_._2).map(y => rank(y._3)).sum
      val ua = ra - na * (na + 1) / 2.0
      assert((r.getLong(1), r.getLong(2)) == ((na, nb)))
      assert(math.abs(r.getDouble(3) - ua) < 1e-6, s"$t U")
      val z = (ua - na * nb / 2.0) /
        math.sqrt(na.toDouble * nb * (na + nb + 1.0) / 12.0)
      assert(math.abs(r.getDouble(4) - math.rint(z * 1e4) / 1e4) < 1e-9, s"$t z")
      // U_a + U_b = nA*nB — the rank-sum conservation identity
      val rb = ys.filterNot(_._2).map(y => rank(y._3)).sum
      val ub = rb - nb * (nb + 1) / 2.0
      assert(math.abs((ua + ub) - na.toDouble * nb) < 1e-6)
    }
  }

  test("funnel latency: quantiles replay from a driver-side min-chain over converters") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Long, String)].collect().groupBy(_._1)
    val lats = evs.values.flatMap { rows =>
      val v = rows.filter(_._3 == "view").map(_._2).minOption
      val c = v.flatMap(vn => rows.filter(r => r._3 == "click" && r._2 > vn).map(_._2).minOption)
      val p = c.flatMap(cn => rows.filter(r => r._3 == "purchase" && r._2 > cn).map(_._2).minOption)
      (v, p) match { case (Some(vn), Some(pn)) => Some(Math.floorDiv(pn - vn, 1000000000L)); case _ => None }
    }.toSeq.sorted
    val n = lats.length
    val row = operators.Funnels.funnelLatency(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == lats((n + 1) / 2 - 1) + lats(n / 2), "median lo+hi")
    assert(row.getLong(2) == lats(((95L * n + 99) / 100).toInt - 1), "p95 nearest rank")
    assert(row.getLong(3) == lats.last)
  }

  test("survival curve: life-table identities hold and counts replay from the min-chain") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)].collect()
    val maxDay = evs.map(_._2 / 86400000000000L).max
    // .toSeq BEFORE flatMap: flatMap on a Map with (k, d) tuple results
    // rebuilds a MAP keyed by k, silently collapsing users that share an
    // offset — the collection-law footgun, not a semantics choice
    val perUser = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val v = rows.filter(_._3 == "view").map(_._2).minOption
      v.map { vn =>
        val p = rows.filter(r => r._3 == "purchase" && r._4 > 90.0 && r._2 > vn)
          .map(_._2).minOption
        p match {
          case Some(pn) => (Math.floorDiv(pn - vn, 86400000000000L), 1L)
          case None => (maxDay - vn / 86400000000000L, 0L)
        }
      }
    }
    val want = perUser.groupBy(_._1).map { case (k, xs) =>
      (k, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }.toSeq.sortBy(_._1)
    val got = operators.Funnels.survivalCurve(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(g => (g._1, g._3, g._4)) == want)
    // at-risk identities: first row counts every entrant; at each k,
    // at_risk = events(>=k) + censored(>=k); monotone nonincreasing in k
    val entrants = perUser.size.toLong
    assert(got.map(g => g._3 + g._4).sum == entrants)
    assert(got.head._2 == entrants || got.map(_._2).max == entrants)
    got.foreach { case (k, ar, _, _) =>
      assert(ar == want.filter(_._1 >= k).map(w => w._2 + w._3).sum)
    }
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
    // both conversions and censorings genuinely occur (non-vacuous)
    assert(got.map(_._3).sum > 0 && got.map(_._4).sum > 0)
  }

  test("ltv cohort: cumulative revenue replays; cumulative is monotone per cohort") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        org.apache.spark.sql.functions.expr("ts div 86400000000000").as("day"),
        col("event_type"), col("value"))
      .as[(Long, Long, String, Double)].collect()
    val cohort = ev.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val cells = ev.filter(_._3 == "purchase")
      .groupBy(r => (cohort(r._1), r._2 - cohort(r._1)))
      .map { case ((cd, off), rs) =>
        (cd, off, rs.map(r => (r._1, r._2)).toSet.size.toLong,
          rs.map(r => math.rint(r._4 * 100).toLong).sum) }
      .toSeq.sortBy(t => (t._1, t._2))
    // n_user_days counts (user, day) revenue cells, not raw purchases
    val wantCells = ev.filter(_._3 == "purchase")
      .groupBy(r => (r._1, r._2)).keys.toSeq
      .groupBy(ud => (cohort(ud._1), ud._2 - cohort(ud._1)))
      .map { case (k, us) => k -> us.size.toLong }
    val got = operators.Funnels.ltvCohort(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(g => (g._1, g._2, g._4)) == cells.map(c => (c._1, c._2, c._4)))
    got.foreach(g => assert(g._3 == wantCells((g._1, g._2))))
    got.groupBy(_._1).values.foreach { rows =>
      val cums = rows.sortBy(_._2).map(_._5)
      assert(cums == cums.sorted, "cumulative revenue must be monotone")
      assert(cums.last == rows.map(_._4).sum)
    }
  }

  test("rolling dau incremental: stored day-partitioned artifact equals the scan-time build") {
    import spark.implicits._
    val full = operators.Funnels.rollingDau(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val inc = operators.Funnels.rollingDauIncremental(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(inc == full)
    // the artifact genuinely holds >1 day partition (prefix + appended day)
    val dir = operators.Funnels.dayUserStore(spark, sf)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("day="))
    assert(parts > 1)
  }

  test("rolling dau hll: union estimate within envelope, window grain replays") {
    import spark.implicits._
    val ud = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.expr("ts div 86400000000000").as("day"),
        col("user_id"))
      .distinct().as[(Long, Long)].collect().toSet
    val days = ud.map(_._1)
    val got = operators.Funnels.rollingDauHll(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == days.toSeq.sorted)
    got.foreach { case (d, nw, wau, ok) =>
      assert(nw == days.count(x => x >= d - 6 && x <= d).toLong)
      assert(wau == ud.filter(u => u._1 >= d - 6 && u._1 <= d).map(_._2).toSet.size.toLong)
      assert(ok) // the 10% bracket the oracle pins as TRUE
    }
  }

  test("wilson ci: interval brackets p, replays driver-side, pooled z consistent") {
    import spark.implicits._
    val conv = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
      .groupBy(_._1)
      .map { case (u, evs) => u -> evs.exists(e => e._2 == "purchase" && e._3 > 90.0) }
    val (na, xa) = (conv.count(_._1 % 2 == 0).toLong,
      conv.count(c => c._1 % 2 == 0 && c._2).toLong)
    val (nb, xb) = (conv.count(_._1 % 2 != 0).toLong,
      conv.count(c => c._1 % 2 != 0 && c._2).toLong)
    def wilson(x: Long, n: Long): (Double, Double, Double) = {
      val z = 1.96; val nd = n.toDouble; val p = x.toDouble / nd
      val den = 1.0 + z * z / nd
      val c = (p + z * z / (2.0 * nd)) / den
      val h = z * math.sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd)) / den
      def r6(v: Double) = math.rint(v * 1e6) / 1e6
      (r6(p), r6(c - h), r6(c + h))
    }
    val row = operators.Funnels.wilsonCi(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((na, xa)))
    assert((row.getLong(5), row.getLong(6)) == ((nb, xb)))
    val (pa, loA, hiA) = wilson(xa, na)
    val (pb, loB, hiB) = wilson(xb, nb)
    Seq(pa -> 2, loA -> 3, hiA -> 4, pb -> 7, loB -> 8, hiB -> 9).foreach {
      case (w, i) => assert(math.abs(row.getDouble(i) - w) < 1e-9)
    }
    // the interval brackets the point estimate and stays inside [0,1]
    assert(loA <= pa && pa <= hiA && loA >= 0 && hiA <= 1)
    assert(loB <= pb && pb <= hiB && loB >= 0 && hiB <= 1)
    val pp = (xa + xb).toDouble / (na + nb).toDouble
    val z = (xa.toDouble / na - xb.toDouble / nb) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getDouble(10) - math.rint(z * 1e4) / 1e4) < 1e-9)
    assert(row.getBoolean(11) == (math.abs(math.rint(z * 1e4) / 1e4) >= 1.96))
  }

  test("reach curve: cumulative distinct replays, monotone, ends at 100%") {
    import spark.implicits._
    val firstDay = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.expr("ts div 86400000000000").as("day"),
        col("user_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._2).map { case (_, evs) => evs.map(_._1).min }.toSeq
    val total = firstDay.size.toDouble
    val want = firstDay.groupBy(identity).toSeq.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (d, us)) =>
        (d, us.size.toLong, cum + us.size) }.drop(1)
      .map { case (d, nu, cum) => (d, nu, cum, math.rint(cum / total * 1e6) / 1e6) }
    val got = operators.Funnels.reachCurve(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == want.map(r => (r._1, r._2, r._3)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._4 - w._4) < 1e-9) }
    assert(got.map(_._3) == got.map(_._3).sorted) // monotone reach
    assert(got.last._4 == 1.0)
  }

  test("chi2: cells conserve totals and expected/contrib replay from marginals") {
    import spark.implicits._
    val got = Funnels.chi2Independence(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    val total = Tables.events(spark, sf).count()
    assert(got.map(_._3).sum == total)
    val rTot = got.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cTot = got.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    got.foreach { case (et, hb, o, e, c) =>
      val eRaw = (rTot(et) * cTot(hb)).toDouble / total.toDouble
      val cRaw = (o.toDouble - eRaw) * (o.toDouble - eRaw) / eRaw
      assert(e == math.rint(eRaw * 1e6) / 1e6 || math.abs(e - eRaw) < 5e-7)
      assert(c >= 0 && (c == math.rint(cRaw * 1e6) / 1e6 || math.abs(c - cRaw) < 5e-7))
    }
  }
}
