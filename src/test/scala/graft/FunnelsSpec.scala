package graft

import graft.operators.Funnels

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
}
