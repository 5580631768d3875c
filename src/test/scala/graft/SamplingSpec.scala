package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("stratified sample is deterministic across runs and partitionings") {
    val a = Sampling.stratifiedSample(spark, sf).collect().toSeq
    val b = Sampling.stratifiedSample(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("stratified sample oversamples English ~3x by rate") {
    val docs = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n_total"))
    val samp = Sampling.stratifiedSample(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n_samp"))
    val rates = docs.join(samp, "lang")
      .select(col("lang"), (col("n_samp").cast("double") / col("n_total")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // md5 buckets are uniform: en targets 0.30, others 0.10 — allow wide
    // tolerance at the tiny test sf
    assert(rates("en") > 0.15 && rates("en") < 0.45, rates.toString)
    rates.filterNot(_._1 == "en").foreach { case (l, r) =>
      assert(r < rates("en"), s"$l rate $r not below en ${rates("en")}")
    }
  }

  test("sample keys stay within the hash bucket domain") {
    val bad = Sampling.stratifiedSample(spark, sf)
      .filter(col("sample_key") < 0 || col("sample_key") >= 1000000000L)
    assert(bad.count() == 0)
  }

  test("k-per-stratum draw returns at most k rows per language, ranked") {
    val k = 20
    val d = Sampling.sampleKPerStratum(spark, sf, k)
    val perLang = d.groupBy("lang").agg(count(lit(1)).as("n"), max("rn").as("mx"))
    assert(perLang.filter(col("n") > k || col("mx") > k).count() == 0)
    assert(d.filter(col("rn") < 1).count() == 0)
  }

  test("k-per-stratum members are the globally smallest hashes per stratum") {
    // re-derive the expected winners independently and compare sets
    val k = 20
    val hashed = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 1000000000L).as("h"))
    import spark.implicits._
    val want = hashed.as[(String, Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(k).map(r => (lang, r._2))
      }.toSet
    val got = Sampling.sampleKPerStratum(spark, sf, k)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got == want)
  }

  test("source mix covers every (source, lang) cell with exact doc counts") {
    import spark.implicits._
    val mix = Sampling.sourceMix(spark, sf)
    val want = Tables.documents(spark, sf)
      .groupBy("source", "lang").count()
      .as[(String, String, Long)].collect().toSet
    val got = mix.select("source", "lang", "n_docs")
      .as[(String, String, Long)].collect().toSet
    assert(got == want)
    assert(mix.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("mixture rebalance thins over-represented sources toward uniform") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val nTotal = docs.count()
    val srcCounts = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val nSources = srcCounts.size
    val kept = Sampling.mixtureRebalance(spark, sf)
    // every kept doc passes its source's exact integer rate; recompute
    val rates = srcCounts.map { case (s, n) =>
      s -> math.min(1000000000L, nTotal * 1000000000L / (nSources * n))
    }
    val keptBySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    srcCounts.foreach { case (s, n) =>
      val r = rates(s)
      if (r == 1000000000L) // under-represented: keeps everything
        assert(keptBySrc.getOrElse(s, 0L) == n, s"source $s should keep all")
      else { // thinned: realized fraction tracks rate/1e9 (wide tolerance at test sf)
        val frac = keptBySrc.getOrElse(s, 0L).toDouble / n
        assert(frac < 1.0, s"source $s not thinned")
      }
    }
    // determinism
    assert(kept.collect().toSeq == Sampling.mixtureRebalance(spark, sf).collect().toSeq)
  }

  test("mixture rebalance broadcasts the rate table onto the doc scan") {
    // the rate side is |sources| rows — the doc side must pick it up via
    // broadcast, never co-shuffle the corpus against it
    val df = Sampling.mixtureRebalance(spark, sf)
    df.collect() // finalize any adaptive plan before inspecting
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side sort-merge join in:\n$plan")
  }

  test("train/val/test split is a total disjoint partition, ~98/1/1") {
    import spark.implicits._
    val d = Sampling.trainValTest(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(d.count() == n) // total: every doc assigned exactly once
    val bySplit = d.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // train dominates; val/test are small (wide tolerance at tiny sf)
    assert(bySplit("train") > n * 9 / 10)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) < n / 10)
    // deterministic across runs
    assert(d.collect().toSeq == Sampling.trainValTest(spark, sf).collect().toSeq)
  }

  test("importance sample admits exactly the docs under their length rate") {
    import spark.implicits._
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 1000000000L).as("h"))
      .as[(Long, Long, Long)].collect()
      .collect { case (id, n, h) if h < math.min(n, 200L) * 2500000L => id }
      .toSet
    val got = Sampling.importanceSample(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
    // determinism across invocations
    assert(got == Sampling.importanceSample(spark, sf)
      .select("doc_id").as[Long].collect().toSet)
  }

  test("temperature mixing flattens shares: min source keeps all, kept counts between sqrt-prop and raw") {
    import spark.implicits._
    val rows = Sampling.mixtureTemperature(spark, sf)
      .select("source", "n_src", "rate", "n_kept")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val minSrc = rows.minBy(_._2)
    // the smallest source's rate is exactly 1e9 (sqrt(min/min) = 1): keeps everything
    assert(minSrc._3 == 1000000000L && minSrc._4 == minSrc._2)
    rows.foreach { case (s, nSrc, rate, kept) =>
      // rate = floor(1e9 * sqrt(min/n)) recomputed driver-side
      val want = math.floor(1e9 * math.sqrt(minSrc._2.toDouble / nSrc.toDouble)).toLong
      assert(rate == want, s"source $s")
      assert(kept <= nSrc)
      // kept share converges on sqrt flattening; at tiny sf just demand
      // over-represented sources were genuinely thinned
      if (nSrc > minSrc._2 * 2) assert(kept < nSrc, s"source $s not thinned")
    }
    // membership is exactly the hash-under-rate predicate (spot: recompute)
    val kept = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 1000000000L).as("h"))
      .as[(String, Long, Long)].collect()
    val rateBySrc = rows.map(r => r._1 -> r._3).toMap
    val wantKept = kept.groupBy(_._1).map { case (s, ds) =>
      s -> ds.count(_._3 < rateBySrc(s)).toLong
    }
    rows.foreach { case (s, _, _, k) => assert(k == wantKept(s), s"source $s") }
  }

  test("deterministic shuffle: a real permutation with dense per-shard positions") {
    import spark.implicits._
    val d = Sampling.deterministicShuffle(spark, sf)
    val rows = d.select("shard", "pos", "doc_id").as[(Long, Long, Long)].collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n)
    assert(rows.map(_._3).distinct.length == n) // every doc exactly once
    assert(rows.forall(r => r._1 >= 0 && r._1 < Sampling.NumShards))
    rows.groupBy(_._1).foreach { case (s, rs) => // positions are 1..k, no gaps
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"shard $s")
    }
    // rerun-stable, and genuinely shuffled (not doc_id order) within a shard
    assert(d.collect().toSeq ==
      Sampling.deterministicShuffle(spark, sf).collect().toSeq)
    val shard0 = rows.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq
    assert(shard0 != shard0.sorted)
  }

  test("shard manifest fingerprints the exact q_shuffle_det training order") {
    import spark.implicits._
    val m = Sampling.shardManifest(spark, sf)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val order = Sampling.deterministicShuffle(spark, sf)
      .select("shard", "pos", "doc_id").as[(Long, Long, Long)].collect()
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    order.groupBy(_._1).foreach { case (shard, rs) =>
      val (_, nDocs, _, fp) = m(shard)
      assert(nDocs == rs.length.toLong)
      assert(fp == md5(rs.sortBy(_._2).map(_._3).mkString(",")), s"shard $shard")
    }
    // token totals conserve: sum over shards = corpus token count
    val total = Sampling.shardManifest(spark, sf).agg(sum("n_tokens")).head.getLong(0)
    val want = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(total == want)
  }

  test("token budget: greedy prefix replays driver-side; exactly one straddler allowed per lang") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val budget = 10000L
    val want = docs.map { case (lang, ds) =>
      var cum = 0L
      val kept = ds.sortBy(_._2).takeWhile { d => val before = cum; cum += d._3; before <= budget }
      (lang, kept.length.toLong, kept.map(_._3).sum, kept.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = operators.Sampling.tokenBudget(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    got.foreach { case (lang, nDocs, toks, _) =>
      // at most one straddler: tokens minus the last doc fit the budget
      val lastTok = docs(lang).sortBy(_._2).take(nDocs.toInt).last._3
      assert(toks - lastTok <= budget)
    }
    // the cut genuinely bites somewhere (a lang smaller than the budget
    // keeps everything — correct, but the operator must be non-vacuous)
    assert(got.exists { case (lang, nDocs, _, _) => nDocs < docs(lang).size },
      "budget never bit — fixture degenerate")
  }
}
