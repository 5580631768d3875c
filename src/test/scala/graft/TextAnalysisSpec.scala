package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tfidf emits at most 3 terms per doc, rank-ordered") {
    val t = TextAnalysis.tfidfTop3(spark, sf)
    val byDoc = t.groupBy("doc_id").agg(count(lit(1)).as("n"), max("rn").as("mx"))
    assert(byDoc.filter(col("n") > 3 || col("mx") > 3).count() == 0)
  }

  test("bigram total equals token count minus one per doc") {
    val total = TextAnalysis.bigramCounts(spark, sf).agg(sum("cnt")).head.getLong(0)
    val expected = Tables.documents(spark, sf)
      .select((size(split(col("text"), " ")) - 1).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(total == expected)
  }

  test("langid predicts a valid language for every doc") {
    val l = TextAnalysis.langId(spark, sf)
    assert(l.count() == Tables.documents(spark, sf).count())
    assert(l.filter(!col("pred_lang").isin("de", "en", "es", "fr", "zh")).count() == 0)
  }

  test("quality metrics are within their ranges") {
    val q = TextAnalysis.qualityScore(spark, sf)
    val bad = q.filter(
      col("ttr") < 0 || col("ttr") > 1
        || col("stop_ratio") < 0 || col("stop_ratio") > 1
        || col("quality") < 0 || col("quality") > 1)
    assert(bad.count() == 0)
  }

  test("fingerprints: equal texts get equal md5 and roll hashes") {
    val fp = TextAnalysis.fingerprints(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .groupBy("text")
      .agg(countDistinct("md5_fp").as("nm"), countDistinct("roll_fp").as("nr"))
    assert(fp.filter(col("nm") =!= 1 || col("nr") =!= 1).count() == 0)
  }

  test("whitespace and regex tokenizers agree on this corpus") {
    val t = TextAnalysis.tokenStats(spark, sf)
    assert(t.filter(col("n_ws_tokens") =!= col("n_re_tokens")).count() == 0)
  }

  test("repetition matches a driver-side sliding-window recount") {
    import spark.implicits._
    val want = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().map { case (id, text) =>
        val w = text.split(" ", -1)
        val grams =
          if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
        val (n, d) = (grams.size.toLong, grams.distinct.size.toLong)
        val frac = if (n > 0) BigDecimal(1.0 - d.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
        (id, n, d, frac)
      }.toSet
    val got = TextAnalysis.repetition(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("textrank top-20 matches an independent in-memory weighted PageRank") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf).select("text").as[String].collect()
    // independent graph build: positional bigrams, self-loops dropped,
    // symmetric weights
    val biCnt = texts.flatMap(_.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1)))).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val sym = scala.collection.mutable.Map.empty[(String, String), Long]
    biCnt.foreach { case ((a, b), w) =>
      if (a != b) {
        sym((a, b)) = sym.getOrElse((a, b), 0L) + w
        sym((b, a)) = sym.getOrElse((b, a), 0L) + w
      }
    }
    val wdeg = sym.toSeq.groupBy(_._1._1).map { case (s, es) => s -> es.map(_._2).sum }
    var rank: Map[String, Double] = wdeg.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to TextAnalysis.TextRankIters) {
      // same decimal-rounded contributions as the operator: exact sums,
      // ordering-independent
      val inbox = scala.collection.mutable.Map.empty[String, BigDecimal]
      sym.foreach { case ((src, dst), w) =>
        val c = BigDecimal(rank(src) * w / wdeg(src))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        inbox(dst) = inbox.getOrElse(dst, BigDecimal(0)) + c
      }
      rank = inbox.map { case (v, s) =>
        v -> (1.0 - TextAnalysis.TextRankD + TextAnalysis.TextRankD * s.toDouble)
      }.toMap
    }
    val want = rank.toSeq.map { case (w, r) =>
      (w, BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (w, s) => (-s, w) }.take(20)
    val got = TextAnalysis.textrank(spark, sf)
      .as[(String, Double)].collect().toSeq
    assert(got == want)
    // ranks must discriminate: top score strictly above the 20th
    assert(got.head._2 > got.last._2)
  }

  test("triangles: per-word counts match a brute-force in-memory enumeration") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf).select("text").as[String].collect()
    val edges = texts.flatMap(_.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1)))).filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap).toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val counts = scala.collection.mutable.Map.empty[String, Long]
    // edges hold u < v; requiring w > v makes each triangle u < v < w
    // enumerated exactly once (from its lexicographically-least edge)
    for ((u, v) <- edges; w <- adj(u) if w > v && adj(v).contains(w))
      Seq(u, v, w).foreach(x => counts(x) = counts.getOrElse(x, 0L) + 1)
    val want = counts.toSeq.sortBy(_._1)
    val got = TextAnalysis.triangles(spark, sf).as[(String, Long)].collect().toSeq
    assert(got == want)
    // the graph genuinely has triangles at this sf
    assert(got.map(_._2).sum > 0)
  }
}
