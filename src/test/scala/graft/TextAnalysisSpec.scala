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
}
