package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one un-timed warm-up query: codegen compiler, parquet readers and the
    // scheduler pay their one-time session costs here, not inside whichever
    // query happens to run first. NonFatal only — a dying JVM (OOM, stack
    // overflow) must fail the whole bench loudly rather than poison the
    // per-query numbers that follow it with a half-dead executor.
    try SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    spark.catalog.clearCache()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case scala.util.control.NonFatal(_) => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolate queries: drop per-query caches and collect garbage so one
      // allocation-heavy query doesn't tax its successors' timings
      spark.catalog.clearCache()
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // full per-query record → file: the driver captures only a 2000-char
    // stdout tail, and with 100+ queries the full line overflows it
    // (BENCH_r01–r04 all show "parsed": null for exactly this reason)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    println(line)
    // compact summary LAST so it lands complete inside the captured tail:
    // same shape, "queries" restricted to one stable headline per family
    // (BASELINE.md's metrics), plus the run-wide total and query count
    val headline = Seq("wordcount", "top10_words", "q1_agg", "q_star_join",
      "q_window_topk", "q_tumbling_1h", "q_dedup_exact", "q_cosine_topk",
      "q_neardup_minhash", "q_asof_join_custom", "q_ann_topk",
      "q_pipeline_curated")
    val hq = headline.flatMap(k => results.get(k).map(v => f""""$k":$v%.3f"""))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$hq,""" +
      s""""n_queries":${results.size},"detail":"bench_out.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
