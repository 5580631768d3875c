package graft
import org.apache.spark.sql.SparkSession
/** Dev scratchpad — intentionally empty between investigations; see
  * Explain/ExplainOnly for the standing plan/timing tools. Probe results
  * worth keeping move into the docstring of the operator they informed
  * (e.g. the candidate counts in Dedup.ppjoinPairs, the r9 plan-growth
  * OOM fix in Dedup.connectedComponents, the r12 two-watermark micro-
  * batch probe in StreamingOps.watermarkedWindowsReplay, the r13
  * outer-join eviction-horizon probe in
  * StreamingOps.streamStreamOuterReplay — the terminal watermark is the
  * MIN of the two sides' own floor-ms maxima, not the corpus max).
  *
  * CURRENT INVESTIGATION (r16 optimization): decompose the per-query
  * fixed cost that dominates the 271-query bench tail (mean 0.34 s,
  * mean 5.5 jobs at sf0.1 where the largest table is 11 MB).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def rep(label: String, n: Int)(f: => Unit): Unit = {
      val xs = (1 to n).map(_ => ms(f))
      println(f"$label%-44s min ${xs.min}%8.1f ms  med ${xs.sorted.apply(n / 2)}%8.1f ms  max ${xs.max}%8.1f ms")
    }
    // session warm-up
    SparkEntry.entry(spark).count()
    spark.catalog.clearCache()

    // 1. per-job floor: a no-shuffle one-task action
    rep("job floor: spark.range(1).count", 20)(spark.range(1).count())
    // 2. shuffle job floor at 32 partitions
    rep("shuffle floor: range groupBy count", 10) {
      spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)).count().count()
    }
    // 3. parquet schema inference (fresh read each time)
    rep("read.parquet(lineitem) construction", 20) {
      spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    rep("read.schema(s).parquet(lineitem) constr", 20) {
      spark.read.schema(li).parquet(s"$sfDir/lineitem.parquet").schema
    }
    // 4. representative cheap query decomposition
    for (q <- Seq("q_filter_project", "q1_agg", "q_window_topk", "wordcount")) {
      val fn = SparkEntry.queries(q)
      rep(s"$q: construct only", 5)(fn(spark, sfDir))
      val df = fn(spark, sfDir)
      rep(s"$q: analyze+optimize (executedPlan)", 5) {
        fn(spark, sfDir).queryExecution.executedPlan
      }
      rep(s"$q: full count()", 5)(fn(spark, sfDir).count())
      rep(s"$q: re-count same DF (no re-plan)", 5)(df.count())
    }
    spark.stop()
  }
}
