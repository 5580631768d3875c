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
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    t("warmup entry")(SparkEntry.entry(spark).count())
    spark.stop()
  }
}
