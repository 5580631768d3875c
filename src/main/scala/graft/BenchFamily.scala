package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time a query family at BOTH the tuning config (local[4]) and
  * the driver-bench config (local[32], shuffle.partitions=32) in one run.
  *
  * Exists because a plan can be config-bimodal: round 1's PPJoin prefix
  * index measured ~56 s at local[4] but 255 s at the bench's 32 partitions
  * (the corpus-wide window sort degraded with partition count), so a win
  * "verified" at one config shipped as a regression. Any near-dup tuning
  * claim must quote BOTH lines of this tool's output.
  *
  * Usage: tools/run.sh graft.BenchFamily [sfDir] [q1,q2,...]
  */
object BenchFamily {
  private val DefaultFamily = Seq(
    "q_neardup_jaccard", "q_neardup_ppjoin", "q_neardup_minhash",
    "q_neardup_simhash", "q_simhash")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val family =
      if (args.length > 1) args(1).split(",").toSeq else DefaultFamily
    for (cpus <- Seq(4, 32)) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try SparkEntry.entry(spark).count() catch { case _: Throwable => () } // warm-up
      spark.catalog.clearCache()
      val times = family.map { name =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count() catch { case _: Throwable => -1L }
        spark.catalog.clearCache()
        name -> (System.nanoTime() - t0) / 1e9
      }
      val qs = times.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
      println(s"""{"config":"local[$cpus]","sf":"$sfDir",$qs}""")
      spark.stop()
    }
  }
}
