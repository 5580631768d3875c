package graft
import org.apache.spark.sql.SparkSession
/** Dev scratchpad — intentionally empty between investigations; see
  * Explain/ExplainOnly for the standing plan/timing tools.
  *
  * CURRENT INVESTIGATION (r16 optimization): warm min-of-3 timing for a
  * named query subset under the exact bench config — the per-family
  * verification loop between full bench runs.
  * Usage: tools/run.sh graft.Scratch [sfDir] q1,q2,...
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_agg", "wordcount")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count()
    spark.catalog.clearCache()
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(300)
      jobCount.set(0)
      fn(spark, sfDir).count()
      Thread.sleep(300)
      val jobs = jobCount.get()
      f""""$name":{"min":${secs.min}%.3f,"reps":[${secs.map(s => f"$s%.2f").mkString(",")}],"jobs":$jobs}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
