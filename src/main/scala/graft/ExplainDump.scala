package graft
import org.apache.spark.sql.SparkSession
/** Dev tool (r16): dump `explain("formatted")` for a comma-separated list
  * of registered queries into `<outDir>/<query>_<suffix>.txt` — the plan
  * evidence the optimization rounds commit under plans/r16/.
  * Usage: tools/run.sh graft.ExplainDump <sfDir> <outDir> <suffix> q1,q2,...
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args.take(4)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    list.split(",").foreach { q =>
      val plan =
        try SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case scala.util.control.NonFatal(e) => s"ERROR: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $q")
    }
    spark.stop()
  }
}
