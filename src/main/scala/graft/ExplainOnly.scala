package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump a query's formatted plan without executing it. */
object ExplainOnly {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, if (args.length > 1) args(1) else "/root/testdata/sf0.01")
      .explain("formatted")
    spark.stop()
  }
}
