package graft
import org.apache.spark.sql.SparkSession
/** Dev scratchpad — intentionally empty between investigations; see
  * Explain/ExplainOnly for the standing plan/timing tools. Probe results
  * worth keeping move into the docstring of the operator they informed
  * (e.g. the candidate counts in Dedup.ppjoinPairs).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"scratch: no active investigation (sfDir=$sfDir)")
    spark.stop()
  }
}
