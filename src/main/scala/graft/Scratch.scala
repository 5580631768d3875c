package graft
import org.apache.spark.sql.SparkSession
/** Dev scratchpad — intentionally empty between investigations; see
  * Explain/ExplainOnly for the standing plan/timing tools. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    println(s"graft scratch: Spark ${spark.version}")
    spark.stop()
  }
}
