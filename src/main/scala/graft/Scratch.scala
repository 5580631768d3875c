package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratchpad — intentionally empty between investigations; see
  * Explain/ExplainOnly for the standing plan/timing tools. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextHashFunctions.shingleHashes
    val ss = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingleHashes(col("text")).as("hs")).cache()
    ss.count()
    val prefLen = (ceil(lit(0.2) * size(col("hs"))).cast("int") + lit(1))
    val pref = ss.select(col("doc_id"), explode(slice(col("hs"), lit(1), prefLen)).as("s"))
    val pa = pref.select(col("doc_id").as("doc_a"), col("s"))
    val pb = pref.select(col("doc_id").as("doc_b"), col("s"))
    val t0 = System.nanoTime()
    val nCand = pa.join(pb, "s").filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().count()
    println(f"hash-order prefix candidates: $nCand (${(System.nanoTime()-t0)/1e9}%.2f s)")
    // plain inverted-index candidate count for comparison
    val ia = ss.select(col("doc_id").as("doc_a"), explode(col("hs")).as("s"))
    val ib = ss.select(col("doc_id").as("doc_b"), explode(col("hs")).as("s"))
    val t1 = System.nanoTime()
    val nAll = ia.join(ib, "s").filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().count()
    println(f"inverted-index candidates:    $nAll (${(System.nanoTime()-t1)/1e9}%.2f s)")
    spark.stop()
  }
}
