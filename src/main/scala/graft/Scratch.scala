package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $label rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("registered_jaccardPairs")(graft.operators.Dedup.jaccardPairs(spark, sfDir).count())
    def sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), expr(
        """array_distinct(CASE WHEN size(w) >= 3
          |  THEN transform(sequence(1, size(w)-2),
          |         i -> concat_ws(' ', element_at(w,i), element_at(w,i+1), element_at(w,i+2)))
          |  ELSE w END)""".stripMargin).as("ts"))
    val ia = sh.select(col("doc_id").as("doc_a"), explode(col("ts")).as("s"))
    val ib = sh.select(col("doc_id").as("doc_b"), explode(col("ts")).as("s"))
    val overlap = ia.join(ib, "s").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    val za = sh.select(col("doc_id").as("doc_a"), size(col("ts")).as("na"))
    val zb = sh.select(col("doc_id").as("doc_b"), size(col("ts")).as("nb"))
    val full = overlap.join(broadcast(za), "doc_a").join(broadcast(zb), "doc_b")
      .withColumn("j", col("ni").cast("double") / (col("na") + col("nb") - col("ni")))
      .filter(col("j") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jac"))
      .orderBy("doc_a","doc_b")
    time("inline_nofence")(full.count())
    spark.stop()
  }
}
