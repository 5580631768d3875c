package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratchpad — intentionally empty between investigations; see
  * Explain/ExplainOnly for the standing plan/timing tools. Probe results
  * worth keeping move into the docstring of the operator they informed
  * (e.g. the candidate counts in Dedup.ppjoinPairs).
  *
  * Current probe: phase timing of incrementalSurvivors / jaccardPairs under
  * the constrained-heap regime that the driver bench appears to run in.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("warmup entry")(SparkEntry.entry(spark).count())
    spark.catalog.clearCache()

    import graft.operators.Dedup
    val ss = Tables.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), graft.functions.TextHashFunctions.shingleHashes(col("text")).as("hs"))
      .repartition(col("doc_id")).persist()
    t("shingle fence")(println("docs=" + ss.count()))
    // candidate generation only
    val bandsDf = ss.select(col("doc_id"), graft.functions.TextHashFunctions.minHashBands(col("hs")).as("bands"))
      .persist()
    t("bands")(println("bands=" + bandsDf.count()))
    def side(even: Boolean, idCol: String) =
      bandsDf.filter(if (even) col("doc_id") % 2 === 0 else col("doc_id") % 2 === 1)
        .select(col("doc_id").as(idCol), posexplode(col("bands")).as(Seq("band", "key")))
    val cand = side(false, "doc_new").join(side(true, "doc_old"), Seq("band", "key"))
      .select("doc_new", "doc_old").distinct()
    t("cand")(println("cand=" + cand.count()))
    val sn = ss.select(col("doc_id").as("doc_new"), col("hs").as("hsn"))
    val so = ss.select(col("doc_id").as("doc_old"), col("hs").as("hso"))
    val dupNew = cand.join(sn, "doc_new").join(so, "doc_old")
      .filter(graft.functions.TextHashFunctions.jaccardSorted(col("hsn"), col("hso")) >= Dedup.ShingleTau)
      .select("doc_new").distinct()
    t("verify")(println("dup=" + dupNew.count()))
    t("full incremental")(println("rows=" + Dedup.incrementalSurvivors(spark, sfDir).count()))
    spark.catalog.clearCache()
    t("jaccard full")(println("rows=" + Dedup.jaccardPairs(spark, sfDir).count()))
    spark.stop()
  }
}
