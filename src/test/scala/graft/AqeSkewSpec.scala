package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling, end-to-end (VERDICT r11 ask #9): a planted
  * hot-key fixture where the runtime's skew-split must fire — proving the
  * engine's skew story does NOT depend on the hand salting of
  * `q_join_salted` (Relational.joinFactFactSalted). The salt remains the
  * portable fallback for engines/joins AQE can't rewrite (e.g. when one
  * side is already bucketed); this spec documents that for plain shuffled
  * joins Spark's own runtime re-plan absorbs the hot key.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a planted hot key: skew=true on the SMJ, result correct (VERDICT r11 ask #9)") {
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // sf-test-sized thresholds: the hot partition (~3 MB) must exceed
      // both the factor x median and the absolute byte floor
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one key owns 200k rows; 1000 control keys own 4 each — the
      // classic power-law shape a per-key shuffle partition chokes on
      val left = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("lv"))
        .union(spark.range(0, 4000).select((col("id") % 1000 + 1).as("k"), col("id").as("lv")))
      val right = spark.range(0, 1001).select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS frame (not a derived count plan) so its adaptive
      // plan finalizes and carries the runtime skew annotation
      assert(joined.collect().length == 204000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire on the planted hot key:\n$plan")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }
}
