package graft

import graft.plans.{GroupTopKExec, GroupTopKStrategy, TopKRewriteRule}
import org.apache.spark.sql.functions._

/** The optimizer rule must transparently swap the row_number idiom for the
  * bounded-heap operator without changing any result.
  */
class TopKRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    val prevRules = spark.experimental.extraOptimizations
    val prevStrats = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = prevRules :+ TopKRewriteRule
    if (!prevStrats.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies = prevStrats :+ GroupTopKStrategy
    try f finally {
      spark.experimental.extraOptimizations = prevRules
      spark.experimental.extraStrategies = prevStrats
    }
  }

  private def windowTopK = {
    Tables.events(spark, sf).createOrReplaceTempView("ev_topk")
    spark.sql(
      """SELECT user_id, rn, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM ev_topk) t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin)
  }

  test("rule rewrites the window idiom into GroupTopK") {
    withRule {
      // check the optimized logical plan: under AQE the physical tree is
      // wrapped in AdaptiveSparkPlanExec whose children don't traverse
      val plan = windowTopK.queryExecution.optimizedPlan
      assert(plan.exists(_.isInstanceOf[graft.plans.GroupTopK]),
        s"expected GroupTopK in:\n$plan")
    }
  }

  test("rewritten plan returns exactly the window results") {
    val baseline = windowTopK.collect().toSeq // no rule registered
    val rewritten = withRule(windowTopK.collect().toSeq)
    assert(rewritten == baseline)
  }

  test("rule leaves non-matching filters untouched") {
    withRule {
      // rank used with a lower bound — not a top-k; must stay a window
      Tables.events(spark, sf).createOrReplaceTempView("ev_topk")
      val df = spark.sql(
        """SELECT * FROM (
          |  SELECT user_id, event_id,
          |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
          |  FROM ev_topk) t
          |WHERE rn > 2""".stripMargin)
      assert(!df.queryExecution.optimizedPlan.exists(_.isInstanceOf[graft.plans.GroupTopK]))
      assert(df.count() > 0)
    }
  }
}
