package graft

import graft.operators.Aggregates
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {

  test("rollup contains the grand-total row and it matches the detail sum") {
    val r = Aggregates.rollupRevenue(spark, sf)
    val grand = r.filter(col("nation") === "ALL" && col("oyear") === -1)
    assert(grand.count() == 1)
    val detailSum = r.filter(col("nation") =!= "ALL" && col("oyear") =!= -1)
      .agg(sum("n_items")).head.getLong(0)
    assert(grand.head.getAs[Long]("n_items") == detailSum)
  }

  test("cube has (status+1) x (priority+1) group combinations") {
    val c = Aggregates.cubeOrders(spark, sf)
    val statuses = Tables.orders(spark, sf).select("o_orderstatus").distinct().count()
    val priorities = Tables.orders(spark, sf).select("o_orderpriority").distinct().count()
    assert(c.count() == (statuses + 1) * (priorities + 1))
  }

  test("exact count distinct dominates the approximate one within 10%") {
    val exact = Aggregates.countDistinctUsers(spark, sf)
      .select("event_type", "n_users")
    val approx = Aggregates.approxDistinctUsers(spark, sf)
      .select(col("event_type"), col("approx_users"))
    val joined = exact.join(approx, "event_type")
    val bad = joined.filter(
      abs(col("n_users") - col("approx_users")) > col("n_users") * 0.1)
    assert(bad.count() == 0)
  }

  test("min_by/max_by pick rows that exist in the source") {
    val m = Aggregates.minMaxBy(spark, sf)
    val evIds = Tables.events(spark, sf).select("event_id").collect().map(_.getLong(0)).toSet
    val picked = m.select("top_event_id").collect().map(_.getLong(0)).toSet
    assert(picked.subsetOf(evIds))
  }

  test("pivot counts sum to the per-user event totals") {
    import graft.operators.Aggregates
    import org.apache.spark.sql.functions._
    val p = Aggregates.pivotEventCounts(spark, sf)
    val total = p.select((col("n_click") + col("n_error") + col("n_purchase")
      + col("n_signup") + col("n_view")).as("n"), col("user_id"))
    val want = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("w"))
    assert(total.join(want, "user_id").filter(col("n") =!= col("w")).count() == 0)
  }

  test("approx percentiles bracket the exact quantiles") {
    import graft.operators.Aggregates
    import org.apache.spark.sql.functions._
    val approx = Aggregates.approxPercentiles(spark, sf)
    val exact = Tables.events(spark, sf).groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"), expr("percentile(value, 0.95)").as("p95"),
        min("value").as("lo"), max("value").as("hi"))
    val j = approx.join(exact, "event_type")
    // the sketch must stay within the value range and near the exact answer
    assert(j.filter(col("p50_approx") < col("lo") || col("p50_approx") > col("hi")).count() == 0)
    assert(j.filter(abs(col("p50_approx") - col("p50")) > (col("hi") - col("lo")) * 0.25).count() == 0)
    assert(j.filter(col("p95_approx") < col("p50_approx")).count() == 0)
  }
}
