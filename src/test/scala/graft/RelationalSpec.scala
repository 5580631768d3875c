package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("semi and anti joins partition the customer table") {
    val semi = Relational.semiJoin(spark, sf).count()
    val anti = Relational.antiJoin(spark, sf).count()
    val all = Tables.customer(spark, sf).count()
    assert(semi + anti == all)
  }

  test("full outer join covers both inputs' nation keys") {
    val fo = Relational.fullOuterJoin(spark, sf)
    val keys = fo.select("nationkey").collect().map(_.getLong(0)).toSet
    val custKeys = Tables.customer(spark, sf).filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val suppKeys = Tables.supplier(spark, sf).filter(col("s_acctbal") > 5000)
      .select(col("s_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(keys == custKeys.union(suppKeys))
  }

  test("left outer join keeps every order exactly once") {
    val lo = Relational.leftOuterJoin(spark, sf)
    assert(lo.count() == Tables.orders(spark, sf).count())
  }

  test("as-of join: prev_click_us is monotone per user and never after the purchase") {
    val asof = Relational.asOfJoin(spark, sf)
    val bad = asof.filter(col("prev_click_us") =!= -1)
      .join(Tables.events(spark, sf).select(col("event_id"), col("ts")), "event_id")
      .filter(col("prev_click_us") > col("ts") / 1000)
    assert(bad.count() == 0)
  }

  test("native as-of join equals the window composition row-for-row") {
    val window = Relational.asOfJoin(spark, sf).collect().toSeq
    val custom = Relational.asOfJoinCustom(spark, sf).collect().toSeq
    assert(custom == window)
  }

  test("native as-of join plans one pass: no window, no nested loop") {
    val plan = Relational.asOfJoinCustom(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("banded theta join matches the broadcast nested-loop form row-for-row") {
    val nl = Relational.thetaJoin(spark, sf).collect().toSeq
    val banded = Relational.thetaJoinBanded(spark, sf).collect().toSeq
    assert(nl == banded)
  }

  test("banded theta join plan has no nested-loop and no growing broadcast") {
    val plan = Relational.thetaJoinBanded(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dsum is exact: matches decimal sum on a known frame") {
    import spark.implicits._
    val df = Seq(0.1, 0.2, 0.3, 1e9, -1e9).toDF("x")
    val got = df.agg(Relational.dsum(col("x"))).head.getDouble(0)
    assert(math.abs(got - 0.6) < 1e-12)
  }
}
