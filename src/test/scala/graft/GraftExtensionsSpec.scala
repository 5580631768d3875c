package graft

import org.apache.spark.sql.functions._

/** The spark.sql.extensions entry point must make every graft extension
  * available with NO runtime registration calls — the shared test session
  * (SparkSpec) loads `graft.GraftExtensions` via config.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("injected SQL functions work without runtime registration") {
    assert(spark.sql("SELECT graft_dot(array(1D,2D), array(3D,4D)) d").head.getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT size(graft_shingle_hashes('a b c d')) n").head.getInt(0) == 2)
    assert(spark.sql(
      "SELECT size(graft_minhash_bands(graft_shingle_hashes('a b c d'))) n").head.getInt(0) == 16)
    assert(spark.sql(
      "SELECT graft_jaccard_sorted(array(1L,2L,3L), array(2L,3L,4L)) j").head.getDouble(0) == 0.5)
  }

  test("injected optimizer rule rewrites window top-k without experimental hooks") {
    Tables.events(spark, sf).createOrReplaceTempView("ev_ext")
    val df = spark.sql(
      """SELECT user_id, rn, event_id FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM ev_ext) t
        |WHERE rn <= 3""".stripMargin)
    assert(df.queryExecution.optimizedPlan.exists(_.isInstanceOf[graft.plans.GroupTopK]),
      s"expected GroupTopK in:\n${df.queryExecution.optimizedPlan}")
    // and the strategy plans it: the query actually runs
    assert(df.count() > 0)
  }
}
