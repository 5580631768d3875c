package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.operators.MaterializedView

/** MvRewriteRule / MaterializedView: the aggregate-rewrite lifecycle.
  * Covers the positive path (marked scan + registered cube → cube-only
  * plan, bit-identical results), the opt-in marker (unmarked scans never
  * rewrite even with an MV registered), and the all-or-nothing guards
  * (unregistered measure, non-dim filter → plan untouched, answer still
  * correct from the fact).
  */
class MvRewriteSpec extends SparkSpec {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def marked = spark.read.option("graft.mv", "true")
    .parquet(s"$sf/lineitem.parquet")
  private def unmarked = spark.read.parquet(s"$sf/lineitem.parquet")

  private def reportingAgg(fact: DataFrame): DataFrame =
    fact.filter(year(col("l_shipdate")) >= lit(1996))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("q"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  test("marked reporting aggregate is rewritten onto the cube and bit-identical") {
    val dir = MaterializedView.cubeDir(spark, sf)
    val served = reportingAgg(marked)
    val paths = scanPaths(served)
    assert(paths.exists(_.contains(dir)), s"expected cube scan, got $paths")
    assert(!paths.exists(_.contains("lineitem.parquet")), s"fact still scanned: $paths")
    val direct = reportingAgg(unmarked)
    assert(scanPaths(direct).exists(_.contains("lineitem.parquet")))
    assert(served.collect().toSeq == direct.collect().toSeq)
  }

  test("coarser grain and count(*)-only aggregates also serve from the cube") {
    val dir = MaterializedView.cubeDir(spark, sf)
    val global = marked.groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n")).orderBy("l_linestatus")
    assert(scanPaths(global).exists(_.contains(dir)))
    val expect = unmarked.groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n")).orderBy("l_linestatus")
    assert(global.collect().toSeq == expect.collect().toSeq)
  }

  test("unmarked scans never rewrite even with the MV registered") {
    MaterializedView.cubeDir(spark, sf)
    val df = reportingAgg(unmarked)
    assert(scanPaths(df).exists(_.contains("lineitem.parquet")))
  }

  test("unregistered measure bails out: plan untouched, answer from the fact") {
    MaterializedView.cubeDir(spark, sf)
    val df = marked.groupBy(col("l_returnflag"))
      .agg(sum(col("l_tax").cast("decimal(18,6)")).as("t"))
      .orderBy("l_returnflag")
    assert(scanPaths(df).exists(_.contains("lineitem.parquet")))
    val expect = unmarked.groupBy(col("l_returnflag"))
      .agg(sum(col("l_tax").cast("decimal(18,6)")).as("t"))
      .orderBy("l_returnflag")
    assert(df.collect().toSeq == expect.collect().toSeq)
  }

  test("filter on a non-dim column bails out") {
    MaterializedView.cubeDir(spark, sf)
    val df = marked.filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).orderBy("l_returnflag")
    assert(scanPaths(df).exists(_.contains("lineitem.parquet")))
    val expect = unmarked.filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).orderBy("l_returnflag")
    assert(df.collect().toSeq == expect.collect().toSeq)
  }

  test("incremental segment fold equals the single-build cube bit-for-bit") {
    val full = MaterializedView.mvCube(spark, sf).collect().toSeq
    val incr = MaterializedView.mvIncremental(spark, sf).collect().toSeq
    assert(incr == full)
    assert(incr.nonEmpty)
  }

  test("appending a batch scans only that batch, not the standing segments") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-incr-spec").toString
    MaterializedView.appendCubeBatch(spark, sf, dir, 0)
    val before = spark.read.parquet(dir).count()
    MaterializedView.appendCubeBatch(spark, sf, dir, 1)
    val after = spark.read.parquet(dir)
    // pure append: batch-0 rows still present and untouched, batch 1 added
    assert(after.filter(col("batch") === 0).count() == before)
    assert(after.filter(col("batch") === 1).count() > 0)
  }

  test("avg (unregistered aggregate function) bails out") {
    MaterializedView.cubeDir(spark, sf)
    val df = marked.groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("a")).orderBy("l_returnflag")
    assert(scanPaths(df).exists(_.contains("lineitem.parquet")))
  }

  // The next three pin the all-or-nothing guard against aggregates the rule
  // never positively maps: each would be silently evaluated over the ~tens
  // of cube cells (wrong answer) if the dim subtree under it were rewritten
  // bottom-up or a reference-free aggregate slipped the subset check.
  test("count over a dim column bails out and still answers from the fact") {
    MaterializedView.cubeDir(spark, sf)
    def q(fact: DataFrame) = fact.groupBy(col("l_linestatus"))
      .agg(count(col("l_returnflag")).as("n")).orderBy("l_linestatus")
    val df = q(marked)
    assert(scanPaths(df).exists(_.contains("lineitem.parquet")),
      s"count(dim) must not serve from the cube: ${scanPaths(df)}")
    assert(df.collect().toSeq == q(unmarked).collect().toSeq)
  }

  test("sum over a dim template (sum(year(l_shipdate))) bails out") {
    MaterializedView.cubeDir(spark, sf)
    def q(fact: DataFrame) = fact.groupBy(col("l_returnflag"))
      .agg(sum(year(col("l_shipdate"))).as("s")).orderBy("l_returnflag")
    val df = q(marked)
    assert(scanPaths(df).exists(_.contains("lineitem.parquet")),
      s"sum(dim-template) must not serve from the cube: ${scanPaths(df)}")
    assert(df.collect().toSeq == q(unmarked).collect().toSeq)
  }

  test("count(lit(1L)) — reference-free, not the Count(1) shape — is mapped as count(*)") {
    // Count over any non-null literal counts every row, so the rule may
    // legitimately serve it from the per-cell counts; what it must NOT do
    // is leave it un-rewritten over the cube (the old subset-check hole).
    val dir = MaterializedView.cubeDir(spark, sf)
    def q(fact: DataFrame) = fact.groupBy(col("l_returnflag"))
      .agg(count(lit(1L)).as("n")).orderBy("l_returnflag")
    val df = q(marked)
    assert(scanPaths(df).exists(_.contains(dir)), s"expected cube scan: ${scanPaths(df)}")
    assert(df.collect().toSeq == q(unmarked).collect().toSeq)
  }
}
