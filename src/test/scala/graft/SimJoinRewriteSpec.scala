package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHashFunctions.jaccardSorted
import graft.operators.Dedup

/** SimJoinRewriteRule: the declarative crossJoin + `jaccard >= tau` filter
  * must (a) plan WITHOUT a cartesian/nested-loop join, (b) return exactly
  * the pairs the hand-written exact strategies return, and (c) leave
  * non-matching shapes (tau = 0, already-equi joins) untouched.
  */
class SimJoinRewriteSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("declarative sim join: no cartesian product in the physical plan") {
    val df = Dedup.simJoinDeclarative(spark, sf)
    val plan = physical(df)
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(20).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(20).mkString("\n"))
  }

  test("declarative sim join output == ppjoin output") {
    val got = Dedup.simJoinDeclarative(spark, sf).collect().toSet
    val want = Dedup.ppjoinPairs(spark, sf).collect().toSet
    assert(got == want)
  }

  test("rewrite preserves multiset semantics under duplicated input rows") {
    import spark.implicits._
    // two identical left rows must each pair with the right row, and a pair
    // sharing several prefix tokens must still appear exactly once per
    // row-instance (the min-shared-token conjunct)
    val l = Seq((1L, Array(10L, 20L, 30L)), (1L, Array(10L, 20L, 30L)))
      .toDF("lid", "la")
    val r = Seq((9L, Array(10L, 20L, 30L))).toDF("rid", "ra")
    val out = l.crossJoin(r)
      .filter(jaccardSorted(col("la"), col("ra")) >= lit(0.5))
    assert(!physical(out).contains("CartesianProduct"))
    assert(out.count() == 2)
  }

  test("tau = 0 is not rewritten (prefix lemma needs tau > 0)") {
    import spark.implicits._
    val l = Seq((1L, Array(1L))).toDF("lid", "la")
    val r = Seq((2L, Array(2L))).toDF("rid", "ra")
    val out = l.crossJoin(r)
      .filter(jaccardSorted(col("la"), col("ra")) >= lit(0.0))
    val plan = physical(out)
    assert(plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
    // disjoint arrays: jaccard = 0.0 >= 0.0 keeps the pair
    assert(out.count() == 1)
  }

  test("equi-join conjunct blocks the rewrite (hash join already possible)") {
    import spark.implicits._
    val l = Seq((1L, Array(1L, 2L))).toDF("lid", "la")
    val r = Seq((1L, Array(1L, 2L))).toDF("rid", "ra")
    val out = l.join(r, col("lid") === col("rid"))
      .filter(jaccardSorted(col("la"), col("ra")) >= lit(0.5))
    // still correct, and planned as a plain equi join (no Generate/explode)
    assert(!physical(out).contains("Generate"))
    assert(out.count() == 1)
  }

  test("duplicate elements in an array do not double-emit the pair") {
    import spark.implicits._
    // [10,10,20,30] is sorted but violates distinctness; the kernel still
    // returns a defined value and the rewrite must emit the pair exactly
    // once per row-instance (array_distinct on the exploded prefix)
    val l = Seq((1L, Array(10L, 10L, 20L, 30L))).toDF("lid", "la")
    val r = Seq((9L, Array(10L, 20L, 30L))).toDF("rid", "ra")
    val out = l.crossJoin(r)
      .filter(jaccardSorted(col("la"), col("ra")) >= lit(0.5))
    assert(!physical(out).contains("CartesianProduct"))
    assert(out.count() == 1)
  }

  test("null and empty arrays: rewritten plan drops them like the filter does") {
    import spark.implicits._
    val l = Seq((1L, Array(1L, 2L)), (2L, Array.empty[Long]), (3L, null))
      .toDF("lid", "la")
    val r = Seq((9L, Array(1L, 2L))).toDF("rid", "ra")
    val out = l.crossJoin(r)
      .filter(jaccardSorted(col("la"), col("ra")) >= lit(0.5))
    assert(!physical(out).contains("CartesianProduct"))
    assert(out.select("lid").as[Long].collect().toSeq == Seq(1L))
  }
}
