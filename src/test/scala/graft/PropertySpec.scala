package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2.3) over ScalaCheck-generated
  * corpora — the operators must hold these for ANY input, not just the
  * testdata. Raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge artifact isn't in the offline cache), 20 samples per property.
  */
class PropertySpec extends SparkSpec {

  private val word = Gen.oneOf("spark", "scan", "join", "agg", "row", "col")
  private val doc = Gen.nonEmptyListOf(word).map(_.take(12).mkString(" "))
  private val corpus = Gen.nonEmptyListOf(doc).map(_.take(20))

  private def samples[A](g: Gen[A], n: Int = 20): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("wordcount totals are invariant under document order") {
    import spark.implicits._
    def counts(ds: Seq[String]): Seq[(String, Long)] =
      ds.toDF("text")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy("w").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    samples(corpus, 8).foreach { docs =>
      assert(counts(docs) == counts(docs.reverse))
    }
  }

  test("dedup by text is idempotent and conservative") {
    import spark.implicits._
    samples(corpus, 8).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = df.groupBy("text").agg(min("doc_id").as("doc_id"))
      val twice = once.groupBy("text").agg(min("doc_id").as("doc_id"))
      assert(once.count() == twice.count())
      assert(once.count() == docs.distinct.size)
    }
  }

  test("top-k by count equals local sorted-take for any k") {
    import spark.implicits._
    samples(Gen.zip(corpus, Gen.choose(1, 8)), 8).foreach { case (docs, k) =>
      val local = docs.mkString(" ").split(" ").toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.take(k)
      val got = docs.toDF("text")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("w")).limit(k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == local)
    }
  }

  test("jaccard similarity is symmetric and bounded on generated token sets") {
    import spark.implicits._
    val pair = Gen.zip(Gen.nonEmptyListOf(word), Gen.nonEmptyListOf(word))
    val rows = samples(pair).map { case (a, b) => (a.distinct, b.distinct) }
    val df = rows.toDF("ta", "tb")
    val inter = size(array_intersect(col("ta"), col("tb")))
    val interR = size(array_intersect(col("tb"), col("ta")))
    val j = df.select(
      (inter.cast("double") / (size(col("ta")) + size(col("tb")) - inter)).as("jab"),
      (interR.cast("double") / (size(col("tb")) + size(col("ta")) - interR)).as("jba"))
    assert(j.filter(col("jab") =!= col("jba")).count() == 0)
    assert(j.filter(col("jab") < 0 || col("jab") > 1).count() == 0)
  }

  test("GroupTopK custom operator equals sorted-take on generated data") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.plans.{GroupTopK, GroupTopKStrategy}
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ GroupTopKStrategy
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 1000L), Gen.choose(-100.0, 100.0)))
    samples(rowsGen, 8).foreach { rows =>
      val distinctRows = rows.distinct
      val df = distinctRows.toDF("g", "id", "v")
      val analyzed = df.queryExecution.analyzed
      val Seq(g, id, v) = analyzed.output
      val rank = AttributeReference("rn", org.apache.spark.sql.types.LongType, nullable = false)()
      val got = ColumnShim.ofRows(spark,
        GroupTopK(Seq(g), Seq(SortOrder(v, Descending), SortOrder(id, Ascending)), 2, rank, analyzed))
        .select("g", "rn", "id", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val local = distinctRows.groupBy(_._1).toSeq.flatMap { case (grp, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
          .map { case ((_, id0, v0), i) => (grp, (i + 1).toLong, id0, v0) }
      }.toSet
      assert(got == local)
    }
  }
}
