package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute-force top-k: k rows per query, cosine within [-1, 1], ranked") {
    val t = Similarity.cosineTopK(spark, sf)
    assert(t.filter(col("cos") < -1.000001 || col("cos") > 1.000001).count() == 0)
    val perQ = t.groupBy("q_id").agg(count(lit(1)).as("n"), max("rn").as("mx"))
    assert(perQ.filter(col("n") =!= 10 || col("mx") =!= 10).count() == 0)
  }

  test("ann results are a subset of each query's bucket with valid cosines") {
    val a = Similarity.annTopK(spark, sf)
    assert(a.filter(col("cos") < -1.000001 || col("cos") > 1.000001).count() == 0)
    assert(a.filter(col("rn") > 10).count() == 0)
  }

  test("ann rank-1 recall against brute force is meaningful") {
    // LSH with 12 planes on random 64-d vectors: expect the true nearest
    // neighbor to land in the query's bucket for a reasonable fraction of
    // queries (sanity bound, not a tight one — buckets are coarse).
    val exact1 = Similarity.cosineTopK(spark, sf).filter(col("rn") === 1)
      .select(col("q_id"), col("vec_id").as("nn"))
    val ann = Similarity.annTopK(spark, sf).select(col("q_id"), col("vec_id"))
    val hits = exact1.join(ann,
      exact1("q_id") === ann("q_id") && exact1("nn") === ann("vec_id")).count()
    val total = exact1.count()
    assert(total > 0)
    assert(hits.toDouble / total >= 0.2, s"rank-1 recall $hits/$total")
  }

  test("ivf probes return valid, ranked, deduplicated neighbors") {
    val ivf = Similarity.ivfTopK(spark, sf)
    assert(ivf.filter(col("cos") < -1.000001 || col("cos") > 1.000001).count() == 0)
    assert(ivf.groupBy("q_id", "vec_id").count().filter(col("count") > 1).count() == 0)
    // probing 4 of 16 lists must find the true nearest for a fair share
    val exact1 = Similarity.cosineTopK(spark, sf).filter(col("rn") === 1)
      .select(col("q_id"), col("vec_id").as("nn"))
    val hits = exact1.join(ivf,
      exact1("q_id") === ivf("q_id") && exact1("nn") === ivf("vec_id")).count()
    assert(hits.toDouble / exact1.count() >= 0.2, s"ivf rank-1 recall $hits")
  }

  test("graft_dot is callable from SQL after registration") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
  }

  test("codegen DotProduct matches the HOF formulation bit-for-bit") {
    import graft.functions.VectorFunctions.dot
    val e = Tables.embeddings(spark, sf)
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
    val cmp = e.select(
      dot(col("v"), col("v")).as("a"),
      expr("aggregate(v, 0D, (acc, x) -> acc + x*x)").as("b"))
    assert(cmp.filter(col("a") =!= col("b")).count() == 0)
  }
}
