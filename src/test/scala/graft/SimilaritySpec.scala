package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  /** Recall is measured at sf0.01 (80 queries x 10 neighbors) — sf0.001 has
    * only 8 queries and its IVF quantizer degenerates to 2 lists, so a
    * floor there would be vacuous.
    */
  private val sfRecall = "/root/testdata/sf0.01"

  private def topKRecall(approx: org.apache.spark.sql.DataFrame, sfDir: String): Double = {
    val exact = Similarity.cosineTopK(spark, sfDir).select(col("q_id"), col("vec_id"))
    val total = exact.count()
    val hits = approx.select(col("q_id"), col("vec_id")).join(exact, Seq("q_id", "vec_id")).count()
    hits.toDouble / total
  }

  test("brute-force top-k: k rows per query, cosine within [-1, 1], ranked") {
    val t = Similarity.cosineTopK(spark, sf)
    assert(t.filter(col("cos") < -1.000001 || col("cos") > 1.000001).count() == 0)
    val perQ = t.groupBy("q_id").agg(count(lit(1)).as("n"), max("rn").as("mx"))
    assert(perQ.filter(col("n") =!= 10 || col("mx") =!= 10).count() == 0)
  }

  test("hard negatives: cross-label only, ranked, and at most the unrestricted best") {
    import spark.implicits._
    val hn = Similarity.hardNegatives(spark, sf)
    assert(hn.filter(col("neg_lang") === col("q_lang")).count() == 0)
    val perQ = hn.groupBy("q_id").agg(count(lit(1)).as("n"), max("rn").as("mx"))
    assert(perQ.filter(col("n") =!= Similarity.HardNegK
      || col("mx") =!= Similarity.HardNegK).count() == 0)
    // a label-constrained best can never beat the unconstrained best
    val best = Similarity.cosineTopK(spark, sf).filter(col("rn") === 1)
      .select(col("q_id"), col("cos").as("best"))
    val j = hn.filter(col("rn") === 1).join(best, "q_id")
    assert(j.filter(col("cos") > col("best") + 1e-9).count() == 0)
  }

  test("ann results are a subset of each query's probed buckets with valid cosines") {
    val a = Similarity.annTopK(spark, sf)
    assert(a.filter(col("cos") < -1.000001 || col("cos") > 1.000001).count() == 0)
    assert(a.filter(col("rn") > 10).count() == 0)
  }

  test("ann top-10 recall vs brute force holds the 0.9 floor") {
    val r = topKRecall(Similarity.annTopK(spark, sfRecall), sfRecall)
    assert(r >= 0.9, s"ann top-10 recall $r < 0.9")
    spark.catalog.clearCache()
  }

  test("ivf recall vs exact integer L2 holds the measured floor and the audit agrees") {
    // ground truth is integer L2 on the shared lattice (the metric IVF
    // prunes); nprobe=4 of 10 near-isotropic lists — the honest floor is
    // mid-band (neighbors scatter across coarse lists), measured 0.60 at
    // sf0.01; the audit's hash-pinned recall_ppm must replay the same
    // numbers it was derived from
    val audit = Similarity.ivfAudit(spark, sfRecall).collect()
    assert(audit.nonEmpty)
    assert(audit.forall(_.getLong(1) == 10L), "n_ivf != 10 for some query")
    val recall = audit.map(_.getLong(2)).sum.toDouble / (audit.length * 10)
    assert(recall >= 0.5, s"ivf top-10 recall vs exact L2 $recall < 0.5")
    // the serving distance envelope: ivf's kth candidate can never beat
    // the exact kth (it ranks a candidate subset)
    assert(audit.forall(r => r.getLong(4) >= r.getLong(5)),
      "ivf_kth < exact_kth — candidate ranking broken")
    spark.catalog.clearCache()
  }

  test("ivf probe curve: monotone recall, nested candidate sets, endpoints honest (r15)") {
    import spark.implicits._
    val curve = Similarity.ivfProbeCurve(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Similarity.IvfCurvePoints.map(_.toLong))
    // candidate sets are nested in nprobe ⇒ recall never decreases
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._4 >= lo._4,
        s"recall dropped: nprobe ${lo._1} → ${hi._1} gave ${lo._4} → ${hi._4}")
    }
    assert(curve.last._4 > 0, "widest probe found nothing — curve vacuous")
    assert(curve.forall(r => r._3 <= r._2 * 10), "more hits than exact rows")
  }

  test("ivf stored and appended indexes serve the identical ranking (r15)") {
    import spark.implicits._
    val inPlan = Similarity.ivfTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val served = Similarity.ivfServed(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val incr = Similarity.ivfIncremental(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(served == inPlan, "stored-index serve diverges from the in-plan ranking")
    assert(incr == inPlan, "appended-index serve diverges from the in-plan ranking")
    // both parity segments really landed
    val segs = spark.read.parquet(Similarity.ivfIncrIndexDir(spark, sf))
    assert(segs.select("batch").distinct().count() == 2)
  }

  test("jl-composed ivf: cluster equi-join serving, honest recall readout (r15)") {
    val df = Similarity.jlIvfTopK(spark, sf)
    assert(df.columns.sameElements(Array("q_id", "rn", "vec_id", "dist")))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoop"),
      "jl-ivf candidate generation planned a nested loop")
    val audit = Similarity.jlIvfRecall(spark, sfRecall).collect()
    assert(audit.nonEmpty)
    assert(audit.forall(_.getLong(1) == 10L), "n_jl != 10 for some query")
    // candidate subsets can only match or trail the exact kth distance
    assert(audit.forall(r => r.getLong(4) >= r.getLong(5)),
      "jl_kth < exact_kth — candidate ranking broken")
    spark.catalog.clearCache()
  }

  test("ivf probes return valid, ranked, deduplicated neighbors") {
    val ivf = Similarity.ivfTopK(spark, sf)
    assert(ivf.filter(col("dist") < 0).count() == 0)
    assert(ivf.groupBy("q_id", "vec_id").count().filter(col("count") > 1).count() == 0)
  }

  test("ivfTopK serves via a cluster equi-join, never a nested loop") {
    // the r15 deterministic form trains centroids at plan-build through
    // the memoized shared trainer (the q_ivfpq_topk shape — one training
    // per session for the whole k-means family); what must never appear
    // is a nested-loop candidate generator: corpus × probes joins on the
    // cluster id, so the physical plan is a broadcast HASH join
    val df = Similarity.ivfTopK(spark, sf)
    assert(df.columns.sameElements(Array("q_id", "rn", "vec_id", "dist")))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoop"),
      "ivf candidate generation planned a nested loop")
    assert(physical.contains("BroadcastHashJoin"),
      "ivf candidate generation is not a broadcast hash equi-join")
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

  test("codegen long-vector kernels match their HOF formulations bit-for-bit (r16)") {
    // SqDistLong / DotLong / UpperTriProducts replaced the interpreted
    // aggregate(zip_with(...)) forms on the ANN/PCA hot paths — same long
    // arithmetic in the same ascending-index order, so equality is exact,
    // not approximate. Probe over the real micro-unit corpus.
    import graft.functions.VectorFunctions.{dotLong, sqDistLong, triProducts}
    val qv = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round((cast(x as double) + 1.0d) * 1000000, 0) as bigint))")
          .as("qv"))
    val shifted = expr("transform(qv, x -> x + 7L)")
    val cmp = qv.select(
      sqDistLong(col("qv"), shifted).as("sq_a"),
      expr("aggregate(zip_with(qv, transform(qv, x -> x + 7L), (x, y) -> (x - y) * (x - y)), 0L, (s, x) -> s + x)")
        .as("sq_b"),
      dotLong(col("qv"), col("qv")).as("dt_a"),
      expr("aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (s, x) -> s + x)")
        .as("dt_b"),
      triProducts(col("qv")).as("tri_a"),
      expr("flatten(transform(qv, (x, i) -> transform(slice(qv, i + 1, size(qv) - i), (y, k) -> x * y)))")
        .as("tri_b"))
    assert(cmp.filter(col("sq_a") =!= col("sq_b") || col("dt_a") =!= col("dt_b")
      || col("tri_a") =!= col("tri_b")).count() == 0)
    // triIdx recovers the same (i, j) pairs the HOF struct expansion carried
    val (iIdx, jIdx) = graft.functions.VectorFunctions.triIdx(4)
    assert(iIdx == IndexedSeq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 3L))
    assert(jIdx == IndexedSeq(0L, 1L, 2L, 3L, 1L, 2L, 3L, 2L, 3L, 3L))
  }

  test("long-vector kernels run under CODEGEN_ONLY and are SQL-callable (r16)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.sql(
        """SELECT graft_sqdist_long(array(1L, 2L), array(4L, 6L)) AS sq,
          |  graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dt,
          |  graft_tri_products(array(2L, 3L, 5L)) AS tri""".stripMargin).head
      assert(r.getLong(0) == 25L && r.getLong(1) == 32L)
      assert(r.getSeq[Long](2) == Seq(4L, 6L, 10L, 9L, 15L, 25L))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("int8 quantization: error bounded by scale/2, codes exact vs driver recompute") {
    import spark.implicits._
    val rows = Similarity.quantizeInt8(spark, sf)
      .select("vec_id", "scale", "q_fp", "q_sum", "max_err")
      .as[(Long, Double, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // full driver-side recomputation with Spark's HALF_UP rounding semantics
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().map { case (id, emb) =>
        val v = emb.map(_.toDouble)
        val amax = v.map(math.abs).max
        val q =
          if (amax == 0.0) v.map(_ => 0)
          else v.map(x => BigDecimal(x * 127.0 / amax)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt)
        assert(q.forall(c => c >= -127 && c <= 127), s"vec $id")
        id -> q
      }.toMap
    rows.foreach { case (id, scale, fp, qsum, err) =>
      // round-to-nearest guarantee: |x - q·scale| <= scale/2 (+rounding grain)
      assert(err <= scale / 2 + 1e-6, s"vec $id: err $err vs scale $scale")
      assert(fp == md5hex(want(id).mkString(",")), s"vec $id codes diverge")
      assert(qsum == want(id).map(_.toLong).sum, s"vec $id")
    }
  }

  test("integer k-means matches a driver-side Lloyd recompute exactly") {
    import spark.implicits._
    val got = Similarity.kmeans(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // independent reimplementation: BigDecimal HALF_UP quantization,
    // plain-Scala Lloyd rounds with the same tie-break and update rules
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .as[(Long, Long, Seq[Float])].collect().sortBy(_._1)
    val qv: Map[Long, Array[Long]] = vecs.map { case (id, _, e) =>
      id -> e.map(x => BigDecimal((x.toDouble + 1.0) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
    }.toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: IndexedSeq[Array[Long]] =
      vecs.take(Similarity.KmeansK).map(v => qv(v._1)).toIndexedSeq
    def assign(): Map[Long, (Int, Long)] = qv.map { case (id, v) =>
      val ds = cents.map(dist(v, _))
      val best = ds.min
      id -> (ds.indexOf(best), best) // first occurrence = lowest cid
    }
    (1 to Similarity.KmeansRounds).foreach { _ =>
      val byC = assign().toSeq.groupBy(_._2._1)
      cents = cents.indices.map { cid =>
        byC.get(cid).fold(cents(cid)) { members =>
          val vs = members.map(m => qv(m._1))
          Array.tabulate(64) { d =>
            val s = vs.map(_(d)).sum
            (2 * s + vs.size) / (2L * vs.size)
          }
        }
      }
    }
    val fin = assign()
    val want = vecs.map { case (id, label, _) =>
      (id, label, fin(id)._1.toLong, fin(id)._2)
    }.toSeq
    assert(got == want)
    // the clustering is live: more than one cluster, every id in [0, k)
    assert(got.map(_._3).distinct.size > 1)
    assert(got.forall(r => r._3 >= 0 && r._3 < Similarity.KmeansK))
  }

  test("k-means|| seeding: valid deterministic clustering, SSE no worse than lowest-id") {
    import spark.implicits._
    val par = Similarity.kmeans(spark, sf, Similarity.KmeansSeedParallel)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // valid partition over the same corpus
    val n = Tables.embeddings(spark, sf).count()
    assert(par.size == n)
    assert(par.forall(r => r._3 >= 0 && r._3 < Similarity.KmeansK))
    assert(par.map(_._3).distinct.size > 1)
    // deterministic: a second run is identical (no RNG anywhere in seeding)
    val again = Similarity.kmeans(spark, sf, Similarity.KmeansSeedParallel)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(par == again)
    // on this structure-free gaussian corpus seeding is a wash — assert
    // parity within 5% (the planted-cluster test below is where quality
    // is actually observable)
    val sseLowest = Similarity.kmeans(spark, sf)
      .agg(sum("dist")).head.getLong(0)
    val ssePar = par.map(_._4).sum
    assert(ssePar.toDouble <= sseLowest.toDouble * 1.05,
      s"k-means|| SSE $ssePar far worse than lowest-id SSE $sseLowest")
    // unknown seeding name fails fast
    intercept[IllegalArgumentException] {
      Similarity.kmeans(spark, sf, "bogus")
    }
  }

  test("k-means|| seeding beats lowest-id on a clustered corpus with adversarial ids") {
    import spark.implicits._
    // 10 well-separated centers; the K lowest vec_ids ALL sit in cluster 0,
    // so lowest-id seeding starts degenerate while k-means|| must spread
    val rnd = new scala.util.Random(13)
    val centers = IndexedSeq.tabulate(Similarity.KmeansK)(_ =>
      Array.fill(64)(rnd.nextGaussian() * 0.8))
    def around(c: Array[Double]) = c.map(x => (x + 0.02 * rnd.nextGaussian()).toFloat)
    val firstClusterBlock = Seq.tabulate(Similarity.KmeansK + 2)(i =>
      (i.toLong, i.toLong, around(centers(0))))
    val rest = for {
      c <- 0 until Similarity.KmeansK; j <- 0 until 12
    } yield ((100 + c * 12 + j).toLong, (100 + c * 12 + j).toLong, around(centers(c)))
    val df = (firstClusterBlock ++ rest).toDF("vec_id", "label", "embedding")
    def sse(seeding: String): Long =
      Similarity.kmeansAssignedFrom(df, seeding).agg(sum("dist")).head.getLong(0)
    val lo = sse(Similarity.KmeansSeedLowestId)
    val par = sse(Similarity.KmeansSeedParallel)
    assert(par < lo, s"k-means|| SSE $par should beat degenerate lowest-id SSE $lo")
    // and it recovers (nearly) all planted clusters
    val nClusters = Similarity.kmeansAssignedFrom(df, Similarity.KmeansSeedParallel)
      .select("cluster").distinct().count()
    assert(nClusters >= Similarity.KmeansK - 1, s"only $nClusters clusters recovered")
  }

  test("semdedup drop rule: dropped iff a lower-id same-cluster neighbor above tau") {
    import spark.implicits._
    import graft.operators.Dedup
    val got = Similarity.semDedup(spark, sf)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == got.map(_._1).sorted)
    val cluster = Similarity.kmeans(spark, sf)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case (id, cl, kept) =>
      assert(cl == cluster(id))
      val hasLowerNeighbor = vecs.keys.exists(o =>
        o < id && cluster(o) == cl && cos(vecs(o), vecs(id)) >= Dedup.CosineTau)
      assert(kept == !hasLowerNeighbor, s"vec $id")
    }
    // live signal both ways at this sf
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("ann recall audit: one row per query, recall/rr in range, floor holds") {
    import spark.implicits._
    val got = Similarity.annRecall(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq
    val nQueries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 25 === 0).count()
    assert(got.size == nQueries)
    got.foreach { case (q, hits, recall, rr) =>
      assert(hits >= 0 && hits <= 10, s"query $q")
      assert(recall == BigDecimal(hits / 10.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"query $q")
      assert(rr >= 0.0 && rr <= 1.0, s"query $q")
      // rr can only be 1 when the exact best was recovered at ANN rank 1,
      // which implies at least one hit
      assert(rr == 0.0 || hits >= 1, s"query $q")
    }
    // the same floor SimilaritySpec pins for the raw operator
    assert(got.map(_._3).sum / got.size >= 0.9)
  }

  test("semantic decontamination matches a brute-force benchmark-scan recompute") {
    import spark.implicits._
    import graft.operators.Dedup
    val got = Similarity.semanticDecontaminate(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == got.map(_._1).sorted)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val bench = vecs.keys.filter(_ % 10 == 7).toSeq.sorted
    val want = vecs.keys.filter(_ % 10 != 7).toSeq.sorted.flatMap { id =>
      val hits = bench.map(b => (b, cos(vecs(b), vecs(id))))
        .filter(_._2 >= Dedup.CosineTau)
      if (hits.isEmpty) None
      else {
        val (nn, c) = hits.minBy { case (b, c) => (-c, b) }
        Some((id, hits.size.toLong, nn,
          BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    assert(got == want)
    // the fixture genuinely flags something, and not everything
    assert(want.nonEmpty && want.size < vecs.size)
  }

  test("PQ-ADC ranking equals a driver replay of encode + LUT over the trained codebook") {
    import spark.implicits._
    val cb = Similarity.pqCodebooks(spark, sf)
    val (m, ks, sd) = (Similarity.PqM, Similarity.PqKs, Similarity.PqSubDim)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.round((x.toDouble + 1.0) * 1000000)).map(_.toLong)
      }.toMap
    def sq(v: Array[Long], c: Array[Long]): Long =
      v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    def subv(v: Array[Long], s: Int): Array[Long] = v.slice(s * sd, (s + 1) * sd)
    val codes = vecs.map { case (id, v) =>
      id -> Array.tabulate(m) { s =>
        val d = (0 until ks).map(j => sq(subv(v, s), cb(s * ks + j)))
        d.indexOf(d.min) // first minimum = lowest code, the engine tie-break
      }
    }
    val queries = vecs.keys.filter(_ % 25 == 0).toSeq.sorted
    val want = queries.flatMap { q =>
      val lut = Array.tabulate(m, ks)((s, j) => sq(subv(vecs(q), s), cb(s * ks + j)))
      vecs.keys.filter(_ != q).toSeq
        .map(id => (id, (0 until m).map(s => lut(s)(codes(id)(s))).sum))
        .sortBy { case (id, d) => (d, id) }.take(Similarity.PqTopK)
        .zipWithIndex.map { case ((id, d), i) => (q, i + 1L, id, d) }
    }
    val got = Similarity.pqTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(queries.nonEmpty && got.size == queries.size * Similarity.PqTopK)
  }

  test("IVFADC prunes to the probed clusters and scores exactly like its PQ parent there") {
    import spark.implicits._
    val got = Similarity.ivfPqTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // ADC distances must agree with the UNPRUNED PQ scorer on every
    // surviving (query, candidate) pair — the composition changes which
    // candidates are scored, never how
    val pqAll = Similarity.pqTopK(spark, sf, k = Int.MaxValue)
      .select("q_id", "vec_id", "adist")
      .as[(Long, Long, Long)].collect()
      .map { case (q, v, d) => (q, v) -> d }.toMap
    got.foreach { case (q, _, v, d) =>
      assert(pqAll((q, v)) == d, s"ADC mismatch for ($q, $v)")
    }
    // pruning is real: every query's candidates span at most nprobe of
    // the oracle-checked q_kmeans clusters
    val km = Similarity.kmeans(spark, sf)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      val clusters = rows.map(r => km(r._3)).toSet
      assert(clusters.size <= Similarity.IvfPqNProbe,
        s"query $q drew candidates from ${clusters.size} clusters")
    }
  }

  test("PQ recall audit counts agree with driver-side joins of the three rankings") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    val ex = pairs(Similarity.l2TopK(spark, sf))
    val pq = pairs(Similarity.pqTopK(spark, sf))
    val iv = pairs(Similarity.ivfPqTopK(spark, sf))
    val got = Similarity.pqRecall(spark, sf)
      .select("q_id", "n_pq", "n_ivfpq").as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == ex.keySet && got.nonEmpty)
    got.foreach { case (q, nPq, nIv) =>
      assert(nPq == (ex(q) & pq(q)).size.toLong, s"query $q pq overlap")
      assert(nIv == (ex(q) & iv.getOrElse(q, Set.empty)).size.toLong, s"query $q ivfpq overlap")
    }
    // the audit is not vacuous on the testdata: some true neighbors found
    assert(got.map(_._2).sum >= 1)
  }

  test("ivfpq appended codes index serves the identical ADC ranking; codes come from the store (r16)") {
    import spark.implicits._
    val inPlan = Similarity.ivfPqTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val incr = Similarity.ivfPqIncremental(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(incr == inPlan, "stored-codes serve diverges from the in-plan IVFADC")
    // both parity segments landed, and the corpus side of the serve plan
    // reads ONLY the index (the panel/LUT side legitimately reads
    // embeddings — queries are not indexed)
    val dir = Similarity.ivfPqIncrIndexDir(spark, sf)
    val segs = spark.read.parquet(dir)
    assert(segs.select("batch").distinct().count() == 2)
    assert(segs.count() == Tables.embeddings(spark, sf).count())
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val paths = Similarity.ivfPqIncremental(spark, sf)
      .queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
      }.flatten
    assert(paths.exists(_.contains("graft-ivfpq-index")), "store not in the serve plan")
    assert(paths.forall(p => p.contains("graft-ivfpq-index") || p.contains("embeddings")),
      s"serve plan reads beyond store + query panel: $paths")
  }

  test("semdedup stored segments serve the identical keep set, store-only plan (r16)") {
    import spark.implicits._
    val full = Similarity.semDedup(spark, sf)
      .as[(Long, Long, Boolean)].collect().toSeq
    val incr = Similarity.semDedupIncremental(spark, sf)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(incr == full, "stored-segment serve diverges from the scan-time keep set")
    assert(full.exists(!_._3), "keep set vacuous — nothing dropped")
    // both parity segments really landed
    val dir = Similarity.semIncrIndexDir(spark, sf)
    assert(spark.read.parquet(dir).select("batch").distinct().count() == 2)
    // the serve plan touches ONLY the stored index — no embeddings rescan,
    // no reassignment (the hll-cube analyzed-relations idiom)
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val paths = Similarity.semDedupIncremental(spark, sf)
      .queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
      }.flatten
    assert(paths.nonEmpty && paths.forall(_.contains("graft-semdedup-index")),
      s"serve plan reads beyond the stored index: $paths")
  }

  test("residual IVFADC: codebooks retrain on residuals, candidates honor the probe width, ADC matches a driver replay (r16)") {
    import spark.implicits._
    // the residual codebooks are genuinely different models (training on
    // r = x − centroid(x), not x) — identical books would mean the
    // residual step was a no-op
    val rawCb = Similarity.pqCodebooks(spark, sf)
    val resCb = Similarity.pqResCodebooks(spark, sf)
    assert(rawCb.size == resCb.size)
    assert(rawCb.zip(resCb).exists { case (a, b) => !a.sameElements(b) },
      "residual codebooks identical to raw — residual training vacuous")
    val got = Similarity.ivfPqResidualTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // pruning honors nprobe under the SHARED coarse quantizer
    val km = Similarity.kmeans(spark, sf)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(r => km(r._3)).toSet.size <= Similarity.IvfPqNProbe,
        s"query $q drew candidates from too many clusters")
    }
    // ADC distances replay exactly driver-side: encode the candidate's
    // residual with the trained books, build the query's LUT against the
    // CANDIDATE's cluster centroid (per-probe LUT semantics), sum M cells
    val rv = Similarity.residualVectors(spark, sf)
      .select("vec_id", "cluster", "rv").as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val qvs = graft.Tables.embeddings(spark, sf).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round((CAST(x AS DOUBLE) + 1.0d) * 1000000) AS BIGINT))"))
      .as[(Long, Seq[Long])].collect().toMap
    // recover each cluster's centroid from its members: cent = qv − rv
    // (any member works; asserting they all agree checks the residual
    // frame's internal consistency for free)
    val cents: Map[Int, Seq[Long]] = rv.toSeq
      .map { case (v, (c, r)) => c.toInt -> qvs(v).zip(r).map { case (x, d) => x - d } }
      .groupBy(_._1).map { case (c, ms) =>
        assert(ms.map(_._2).distinct.size == 1, s"cluster $c members disagree on the centroid")
        c -> ms.head._2
      }
    val (m, sd, ks) = (8, 8, 16)
    def sq(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def codesOf(v: Seq[Long]) = (0 until m).map { s =>
      val sub = v.slice(s * sd, s * sd + sd)
      val d = (0 until ks).map(j => sq(sub, resCb(s * ks + j).toSeq))
      d.indexOf(d.min)
    }
    got.foreach { case (q, _, v, adist) =>
      val (vc, vres) = rv(v)
      val qres = qvs(q).zip(cents(vc.toInt)).map { case (x, cv) => x - cv }
      val want = (0 until m).map { s =>
        val qs = qres.slice(s * sd, s * sd + sd)
        sq(qs, resCb(s * ks + codesOf(vres)(s)).toSeq)
      }.sum
      assert(want == adist, s"residual ADC mismatch for ($q, $v): $want != $adist")
    }
  }

  test("raw-vs-residual recall audit agrees with driver joins; residual wins in aggregate on this corpus (r16)") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    val ex = pairs(Similarity.l2TopK(spark, sfRecall))
    val raw = pairs(Similarity.ivfPqTopK(spark, sfRecall))
    val res = pairs(Similarity.ivfPqResidualTopK(spark, sfRecall))
    val got = Similarity.pqResRecall(spark, sfRecall)
      .select("q_id", "n_ivfpq", "n_res").as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == ex.keySet && got.nonEmpty)
    got.foreach { case (q, nRaw, nRes) =>
      assert(nRaw == (ex(q) & raw.getOrElse(q, Set.empty)).size.toLong, s"query $q raw overlap")
      assert(nRes == (ex(q) & res.getOrElse(q, Set.empty)).size.toLong, s"query $q residual overlap")
    }
    // the aggregate relation the residual form exists for, measured where
    // recall is non-vacuous (80-query sf0.01 panel): residual codes
    // recover at least as many true neighbors as raw codes in total
    // (deterministic pipelines — this is a fact of the corpus, not luck)
    assert(got.map(_._3).sum >= got.map(_._2).sum,
      s"residual recall ${got.map(_._3).sum} < raw ${got.map(_._2).sum}")
    spark.catalog.clearCache()
  }

  test("IVFADC probe curve: candidate recall monotone by construction, served hits within candidates (r16)") {
    import spark.implicits._
    val curve = Similarity.ivfPqProbeCurve(spark, sf)
      .select("nprobe", "n_queries", "n_cand_hits", "n_hits")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Similarity.IvfCurvePoints.map(_.toLong))
    // probe lists are nested ⇒ candidate-generation recall never drops
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 >= lo._3,
        s"cand recall dropped: nprobe ${lo._1} → ${hi._1} gave ${lo._3} → ${hi._3}")
    }
    // a served hit was necessarily a candidate; NO monotonicity asserted
    // on served hits — the coded ranking can trade a true neighbor away
    // as the probe widens (the trade this curve exists to show)
    curve.foreach { r =>
      assert(r._4 <= r._3, s"served hits ${r._4} exceed candidate hits ${r._3}")
    }
    assert(curve.last._3 > 0, "widest probe generated no true candidates — vacuous")
  }

  test("JL probe curve: monotone served recall (nested candidates + exact re-rank) (r16)") {
    import spark.implicits._
    val curve = Similarity.jlProbeCurve(spark, sf)
      .select("nprobe", "n_queries", "n_hits")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Similarity.IvfCurvePoints.map(_.toLong))
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 >= lo._3,
        s"recall dropped: nprobe ${lo._1} → ${hi._1} gave ${lo._3} → ${hi._3}")
    }
    assert(curve.last._3 > 0, "widest probe found nothing — curve vacuous")
  }

  /** Centered double-precision corpus — shared by the three pca
    * cross-checks below. */
  private def pcaCenteredDoubles(): Array[Array[Double]] = {
    import spark.implicits._
    val X = graft.Tables.embeddings(spark, sf)
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val (n, dim) = (X.length, 64)
    val mu = Array.tabulate(dim)(j => X.map(_(j)).sum / n)
    X.map(x => Array.tabulate(dim)(j => x(j) - mu(j)))
  }

  /** Top eigenvalue of a symmetric matrix by cyclic Jacobi rotations —
    * the independent eigensolver the covariance cross-checks use (no
    * power iteration in sight, so it cannot share a failure mode with
    * the code under test). */
  private def jacobiTopEig(a0: Array[Array[Double]]): Double = {
    val n = a0.length
    val a = a0.map(_.clone())
    for (_ <- 1 to 30; p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-9) {
      val theta = 0.5 * math.atan2(2 * a(p)(q), a(q)(q) - a(p)(p))
      val (c, s) = (math.cos(theta), math.sin(theta))
      for (k <- 0 until n) {
        val (akp, akq) = (a(k)(p), a(k)(q))
        a(k)(p) = c * akp - s * akq; a(k)(q) = s * akp + c * akq
      }
      for (k <- 0 until n) {
        val (apk, aqk) = (a(p)(k), a(q)(k))
        a(p)(k) = c * apk - s * aqk; a(q)(k) = s * apk + c * aqk
      }
    }
    (0 until n).map(i => a(i)(i)).max
  }

  test("pca: integer trainer tracks a double-precision replay of the same rounds (r13)") {
    val D = pcaCenteredDoubles()
    val dim = 64
    // double power iteration, SAME round count / start / max-norm scheme
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to Similarity.PcaRounds) {
      val w = Array.fill(dim)(0.0)
      D.foreach { dv =>
        var d = 0.0; var j = 0
        while (j < dim) { d += dv(j) * v(j); j += 1 }
        j = 0; while (j < dim) { w(j) += d * dv(j); j += 1 }
      }
      val mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    val vi = Similarity.trainedPc1(spark, sf).map(_.toDouble)
    val cos = math.abs(
      (0 until dim).map(j => vi(j) * v(j)).sum /
        (math.sqrt(vi.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum)))
    assert(cos > 0.99999, s"integer iterate diverges from double replay: cos=$cos")
    assert(vi.map(math.abs).max == Similarity.PcaScale.toDouble) // max-norm invariant
  }

  test("pca: iterate Rayleigh reaches the Jacobi top eigenvalue; explained_ppm exact (r13)") {
    import spark.implicits._
    val D = pcaCenteredDoubles()
    val dim = 64
    val C = Array.tabulate(dim, dim)((i, j) => D.map(dv => dv(i) * dv(j)).sum)
    val lam1 = jacobiTopEig(C)
    val vi = Similarity.trainedPc1(spark, sf).map(_.toDouble)
    val vtv = vi.map(x => x * x).sum
    val ray = (0 until dim).map(i => (0 until dim).map(j => vi(i) * C(i)(j) * vi(j)).sum).sum / vtv
    // convergence quality on the spec corpus: the 64-round iterate sits at
    // the top of the spectrum as judged by an INDEPENDENT eigensolver
    assert(ray >= 0.999 * lam1, s"iterate Rayleigh $ray vs Jacobi lam1 $lam1")
    // explained_ppm agrees with the double computation (quantization noise
    // is ~1e-6 relative; 1% band is generous)
    val trace = (0 until dim).map(i => C(i)(i)).sum
    val expectPpm = ray / trace * 1e6
    val gotPpm = Similarity.pcaPower(spark, sf)
      .select("explained_ppm").distinct().as[Long].collect()
    assert(gotPpm.length == 1)
    assert(math.abs(gotPpm(0) - expectPpm) <= 0.01 * expectPpm + 1,
      s"explained_ppm ${gotPpm(0)} vs double $expectPpm")
  }

  test("pca: loading drift at the registered round count is a converged tail (r13)") {
    // the drift between consecutive iterates decays at ~lambda2/lambda1
    // per round (0.93 here — measured 2561 micro at round 60 down to
    // 1899 at round 64); assert the registered count sits in that tail
    val v63 = Similarity.trainPc1Rounds(spark, sf, Similarity.PcaRounds - 1)
    val v64 = Similarity.trainPc1Rounds(spark, sf, Similarity.PcaRounds)
    val drift = v63.zip(v64).map { case (a, b) => math.abs(a - b) }.max
    assert(drift <= 5000, s"round-63->64 max loading drift $drift micro (>0.5% of scale)")
    assert(v64.map(math.abs).max == Similarity.PcaScale) // max-norm invariant
  }

  test("embedding outliers: z/flags equal a driver replay of the cluster moments (r13)") {
    import spark.implicits._
    val got = Similarity.embeddingOutliers(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(got.length == graft.Tables.embeddings(spark, sf).count())
    // replay from the same memoized assignment with BigInt moments
    val a = Similarity.kmeans(spark, sf)
      .select(col("vec_id"), col("cluster"), col("dist"))
      .as[(Long, Long, Long)].collect()
    val byC: Map[Long, (Double, Double)] = a.groupBy(_._2).map { case (c, rs) =>
      val n = rs.length
      val sd = rs.map(r => BigInt(r._3)).sum
      val sdd = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val mean = sd.toDouble / n.toDouble
      val std = math.sqrt(math.max(sdd.toDouble / n.toDouble - mean * mean, 0.0))
      c -> ((mean, std))
    }
    got.foreach { case (v, c, d, z, flag) =>
      val (mean, std) = byC(c)
      val ez = if (std > 0) (d - mean) / std else 0.0
      assert(math.abs(z - ez) <= 5.1e-7, s"vec $v z $z vs $ez")
      assert(flag == (d > mean + 2 * std), s"vec $v flag")
    }
    // non-vacuous: some outliers exist, most points are not outliers
    val nOut = got.count(_._5)
    assert(nOut > 0 && nOut < got.length / 4, s"outlier count $nOut")
  }

  test("pca covariance cells equal a driver BigInt replay, exactly (r13)") {
    import spark.implicits._
    // replay the integer pipeline: quantize, truncating mean, products
    val Q = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => math.round((x.toDouble + 1.0) * 1e6)).toArray }
      .sortBy(_._1)
    val n = Q.length
    val mu = Array.tabulate(64)(j => Q.map(_._2(j)).map(BigInt(_)).sum / n)
    val dv = Q.map { case (_, q) => Array.tabulate(64)(j => BigInt(q(j)) - mu(j)) }
    val want = (for { i <- 0 until 64; j <- i until 64 }
      yield (i.toLong, j.toLong) -> dv.map(r => r(i) * r(j)).sum.toString).toMap
    val got = Similarity.pcaCov(spark, sf)
      .as[(Long, Long, String)].collect()
      .map { case (i, j, s) => (i, j) -> s }.toMap
    assert(got.size == 2080)
    assert(got == want)
  }

  test("pca scores: projection serve matches a driver replay on planted ids (r13)") {
    import spark.implicits._
    val scores = Similarity.pcaScores(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(scores.size == graft.Tables.embeddings(spark, sf).count())
    // centered corpus ⇒ projections must straddle zero
    assert(scores.values.max > 0 && scores.values.min < 0)
  }

  test("rand proj: pairs equal an independent JVM replay; JL envelope holds in aggregate (r14)") {
    import spark.implicits._
    val got = Similarity.randProjPairs(spark, sf)
      .as[(Long, Long, String, String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // independent replay: rebuild the sign matrix from its definition
    // (md5 low bit of "rp:r:c"), quantize, project, distance
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val signs = Array.tabulate(16, 64) { (r, c) =>
      if (Integer.parseInt(hex(s"rp:$r:${c + 1}").substring(0, 1), 16) % 2 == 1) 1L else -1L
    }
    val Q = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => math.round((x.toDouble + 1.0) * 1e6)).toArray }
      .toMap
    def proj(q: Array[Long]) = Array.tabulate(16)(r =>
      (0 until 64).map(c => signs(r)(c) * q(c)).sum)
    got.foreach { case (va, vb, fpa, fpb, d64, d16, ppm) =>
      assert(va % 2 == 0 && vb == va + 1)
      val (qa, qb) = (Q(va), Q(vb))
      val (pa, pb) = (proj(qa), proj(qb))
      val wd64 = (0 until 64).map(c => { val d = qa(c) - qb(c); d * d }).sum
      val wd16 = (0 until 16).map(r => { val d = pa(r) - pb(r); d * d }).sum
      assert(d64 == wd64 && d16 == wd16, s"pair $va distances")
      assert(ppm == (BigInt(wd16) * 1000000 / (16 * BigInt(wd64))).toLong)
      def md5s(p: Array[Long]) = {
        val m = java.security.MessageDigest.getInstance("MD5")
        m.digest(p.mkString(",").getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      assert(fpa == md5s(pa) && fpb == md5s(pb), s"pair $va fingerprints")
    }
    // the JL claim in aggregate: mean normalized ratio near 1, and no
    // pair catastrophically distorted (4 sigma at 1/sqrt(16) rsd)
    val ratios = got.map(_._7.toDouble / 1e6)
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) <= 0.1, s"mean distortion $mean off unity")
    assert(ratios.forall(r => r > 0.05 && r < 3.0),
      s"pair distortion outside the envelope: ${ratios.min} .. ${ratios.max}")
  }

  test("rand proj topk: recall equals an exhaustive JVM replay; projected top-1 often wrong — honestly measured (r14)") {
    import spark.implicits._
    val got = Similarity.randProjTopk(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // exhaustive replay: same sign matrix, same total tie orders
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val signs = Array.tabulate(16, 64) { (r, c) =>
      if (Integer.parseInt(hex(s"rp:$r:${c + 1}").substring(0, 1), 16) % 2 == 1) 1L else -1L
    }
    val Q = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => math.round((x.toDouble + 1.0) * 1e6)).toArray }
    val P = Q.map { case (id, q) =>
      id -> Array.tabulate(16)(r => (0 until 64).map(c => signs(r)(c) * q(c)).sum)
    }.toMap
    val qm = Q.toMap
    got.foreach { case (qid, nHit, ppm, pt1, et1) =>
      def d(a: Array[Long], b: Array[Long]) =
        a.indices.map(i => { val x = a(i) - b(i); x * x }).sum
      val cands = Q.filter(_._1 != qid).map(_._1)
      val byProj = cands.sortBy(v => (d(P(qid), P(v)), v))
      val byExact = cands.sortBy(v => (d(qm(qid), qm(v)), v))
      val hit = byProj.take(10).toSet.intersect(byExact.take(10).toSet).size
      assert(nHit == hit.toLong, s"q $qid recall")
      assert(ppm == nHit * 1000000L / 10)
      assert(pt1 == byProj.head && et1 == byExact.head, s"q $qid top1s")
    }
    // the honest aggregate: some signal survives the 4x compression on
    // this distance-concentrated corpus, but far from perfect recall
    val mean = got.map(_._2).sum.toDouble / (10.0 * got.length)
    assert(mean > 0.05 && mean < 0.95, s"mean recall@10 $mean outside the honest band")
  }

  test("label purity: majority stats equal a driver replay of the assignment; chance-floor honesty (r14)") {
    import spark.implicits._
    val got = Similarity.labelPurity(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val a = Similarity.kmeans(spark, sf)
      .select(col("cluster"), col("label").cast("long"))
      .as[(Long, Long)].collect()
    val byCluster = a.groupBy(_._1)
    assert(got.map(_._1).toSet == byCluster.keySet)
    var totMaj = 0L
    got.foreach { case (c, n, majL, nMaj, ppm) =>
      val labels = byCluster(c).map(_._2)
      assert(n == labels.length.toLong)
      val counts = labels.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val (wantL, wantN) = counts.toSeq.minBy { case (l, cnt) => (-cnt, l) }
      assert((majL, nMaj) == (wantL, wantN), s"cluster $c majority")
      assert(ppm == nMaj * 1000000L / n)
      totMaj += nMaj
    }
    // honesty pin: on this near-isotropic corpus purity sits above the
    // 1/|labels| chance floor but FAR below a separable corpus's — the
    // eval's job is to report that, so pin both sides
    val nAll = a.length
    val nLabels = a.map(_._2).distinct.length
    val overall = totMaj.toDouble / nAll
    assert(overall >= 1.0 / nLabels, s"purity $overall under the chance floor")
    assert(overall < 0.9, s"purity $overall suspiciously separable — fixture changed?")
  }

  test("pca covariance append twin: re-summed cells equal the one-shot build bit-for-bit; halves non-trivial (r14)") {
    import spark.implicits._
    val full = Similarity.pcaCov(spark, sf)
      .as[(Long, Long, String)].collect().map { case (i, j, s) => (i, j) -> s }.toMap
    val incr = Similarity.pcaCovIncremental(spark, sf)
      .as[(Long, Long, String)].collect().map { case (i, j, s) => (i, j) -> s }.toMap
    assert(incr.size == 2080)
    assert(incr == full, "appended scatter cells diverge from the one-shot build")
    // non-vacuous: both halves contribute (even and odd vec_ids exist)
    val par = graft.Tables.embeddings(spark, sf)
      .select((col("vec_id") % 2).as("p")).distinct().as[Long].collect().toSet
    assert(par == Set(0L, 1L), "fixture degenerate: one parity class missing")
  }

  test("raw-moment store recenters at the merged mean to the exact one-shot scatter (r15)") {
    import spark.implicits._
    val full = Similarity.pcaCov(spark, sf)
      .as[(Long, Long, String)].collect().map { case (i, j, s) => (i, j) -> s }.toMap
    val rec = Similarity.pcaCovRecentered(spark, sf)
      .as[(Long, Long, String)].collect().map { case (i, j, s) => (i, j) -> s }.toMap
    assert(rec.size == 2080)
    assert(rec == full, "recentered raw-moment cells diverge from the one-shot build")
    // non-vacuous: the two stored batches genuinely SHIFT the mean — at
    // least one dimension's truncated batch means differ, so the serve
    // really exercises the cross-term algebra, not just cell additivity
    val Q = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => math.round((x.toDouble + 1.0) * 1e6)) }
    def mu(rows: Array[(Long, Seq[Long])]) =
      Array.tabulate(64)(j => rows.map(_._2(j)).map(BigInt(_)).sum / rows.length)
    val (ev, od) = Q.partition(_._1 % 2 == 0)
    assert(!mu(ev).sameElements(mu(od)),
      "fixture degenerate: even/odd halves share every truncated mean cell")
  }

  test("pca topk: every eigen-verdict TRUE, trace exact vs BigInt replay, jacobiEig agrees with the independent solver (r14)") {
    import spark.implicits._
    val full = Similarity.pcaTopk(spark, sf)
    // the r15 diag column reads 'ok' exactly when every verdict holds
    assert(full.select("diag").as[String].collect().forall(_ == "ok"))
    val rows = full
      .select("component", "n_vectors", "trace_str", "rayleigh_ok",
        "resid_ok", "orth_ok", "order_ok", "top_beats_iterate")
      .as[(Long, Long, String, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    rows.foreach { case (c, _, _, ray, res, orth, ord, beat) =>
      assert(ray, s"component $c: Rayleigh disagrees with the eigensolve")
      assert(res, s"component $c: distributed residual too large")
      assert(orth && ord && beat, s"component $c: orth/order/beats-iterate failed")
    }
    // trace replay: same integer pipeline as the covariance cells test
    val Q = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => math.round((x.toDouble + 1.0) * 1e6)).toArray }
    val n = Q.length
    val mu = Array.tabulate(64)(j => Q.map(_._2(j)).map(BigInt(_)).sum / n)
    val trace = Q.map { case (_, q) =>
      (0 until 64).map(j => { val d = BigInt(q(j)) - mu(j); d * d }).foldLeft(BigInt(0))(_ + _)
    }.foldLeft(BigInt(0))(_ + _)
    assert(rows.forall(r => r._2 == n.toLong && r._3 == trace.toString))
    // the production full solver's top eigenvalue equals the spec's
    // INDEPENDENT top-eig-only Jacobi on the same exact cells
    val s = Similarity.pcaCovMatrix(spark, sf).map(_.map(_.toDouble))
    val (evals, evecs) = Similarity.jacobiEig(s)
    val top = evals.max
    val topIndep = jacobiTopEig(s)
    assert(math.abs(top - topIndep) <= 1e-9 * topIndep,
      s"jacobiEig top $top vs independent $topIndep")
    // and its eigenvectors are mutually orthonormal to solver precision
    val k = evals.indices.sortBy(i => -evals(i)).take(2)
    val (v1, v2) = (evecs(k(0)), evecs(k(1)))
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(v1, v2)) <= 1e-9)
    assert(math.abs(dot(v1, v1) - 1.0) <= 1e-9 && math.abs(dot(v2, v2) - 1.0) <= 1e-9)
  }

  test("pca pc2: integer deflated trainer tracks a double-precision replay of the same rounds (r14)") {
    val D = pcaCenteredDoubles()
    val dim = 64
    // double deflated power iteration, SAME rounds / start / projection /
    // max-norm scheme as trainPc2Rounds
    val v1 = Similarity.trainedPc1(spark, sf).map(_.toDouble)
    val vv1 = v1.map(x => x * x).sum
    var u = Array.fill(dim)(1.0)
    for (_ <- 1 to Similarity.Pc2Rounds) {
      val w = Array.fill(dim)(0.0)
      D.foreach { dv =>
        var d = 0.0; var j = 0
        while (j < dim) { d += dv(j) * u(j); j += 1 }
        j = 0; while (j < dim) { w(j) += d * dv(j); j += 1 }
      }
      val q = (0 until dim).map(i => w(i) * v1(i)).sum / vv1
      val w2 = (0 until dim).map(i => w(i) - q * v1(i)).toArray
      val mx = w2.map(math.abs).max
      u = w2.map(_ / mx)
    }
    val ui = Similarity.trainedPc2(spark, sf).map(_.toDouble)
    val cos = math.abs(
      (0 until dim).map(j => ui(j) * u(j)).sum /
        (math.sqrt(ui.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum)))
    assert(cos > 0.9999, s"integer deflated iterate diverges from double replay: cos=$cos")
    assert(ui.map(math.abs).max == Similarity.PcaScale.toDouble) // max-norm invariant
    // deflation contract: the iterate is orthogonal to the trained PC1
    // up to integer truncation (each round projects v1 off exactly)
    val vi1 = Similarity.trainedPc1(spark, sf)
    val ui2 = Similarity.trainedPc2(spark, sf)
    val d12 = (0 until dim).map(i => BigInt(vi1(i)) * BigInt(ui2(i))).foldLeft(BigInt(0))(_ + _)
    val n1 = math.sqrt(vi1.map(x => x.toDouble * x).sum)
    val n2 = math.sqrt(ui2.map(x => x.toDouble * x).sum)
    assert(d12.abs.toDouble <= 1e-3 * n1 * n2,
      s"PC2 iterate not orthogonal to PC1: cos=${d12.toDouble / (n1 * n2)}")
  }

  test("pca scores2: per-vector projections are the exact dots; ppms in range (r14)") {
    import spark.implicits._
    val got = Similarity.pcaScores2(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == graft.Tables.embeddings(spark, sf).count())
    val ex1 = got.map(_._4).distinct
    val ex2 = got.map(_._5).distinct
    assert(ex1.length == 1 && ex2.length == 1)
    assert(ex1(0) > 0 && ex1(0) <= 1000000 && ex2(0) > 0 && ex2(0) <= 1000000)
    // score1 must agree with the already-proven single-component serve
    val s1 = Similarity.pcaScores(spark, sf).as[(Long, Long)].collect().toMap
    got.foreach { case (id, a, _, _, _) => assert(a == s1(id)) }
    // both components straddle zero on the centered corpus
    assert(got.map(_._2).max > 0 && got.map(_._2).min < 0)
    assert(got.map(_._3).max > 0 && got.map(_._3).min < 0)
  }
}
