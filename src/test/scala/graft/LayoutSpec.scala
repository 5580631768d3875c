package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Layout

/** Z-order layout: kernel correctness against independent bit math, and the
  * measurable data-skipping claim — Z-clustering gives usable min/max
  * pruning on BOTH dimensions where a single-column sort serves only its
  * leading key.
  */
class LayoutSpec extends SparkSpec {

  test("MortonInterleave equals independent bit math on random key pairs") {
    import spark.implicits._
    import graft.functions.MortonFunctions.morton
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x & 0xFFFFL) >> i) & 1L) << (2 * i) |
          (((y & 0xFFFFL) >> i) & 1L) << (2 * i + 1)
      }
    val pair = Gen.zip(Gen.choose(0L, 200000L), Gen.choose(0L, 200000L))
    val pairs = (0 until 40).flatMap(i => pair.apply(Gen.Parameters.default, Seed(7L + i)))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), morton(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == ref(x, y), s"morton($x, $y)") }
    // interleave must be monotone per 16-bit dimension at fixed other key
    assert(ref(3, 0) < ref(5, 0) && ref(0, 3) < ref(0, 5))
  }

  test("z-order layout skips files on BOTH dimensions; single-key sort only on one") {
    // range-normalized z (the production path): raw interleave would let
    // the wider key's high bits dominate the ordering at this scale
    val li = Layout.withNormalizedZ(
      Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey")
    val nParts = 8
    def spans(orderCol: String): Seq[(Long, Long, Long, Long)] =
      Layout.partitionSpans(li, orderCol, nParts)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val zSpans = spans("zcode")
    val pSpans = spans("l_partkey")
    assert(zSpans.size > 1 && pSpans.size > 1)
    // a reader filtering a narrow slice of EITHER dimension consults the
    // per-file min/max: count the partitions it cannot skip
    val (pLo, pHi) = (Tables.lineitem(spark, sf).agg(min("l_partkey"), max("l_partkey"))
      .collect()(0) match { case r => (r.getLong(0), r.getLong(1)) })
    val (sLo, sHi) = (Tables.lineitem(spark, sf).agg(min("l_suppkey"), max("l_suppkey"))
      .collect()(0) match { case r => (r.getLong(0), r.getLong(1)) })
    def hitP(spans: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long) =
      spans.count { case (a, b, _, _) => a <= hi && lo <= b }
    def hitS(spans: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long) =
      spans.count { case (_, _, a, b) => a <= hi && lo <= b }
    // a 1/4-range slice of each dimension, anchored at the low end so it
    // sits inside one top-level Z quadrant (a mid-range slice straddles
    // the first split boundary and legitimately hits every partition)
    val pSlice = (pLo, pLo + (pHi - pLo) / 4)
    val sSlice = (sLo, sLo + (sHi - sLo) / 4)
    // partkey-sorted layout: perfect on partkey, useless on suppkey
    assert(hitP(pSpans, pSlice._1, pSlice._2) < nParts)
    assert(hitS(pSpans, sSlice._1, sSlice._2) == pSpans.size,
      "single-key sort unexpectedly clustered the second dimension")
    // z-ordered layout: skips some partitions on EACH dimension
    assert(hitP(zSpans, pSlice._1, pSlice._2) < zSpans.size,
      s"z-order gave no partkey pruning: $zSpans")
    assert(hitS(zSpans, sSlice._1, sSlice._2) < zSpans.size,
      s"z-order gave no suppkey pruning: $zSpans")
  }

  test("compaction: every day drops to one file with content byte-identical (r12)") {
    import spark.implicits._
    import graft.operators.Layout
    val report = Layout.compactionReport(spark, sf).collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      assert(r.getBoolean(3), s"day ${r.getLong(0)} was not compacted")
      assert(r.getBoolean(4), s"day ${r.getLong(0)} left >1 file")
    }
    // content check: per-day rows and cents must match the source table
    val got = report.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Tables.events(spark, sf)
      .select(expr("ts div 86400000000000")).distinct().as[Long].collect().toSet)
    got.foreach { case (d, (n, cents)) =>
      val w = Tables.events(spark, sf)
        .filter(expr(s"ts div 86400000000000 = $d"))
        .agg(count(lit(1)), sum(expr("CAST(round(value * 100) AS BIGINT)")))
        .as[(Long, Long)].head()
      assert((n, cents) == w, s"day $d content changed")
    }
  }

  test("binpack compaction: per-day file count is exactly ceil(rows/target), content unchanged (r13)") {
    import spark.implicits._
    import graft.operators.Layout
    val report = Layout.compactionBinpack(spark, sf).collect()
    assert(report.nonEmpty)
    report.foreach(r => assert(r.getBoolean(3),
      s"day ${r.getLong(0)}: file count is not ceil(rows/target)"))
    // the target genuinely splits at this SF — some day rolled >1 file,
    // i.e. the verdict is not vacuously 'one file per day'
    val days = report.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = days.values.sum
    val target = math.max(1L, (total + 119L) / 120L)
    assert(days.values.exists(_ > target),
      "fixture must have at least one day large enough to split")
    // content contract: same per-day rows and cents as the source
    days.foreach { case (d, n) =>
      val w = Tables.events(spark, sf)
        .filter(expr(s"ts div 86400000000000 = $d")).count()
      assert(n == w, s"day $d row count changed")
    }
  }

  test("join profile: predicted output cardinality equals the actual join count (r12)") {
    import spark.implicits._
    val p = graft.operators.Relational.joinSizeProfile(spark, sf).head()
    val actual = Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
      col("o_orderkey") === col("l_orderkey")).count()
    // est_out_rows/max_key_fanout render as decimal digit strings (the
    // overflow-proof DECIMAL(38,0) kept to the readout — ADVICE r12)
    assert(p.getString(4).toLong == actual,
      s"est_out_rows ${p.getString(4)} vs actual $actual")
    assert(p.getLong(0) == Tables.orders(spark, sf).count())
    assert(p.getLong(1) == Tables.lineitem(spark, sf).count())
    assert(p.getString(5).forall(_.isDigit) && p.getString(5).toLong >= 1L
      && p.getLong(6) <= p.getLong(2))
  }
}
