package graft

import graft.operators.SuffixDedup

/** The suffix-array substring dedup (r15): planted-span exactness, full
  * honesty of every reported span against the raw text, and a brute-force
  * cross-check of the maximum on the real corpus — three independent
  * routes to the same numbers, none sharing code with the operator.
  */
class SuffixDedupSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("planted duplicated span is found with its exact length and positions") {
    import spark.implicits._
    // docs 1 and 2 share exactly the 5-token run "q w e r t"; all filler
    // tokens are unique, so the top span must be that run and the
    // staggered suffix tails must follow at lengths 4, 3, 2
    val docs = Seq(
      (1L, "a b q w e r t c d"),
      (2L, "u v x q w e r t y z"),
      (3L, "m n o p")
    ).toDF("doc_id", "text")
    val got = SuffixDedup.suffixDedupFrom(docs, SuffixDedup.buildRanks(docs))
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(5L, 4L, 3L, 2L),
      s"expected staggered lcps 5,4,3,2; got ${got.map(_.getLong(0)).mkString(",")}")
    val top = got.head
    val pair = Set((top.getLong(1), top.getLong(2)), (top.getLong(3), top.getLong(4)))
    assert(pair == Set((1L, 3L), (2L, 4L)), s"top span at wrong positions: $pair")
    assert(top.getString(5) == md5hex("q w e r t"))
  }

  test("identical-tail edge: equal full suffixes cap at the true remaining length") {
    import spark.implicits._
    // both docs END with "x y" — sentinel-padded rank equality must cap
    // at the real 2-token agreement, not the walk's power-sum overshoot
    val docs = Seq((1L, "a x y"), (2L, "b x y")).toDF("doc_id", "text")
    val got = SuffixDedup.suffixDedupFrom(docs, SuffixDedup.buildRanks(docs))
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L), "expected exactly the lcp-2 span")
    val top = got.head
    assert(Set((top.getLong(1), top.getLong(2)), (top.getLong(3), top.getLong(4)))
      == Set((1L, 2L), (2L, 2L)))
  }

  test("every reported span is genuinely duplicated — tokens and fingerprint verified from raw text") {
    val spans = SuffixDedup.suffixDedup(spark, sf).collect()
    assert(spans.nonEmpty, "corpus has no duplicated span >= 2 tokens?")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    spans.foreach { r =>
      val (lcp, da, pa, db, pb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert((da, pa) != (db, pb), "span paired with itself")
      val sa = docs(da).slice(pa.toInt - 1, pa.toInt - 1 + lcp.toInt)
      val sb = docs(db).slice(pb.toInt - 1, pb.toInt - 1 + lcp.toInt)
      assert(sa.length == lcp && sb.length == lcp,
        s"span runs past a document end: ($da,$pa)/($db,$pb) lcp=$lcp")
      assert(sa.sameElements(sb), s"span tokens differ: ($da,$pa) vs ($db,$pb) lcp=$lcp")
      assert(r.getString(5) == md5hex(sa.mkString(" ")), "fingerprint mismatch")
    }
  }

  test("top lcp equals the brute-force longest duplicated substring on the real corpus") {
    val spans = SuffixDedup.suffixDedup(spark, sf).collect()
    val top = spans.head.getLong(0)
    // independent driver-side brute force: hash every span of length
    // `top + 1` — if none duplicates, `top` is maximal; and at least one
    // length-`top` span must duplicate (existence, from the honesty test)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" "))
    def hasDupOfLen(len: Int): Boolean = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      docs.exists { toks =>
        (0 to toks.length - len).exists { i =>
          !seen.add(toks.slice(i, i + len).mkString(" "))
        }
      }
    }
    assert(hasDupOfLen(top.toInt), s"reported max lcp $top has no duplicate?!")
    assert(!hasDupOfLen(top.toInt + 1),
      s"a duplicated span of length ${top + 1} exists but the suffix array reported max $top")
  }
}
