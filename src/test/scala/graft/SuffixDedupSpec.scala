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

  test("degenerate repetition: self-overlapping all-same-token spans cap exactly, brute force agrees") {
    import spark.implicits._
    // the hardest walk path: suffixes of one repeated token tie at every
    // level until the sentinel coordinate separates unequal tails — the
    // top span must be doc 1's pos-1 vs pos-2 SELF-overlap at lcp 5
    // (pos-2's full remaining length), not the power-sum overshoot
    val docs = Seq(
      (1L, "a a a a a a"),
      (2L, "a a a a"),
      (3L, "b c d e f")
    ).toDF("doc_id", "text")
    val got = SuffixDedup.suffixDedupFrom(docs, SuffixDedup.buildRanks(docs))
      .collect()
    assert(got.nonEmpty)
    val top = got.head
    assert(top.getLong(0) == 5L, s"expected top lcp 5, got ${top.getLong(0)}")
    // every reported span must verify against the raw text (the honesty
    // loop from the corpus test, on the adversarial fixture)
    val toks = Map(1L -> Array.fill(6)("a"), 2L -> Array.fill(4)("a"),
      3L -> Array("b", "c", "d", "e", "f"))
    got.foreach { r =>
      val (lcp, da, pa, db, pb) =
        (r.getLong(0).toInt, r.getLong(1), r.getLong(2).toInt, r.getLong(3), r.getLong(4).toInt)
      val sa = toks(da).slice(pa - 1, pa - 1 + lcp)
      val sb = toks(db).slice(pb - 1, pb - 1 + lcp)
      assert(sa.length == lcp && sb.length == lcp && sa.sameElements(sb),
        s"degenerate span verification failed: ($da,$pa)/($db,$pb) lcp=$lcp")
    }
    // independent brute force: max duplicated length over ALL position
    // pairs (self-overlaps included) is exactly 5
    def hasDup(len: Int): Boolean = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      toks.values.exists(t => (0 to t.length - len)
        .exists(i => !seen.add(t.slice(i, i + len).mkString(" "))))
    }
    assert(hasDup(5) && !hasDup(6))
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

  test("mask coverage: planted fixture marks exactly the duplicated run and nothing else") {
    import spark.implicits._
    // docs 1 and 2 share a MaskMinLen-long run; doc 3 is clean — the mask
    // must cover exactly those positions on both sides
    val run = ('a' to 'j').map(c => s"$c$c").mkString(" ") // 10 unique-ish shared tokens
    val docs = Seq(
      (1L, s"u1 u2 $run u3"),
      (2L, s"v1 $run v2 v3"),
      (3L, "w1 w2 w3 w4")
    ).toDF("doc_id", "text")
    val got = graft.operators.SuffixDedup.suffixMaskFrom(docs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 13L, 10L), (2L, 13L, 10L), (3L, 4L, 0L)),
      s"mask coverage wrong: $got")
    assert(got.head._4 == 10L * 1000000 / 13L)
  }

  test("mask honesty on the real corpus: every covered doc's count is within its length; full-dup docs are fully covered") {
    import spark.implicits._
    val mask = graft.operators.SuffixDedup.suffixMask(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(mask.nonEmpty)
    mask.foreach { case (d, n, nd, ppm) =>
      assert(nd >= 0 && nd <= n, s"doc $d: coverage $nd outside [0, $n]")
      assert(ppm == nd * 1000000 / n)
    }
    // the corpus plants whole-document duplicates (q_dedup_exact's
    // fixture); a doc whose top span runs pos 1 → its full length has a
    // verbatim twin and must be 100% covered
    val byDoc = mask.map(r => r._1 -> r).toMap
    val top = graft.operators.SuffixDedup.suffixDedup(spark, sf)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    val fullDup = top.collect {
      case (lcp, da, 1L, _, _, _) if lcp == byDoc(da)._2 => da
    }.toSet
    assert(fullDup.nonEmpty, "no whole-document duplicate in the top spans?")
    fullDup.foreach { d =>
      val (_, n, nd, _) = byDoc(d)
      assert(nd == n, s"full-duplicate doc $d only covered $nd of $n tokens")
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
