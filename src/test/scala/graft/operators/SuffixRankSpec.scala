package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Prefix-doubling suffix ranks + adjacent LCP vs a brute-force suffix
  * sort: exact rank classes, exact adjacency, exact LCP — including
  * identical documents (suffix ties to the end), a single-repeated-token
  * doc (the plateau-vs-all-distinct stop case), and a slice of the real
  * fixture corpus. */
class SuffixRankSpec extends SparkSpec {

  private implicit val seqOrd: Ordering[Seq[String]] =
    new Ordering[Seq[String]] {
      def compare(x: Seq[String], y: Seq[String]): Int = {
        var i = 0
        while (i < x.length && i < y.length) {
          val c = x(i).compareTo(y(i))
          if (c != 0) return c
          i += 1
        }
        x.length.compareTo(y.length)
      }
    }

  /** Brute suffix order: ((doc, pos, suffix) sorted by (suffix, doc,
    * pos)), dense suffix ranks keyed by (doc, pos), and adjacent LCPs
    * keyed by ((a_doc, a_pos), (b_doc, b_pos)). */
  private def brute(docs: Seq[(Long, String)]) = {
    val sfx = docs.flatMap { case (id, text) =>
      val w = text.trim.split("\\s+").toSeq
      w.indices.map(i => (id, i.toLong, w.drop(i)))
    }
    val sorted = sfx.sortBy { case (id, p, s) => (s, id, p) }
    val denseOf = sorted.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, i) => (s, i + 1L) }.toMap
    val ranks = sorted.map { case (id, p, s) => ((id, p), denseOf(s)) }.toMap
    val lcps = sorted.sliding(2).collect {
      case Seq((ad, ap, a), (bd, bp, b)) =>
        ((ad, ap, bd, bp),
          a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong)
    }.toMap
    (ranks, lcps)
  }

  private def run(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    val toks = docs.toDF("doc_id", "text")
      .select($"doc_id", posexplode(split(trim($"text"), "\\s+")))
      .toDF("doc_id", "pos", "tok")
    val lvls = SuffixRank.levels(toks)
    val ranks = lvls.last._2
      .select($"doc_id", $"pos", $"r")
      .as[(Long, Long, Long)].collect()
      .map { case (d, p, r) => ((d, p), r) }.toMap
    val lcps = SuffixRank.adjacentLcp(lvls)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (ad, ap, bd, bp, l) => ((ad, ap, bd, bp), l) }.toMap
    (lvls, ranks, lcps)
  }

  private val corpus = Seq(
    1L -> "a b a b a",
    2L -> "b a b x a",
    3L -> "a b a b a", // identical to doc 1: full-suffix ties
    4L -> "z z z z z z", // repeated token: ranks never all-distinct early
    5L -> "x")

  test("suffix ranks match a brute-force suffix sort (dense, tie = identical suffix)") {
    val (expRanks, _) = brute(corpus)
    val (_, gotRanks, _) = run(corpus)
    assert(gotRanks == expRanks)
  }

  test("adjacent LCP array matches brute force, including ties-to-the-end and the length cap") {
    val (_, expLcps) = brute(corpus)
    val (_, _, gotLcps) = run(corpus)
    assert(gotLcps == expLcps)
  }

  test("plateau stop: the ladder never exceeds log2(maxLen)+1 levels and stays correct on all-equal tokens") {
    val docs = Seq(1L -> "z z z z z z z z", 2L -> "z z z")
    val (expRanks, expLcps) = brute(docs)
    val (lvls, gotRanks, gotLcps) = run(docs)
    assert(lvls.size <= 5, s"8-token docs need at most k=1,2,4,8,16: got ${lvls.map(_._1)}")
    assert(gotRanks == expRanks)
    assert(gotLcps == expLcps)
  }

  test("early plateau on duplicate docs with distinct tokens: LCP reaches the full doc length (round-7 ADVICE)") {
    // identical docs of 4 DISTINCT tokens plateau the ladder at K=2;
    // pre-fix the descent capped LCP at 2K-1=3 instead of 4, so q214's
    // L=8 scrub would miss whole-doc duplicates on dup-heavy corpora
    val docs = Seq(1L -> "a b c d", 2L -> "a b c d")
    val (expRanks, expLcps) = brute(docs)
    val (lvls, gotRanks, gotLcps) = run(docs)
    assert(lvls.map(_._1) == Seq(1L, 2L),
      s"distinct-token duplicate docs must plateau at K=2: got ${lvls.map(_._1)}")
    assert(gotRanks == expRanks)
    assert(gotLcps == expLcps)
    assert(gotLcps.values.max == 4L, "whole-doc duplicate LCP must reach doc length")
  }

  test("early plateau with a run past L=8: the q214 scrub sees the full duplicated run") {
    // 9 distinct tokens, two identical docs — plateau at K=4 (pre-fix
    // cap 2K-1=7 < 8 would scrub NOTHING at L=8)
    val docs = Seq(
      1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9",
      2L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9")
    val (expRanks, expLcps) = brute(docs)
    val (_, gotRanks, gotLcps) = run(docs)
    assert(gotRanks == expRanks)
    assert(gotLcps == expLcps)
    assert(gotLcps.values.max == 9L)
  }

  test("q214 scrub invariants: removal bounded, untouched docs keep their exact text") {
    val s = spark
    import s.implicits._
    val res = graft.SparkEntry.queries("q214_exact_scrub")(s, sfDir)
      .localCheckpoint()
    assert(res.where($"n_removed" > $"n_tok" || $"n_removed" < 0).isEmpty)
    val untouched = res.where($"n_removed" === 0)
      .join(Tables.documents(s, sfDir), Seq("doc_id"))
      .select($"doc_id", $"clean_md5",
        md5(concat_ws(" ", split(trim($"text"), "\\s+")).cast("binary"))
          .as("orig_md5"))
    assert(untouched.count() > 0, "fixture should have some untouched docs")
    assert(untouched.where($"clean_md5" =!= $"orig_md5").isEmpty,
      "a doc with nothing removed must reassemble to its exact token text")
  }

  test("fixture slice: ranks and LCPs match brute force on real corpus text") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir)
      .where($"text".isNotNull && $"doc_id".isNotNull &&
        length(trim($"text")) > 0)
      .select($"doc_id", $"text").orderBy($"doc_id").limit(40)
      .as[(Long, String)].collect().toSeq
    val (expRanks, expLcps) = brute(docs)
    val (_, gotRanks, gotLcps) = run(docs)
    assert(gotRanks == expRanks)
    assert(gotLcps == expLcps)
  }
}
