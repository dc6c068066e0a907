package graft.operators

import graft.SparkSpec

/** Production-parameter coverage for the NearDup operators: the oracle
  * queries (q47/q49/q77) pin the fixture widths (nh=9/b=3/r=3, 32-bit);
  * these tests drive the same code at widened signatures (nh=16/b=4/r=4,
  * 64-bit simhash) over a controlled fixture with known duplicates. */
class NearDupSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    // 1↔2 identical, 3 a near-dup of 1 (one token changed), 4/5 unrelated
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different text about spark catalyst physical planning"),
      (5L, "embedding vectors bucket into inverted file lists for probing")
    ).toDF("doc_id", "text")
  }

  test("minhashPairs at widened signature (nh=16, b=4, r=4) finds the dup clique") {
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text", k = 3, nh = 16, b = 4, r = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined, s"identical docs must pair: $pairs")
    assert(exact.get._3 == 4L, "identical docs agree on all 4 bands")
    assert(pairs.forall(p => p._3 >= 1L && p._3 <= 4L))
    assert(!pairs.exists(p => p._2 == 4L || p._2 == 5L || p._1 == 4L || p._1 == 5L),
      "unrelated docs must not pair")
  }

  test("lshDropIds keeps one representative per clique at any signature width") {
    for ((nh, b, r) <- Seq((9, 3, 3), (16, 4, 4))) {
      val dropped = NearDup.lshDropIds(docs, "doc_id", "text", 3, nh, b, r)
        .collect().map(_.getLong(0)).toSet
      assert(dropped.contains(2L), s"nh=$nh: doc 2 duplicates doc 1")
      assert(!dropped.contains(1L), s"nh=$nh: min id is the keeper")
      assert(!dropped.contains(4L) && !dropped.contains(5L), s"nh=$nh: uniques kept")
    }
  }

  test("64-bit simhash uses the high word and preserves near-dup structure") {
    val sims = NearDup.simhashes(docs, "doc_id", "text", k = 3, bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L), "identical docs share the simhash")
    // bits above 31 must participate — a 32-bit-truncated hash would
    // leave the high word all zeros for every doc
    assert(sims.values.exists(s => (s >>> 32) != 0L), s"high word unused: $sims")
    val pairs = NearDup.simhashPairs(docs, "doc_id", "text", k = 3, bits = 64, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L),
      s"identical docs at hamming 0: ${pairs.toSeq}")
    assert(pairs.forall(p => p._3 <= 6L))
  }

  test("invalid parameter combinations are rejected") {
    intercept[IllegalArgumentException] {
      NearDup.lshBands(docs, "doc_id", "text", k = 3, nh = 9, b = 4, r = 3)
    }
    intercept[IllegalArgumentException] {
      NearDup.simhashes(docs, "doc_id", "text", bits = 48)
    }
  }
}
