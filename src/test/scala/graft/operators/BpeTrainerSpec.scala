package graft.operators

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {

  /** Local reference BPE (the textbook algorithm on a word histogram) —
    * the distributed trainer must reproduce its merge sequence exactly. */
  private def localBpe(words: Map[String, Long], nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    var hist = words.map { case (w, n) => (w.map(_.toString): Seq[String], n) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.size < nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      hist.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + n
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best.filter(_._2 >= minCount) match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          hist = hist.map { case (syms, n) =>
            (BpeTrainer.applyMerge(syms, a, b), n)
          }
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    (1L, "low low low lower lower"),
    (2L, "newest newest newest newest widest widest"),
    (3L, "low newest widest lowest"))

  test("distributed trainer reproduces the textbook merge sequence exactly") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val got = BpeTrainer.train(docs, "text", nMerges = 12)
    val want = localBpe(words, nMerges = 12)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty)
  }

  test("applyMerge is left-to-right greedy (no overlapping merges)") {
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a", "a"), "a", "a") ==
      Seq("aa", "aa"))
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a"), "a", "a") ==
      Seq("aa", "a"))
    assert(BpeTrainer.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(BpeTrainer.applyMerge(Nil, "a", "b") == Nil)
  }

  test("countTokens shrinks monotonically with more merges, floors at word count") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", nMerges = 12)
    def total(ms: Seq[(String, String)]): Long =
      BpeTrainer.countTokens(docs, "doc_id", "text", ms)
        .agg(org.apache.spark.sql.functions.sum($"n_bpe_tokens"))
        .as[Long].head()
    val noMerge = total(Nil)
    val char = corpus.map(_._2.replace(" ", "").length.toLong).sum
    assert(noMerge == char, "zero merges = character tokenization")
    val totals = merges.indices.map(i => total(merges.take(i + 1)))
    assert(totals.zip(noMerge +: totals).forall { case (after, before) => after <= before },
      s"token totals must shrink monotonically: $totals")
    val words = corpus.map(_._2.split(" ").length.toLong).sum
    assert(totals.last >= words, "cannot go below one token per word")
  }

  test("determinism: retraining yields the identical merge list") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    assert(BpeTrainer.train(docs, "text", 8) == BpeTrainer.train(docs, "text", 8))
  }
}
