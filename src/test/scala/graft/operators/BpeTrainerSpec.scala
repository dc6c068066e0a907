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

  test("batched trainer equals the sequential sequence on the textbook corpus") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val want = localBpe(words, nMerges = 12)
    for (mb <- Seq(1, 4, 32)) {
      val got = BpeTrainer.trainBatched(docs, "text", nMerges = 12, maxBatch = mb)
      assert(got == want, s"maxBatch=$mb: got $got\nwant $want")
    }
  }

  test("batched == sequential on seeded random corpora (stop-rule safety)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val alpha = if (trial % 2 == 0) "abc" else "abcdef"
      val hist: Map[String, Long] = (1 to 14).map { _ =>
        val w = (1 to (1 + rnd.nextInt(5)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }
      val docs = hist.toSeq.zipWithIndex
        .map { case ((w, n), i) => (i.toLong, Seq.fill(n.toInt)(w).mkString(" ")) }
        .toDF("doc_id", "text")
      val got = BpeTrainer.trainBatched(docs, "text", nMerges = 10, maxBatch = 8)
      val want = localBpe(hist, nMerges = 10)
      assert(got == want, s"trial $trial (alpha=$alpha, hist=$hist):\ngot $got\nwant $want")
    }
  }

  test("batching cuts driver actions >=10x on a disjoint-pair corpus") {
    val s = spark
    import s.implicits._
    // 64 two-char words over 128 distinct characters: every pair is
    // symbol-disjoint from every other and no triples exist, so rounds
    // accept full batches — the regime a real (large-alphabet, post-warmup)
    // vocabulary run approaches once frequent pairs stop sharing symbols.
    val docs = (0 until 64).map { i =>
      val w = "" + (0x3400 + 2 * i).toChar + (0x3400 + 2 * i + 1).toChar
      (i.toLong, Seq.fill(200 - i)(w).mkString(" "))
    }.toDF("doc_id", "text").cache()
    docs.count()
    def jobsOf(group: String)(f: => Unit): Int = {
      s.sparkContext.setJobGroup(group, group)
      try f finally s.sparkContext.clearJobGroup()
      Thread.sleep(1500) // status tracker updates off the async listener bus
      s.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    var seqMerges: Seq[(String, String)] = Nil
    var batMerges: Seq[(String, String)] = Nil
    val seqJobs = jobsOf("bpe-seq") { seqMerges = BpeTrainer.train(docs, "text", 64) }
    val batJobs = jobsOf("bpe-bat") { batMerges = BpeTrainer.trainBatched(docs, "text", 64) }
    assert(seqMerges == batMerges, "sequences must agree")
    assert(seqMerges.size == 64)
    assert(batJobs * 10 <= seqJobs,
      s"batched must use >=10x fewer driver actions: batched=$batJobs sequential=$seqJobs")
    docs.unpersist()
  }

  test("determinism: retraining yields the identical merge list") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    assert(BpeTrainer.train(docs, "text", 8) == BpeTrainer.train(docs, "text", 8))
  }
}
