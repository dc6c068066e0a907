package graft

/** Provable invariants of the round-9 report queries — properties that
  * must hold on ANY corpus, asserted on the sf0.001 fixture:
  *
  *  - q247: the curve is a coherent confusion sweep — n_keep = tp+fp,
  *    tp+fp+fn+tn is the same eval-slice size at every τ, n_keep is
  *    NONINCREASING in τ (keep = logit ≥ τ), and the τ = 0 row equals
  *    q242's per-source confusion totals exactly (same trainer, same
  *    slice, q242's gate IS τ = 0).
  */
class RoundNineInvariantSpec extends SparkSpec {

  test("q247: partition/monotonicity invariants and the τ=0 row equals " +
    "q242's totals") {
    val s = spark
    import s.implicits._
    val rows = SparkEntry.queries("q247_gate_calibration")(s, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.length == 9, "one row per ladder threshold")
    val evalSizes = rows.map { case (_, nk, tp, fp, fn, tn) =>
      assert(nk == tp + fp, "n_keep must equal tp + fp")
      tp + fp + fn + tn
    }
    assert(evalSizes.distinct.length == 1,
      "every τ sees the same eval slice")
    assert(evalSizes.head > 0, "empty eval slice")
    rows.map(_._2).toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, "n_keep must be nonincreasing in τ")
    case _ => ()
    }
    val zero = rows.find(_._1 == 0L).get
    val q242 = SparkEntry.queries("q242_trained_eval")(s, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val (tp, fp, fn, tn) = (q242.map(_._4).sum, q242.map(_._5).sum,
      q242.map(_._6).sum, q242.map(_._7).sum)
    assert((zero._3, zero._4, zero._5, zero._6) == ((tp, fp, fn, tn)),
      "τ=0 must reproduce q242's confusion totals")
  }

  test("q248: census partitions, τ* is constant, on the ladder, and " +
    "replays the selection rule over q247's curve") {
    val s = spark
    import s.implicits._
    val rel = SparkEntry.queries("q248_calibrated_release")(s, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rel.nonEmpty, "empty release census")
    rel.foreach { case (src, nDocs, nFlag, nRel, relTok, _) =>
      assert(nFlag + nRel == nDocs, s"$src: flagged+released != docs")
      assert(nFlag >= 0 && nRel >= 0 && relTok >= 0, s"$src: negative count")
      assert(relTok >= nRel, s"$src: released docs must carry >= 1 token each " +
        "(whitespace tokenizer yields >= 1 token per non-null text)")
    }
    val taus = rel.map(_._6).distinct
    assert(taus.length == 1, "τ* must be one global operating point")
    val ladder = Seq(-(1L << 20), -(1L << 16), -(1L << 12), -(1L << 8), 0L,
      1L << 8, 1L << 12, 1L << 16, 1L << 20)
    assert(ladder.contains(taus.head), "τ* must be a ladder point")
    // replay the selection rule (precision >= 3/4 via exact integer
    // cross-multiplication; max tp, ties to smallest τ; fallback max τ)
    // over q247's published curve — the two queries must agree
    val curve = SparkEntry.queries("q247_gate_calibration")(s, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val qual = curve.filter { case (_, _, tp2, fp2, _, _) =>
      4 * tp2 >= 3 * (tp2 + fp2) }
    val expect =
      if (qual.isEmpty) ladder.max
      else qual.maxBy { case (t, _, tp2, _, _, _) => (tp2, -t) }._1
    assert(taus.head == expect,
      s"τ* ${taus.head} disagrees with the rule replayed on q247 ($expect)")
  }

  test("q249/q250: every shard row reports ok=1 — the written export " +
    "reproduces its manifest on the fixture") {
    val s = spark
    import s.implicits._
    for (name <- Seq("q249_shard_export", "q250_export_forget")) {
      val rows = SparkEntry.queries(name)(s, sfDir)
        .select($"ok").as[Long].collect()
      assert(rows.nonEmpty, s"$name: empty census")
      assert(rows.forall(_ == 1L), s"$name: a shard failed the round trip")
    }
  }

  test("q255: the materializer delivers q233's allocation — per-lang " +
    "accounting closes and the shortfall is bounded by one document") {
    val s = spark
    import s.implicits._
    // (lang, n_docs, u_tokens, alloc_tokens, full_epochs, extra_docs,
    //  delivered_tokens, shortfall)
    val m = SparkEntry.queries("q255_epoch_materialize")(s, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(m.nonEmpty)
    val alloc233 = SparkEntry.queries("q233_unimax_alloc")(s, sfDir)
      .select($"lang", $"alloc_tokens").as[(String, Long)].collect().toMap
    m.foreach { case (lang, nDocs, u, alloc, full, extra, delivered, short) =>
      assert(alloc == alloc233(lang),
        s"$lang: materializer must serve the SAME allocation q233 planned")
      assert(full == alloc / u, s"$lang: full epochs are the integer floor")
      assert(extra >= 0L && extra <= nDocs, s"$lang: extra docs bounded")
      assert(short >= 0L && delivered + short == alloc,
        s"$lang: delivered + shortfall must partition the budget")
      assert(delivered >= full * u,
        s"$lang: full epochs are always delivered")
      // greedy prefix: what remains undelivered is less than one more
      // document's tokens, i.e. strictly less than the whole remainder
      // unless the remainder can't fit the smallest next document —
      // bounded by the per-lang remainder itself
      assert(short <= alloc % u, s"$lang: shortfall exceeds the remainder")
    }
  }

  test("q256: the packed training stream carries EXACTLY the mass q255 " +
    "delivered, never overfills, and accounts every repeat instance") {
    val s = spark
    import s.implicits._
    // (lang, shard, n_units, n_pieces, n_seqs, sum_tokens, fill_ppm,
    //  n_overfull, n_multi_doc_seqs)
    val stream = SparkEntry.queries("q256_training_stream")(s, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(stream.nonEmpty)
    val mat = SparkEntry.queries("q255_epoch_materialize")(s, sfDir)
      .select($"lang", $"n_docs", $"full_epochs", $"extra_docs",
        $"delivered_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    stream.groupBy(_._1).foreach { case (lang, shards) =>
      val (_, nDocs, full, extra, delivered) = mat(lang)
      assert(shards.map(_._6).sum == delivered,
        s"$lang: packed mass must equal the materialized delivery")
      assert(shards.map(_._3).sum == full * nDocs + extra,
        s"$lang: one pack unit per repeat instance")
      assert(shards.forall(_._8 == 0L), s"$lang: no sequence over capacity")
      assert(shards.forall(r => r._7 > 0L && r._7 <= 1000000L),
        s"$lang: fill ppm in (0, 1e6]")
    }
  }
}
