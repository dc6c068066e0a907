package graft

import org.apache.spark.sql.functions._

/** Provable invariants of the round-8 report queries — properties that
  * must hold on ANY corpus, asserted on the sf0.001 fixture:
  *
  *  - q225: per language the three buckets partition the scored docs
  *    and their mbpt ranges are ordered (max(head) ≤ min(middle) ≤
  *    … ≤ max(tail)) — the tercile cut is a real cut.
  *  - q226: flagged ⊆ scored; max_cos is a cosine (|·| ≤ 1 + rounding);
  *    every non-eval document with an embedding is counted exactly once.
  *  - q227: a key's snapshot row exists iff its LATEST op is not a
  *    tombstone — cross-checked against an independent window plan;
  *    deletes never exceed ops.
  *  - q228: borda = r1+r2+r3 with each rank in [1, docs]; the selection
  *    is the 20 smallest borda scores (no larger score may appear).
  *  - q229: fertility ≥ 1e6 ppm (BPE never merges across words, so a
  *    word is ≥ 1 token) and chars-per-token is positive.
  */
class RoundEightInvariantSpec extends SparkSpec {

  test("q225: buckets partition each language and cut in mbpt order") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q225_ppl_buckets")(s, sfDir)
      .localCheckpoint()
    val rows = res
      .select($"lang", $"bucket", $"n_docs", $"min_mbpt", $"max_mbpt")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val by = rs.map(r => r._2 -> r).toMap
      for (Seq(lo, hi) <- Seq("head", "middle", "tail").sliding(2)
           if by.contains(lo) && by.contains(hi))
        assert(by(lo)._5 <= by(hi)._4,
          s"$lang: $lo max_mbpt must not exceed $hi min_mbpt")
      assert(rs.map(_._3).sum > 0, s"$lang: empty census")
    }
  }

  test("q226: every non-eval embedded doc counted once; flags bounded") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q226_semantic_decontam")(s, sfDir)
      .localCheckpoint()
    assert(res.where($"n_flagged" > $"n_docs" || $"n_flagged" < 0).isEmpty)
    assert(res.where(abs($"max_cos") > 1.000001).isEmpty,
      "a rounded cosine cannot exceed 1 by more than the rounding step")
    val counted = res.agg(sum($"n_docs")).as[Long].head()
    val expected = graft.core.Tables.embeddings(s, sfDir)
      .where($"embedding".isNotNull && $"vec_id".isNotNull &&
        $"vec_id" % 97 =!= 0)
      .join(graft.core.Tables.documents(s, sfDir)
        .where($"doc_id".isNotNull), $"vec_id" === $"doc_id")
      .count()
    assert(counted == expected, s"census covers $counted of $expected")
  }

  test("q227: snapshot membership == latest-op-not-delete; counts sane") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q227_cdc_apply")(s, sfDir)
      .localCheckpoint()
    assert(res.where($"n_deletes" > $"n_ops").isEmpty)
    // independent plan: per-user last event via a window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy(unix_micros($"ts").desc, $"event_id".desc)
    val lastOps = graft.core.Tables.events(s, sfDir)
      .where($"user_id".isNotNull && $"ts".isNotNull)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
    val alive = lastOps.where($"event_type" =!= "error")
      .select($"user_id").as[Long].collect().toSet
    val got = res.select($"user_id").as[Long].collect().toSet
    assert(got == alive, "snapshot keys must be exactly the tombstone-free keys")
  }

  test("q228: borda is the rank sum and the 20-smallest selection") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q228_rank_fusion")(s, sfDir)
      .localCheckpoint()
    val nDocs = graft.core.Tables.documents(s, sfDir)
      .where($"text".isNotNull && $"doc_id".isNotNull).count()
    assert(res.where($"borda" =!= $"r1" + $"r2" + $"r3").isEmpty)
    assert(res.where($"r1" < 1 || $"r1" > nDocs ||
      $"r2" < 1 || $"r2" > nDocs || $"r3" < 1 || $"r3" > nDocs).isEmpty)
    assert(res.count() == math.min(20L, nDocs))
    val rows = res.orderBy($"rnk").select($"borda").as[Long].collect()
    assert(rows.sameElements(rows.sorted), "selection ordered by borda")
  }

  test("q230: the base+delta state merge equals an unsplit recompute") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q230_incremental_census")(s, sfDir)
      .localCheckpoint()
    // direct single-pass census, no base/delta split: the merge must be
    // invisible (count/sum/min/max additive; vocab a true set union)
    val docs = graft.core.Tables.documents(s, sfDir)
      .where($"doc_id".isNotNull && $"text".isNotNull)
    val direct = docs.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
    val vocab = docs.select($"lang",
        explode(split(trim($"text"), "\\s+")).as("tok"))
      .groupBy($"lang").agg(countDistinct($"tok").as("n_vocab"))
    val exp = direct.join(vocab, Seq("lang"))
      .select($"lang", $"n_docs", $"sum_chars", $"min_doc", $"max_doc",
        $"n_vocab", expr("sum_chars DIV n_docs").as("chars_per_doc"))
    assert(res.exceptAll(exp).isEmpty && exp.exceptAll(res).isEmpty,
      "merged MV states must reproduce the from-scratch census exactly")
  }

  test("q231: coverage bounded; exposure implies coverage") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q231_memorization")(s, sfDir)
      .localCheckpoint()
    assert(res.count() > 0)
    assert(res.where($"covered_grams" > $"total_grams" ||
      $"n_exposed" > $"n_docs" || $"coverage_ppm" > 1000000L).isEmpty)
    assert(res.where($"n_exposed" === 0 && $"covered_grams" > 0).isEmpty)
  }

  test("q232: exclusive mass bounded by total; one census row per gate") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q232_gate_ablation")(s, sfDir)
      .localCheckpoint()
    assert(res.select($"gate").as[String].collect().sorted.toSeq ==
      Seq("dup", "lang", "len", "rep"))
    assert(res.where($"n_fail_only" > $"n_fail" || $"n_fail" > $"n_docs").isEmpty)
    assert(res.select($"n_docs").distinct().count() == 1,
      "every gate is evaluated on the same raw input")
  }

  test("q233: caps respected and the budget partitions exactly") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q233_unimax_alloc")(s, sfDir)
      .localCheckpoint()
    assert(res.where($"epochs_milli" > 2000L).isEmpty,
      "no language may exceed the 2-epoch cap")
    assert(res.where($"capped" === "true" &&
      $"alloc_tokens" =!= $"u_tokens" * 2L).isEmpty,
      "a capped language gets exactly C epochs")
    val Seq((alloc, leftover)) = res
      .agg(sum($"alloc_tokens"), max($"leftover"))
      .as[(Long, Long)].collect().toSeq
    val total = graft.core.Tables.documents(s, sfDir)
      .where($"text".isNotNull && $"lang".isNotNull)
      .select(size(split(trim($"text"), "\\s+")).cast("long").as("t"))
      .agg(sum($"t")).as[Long].head()
    assert(alloc + leftover == total * 3L / 2L,
      "allocations + leftover must partition the budget exactly")
  }

  test("q234: each merge tranche can only shrink the corpus; baseline is chars") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q234_merge_curve")(s, sfDir)
      .orderBy($"n_merges").localCheckpoint()
    val ts = res.select($"total_tokens").as[Long].collect()
    assert(ts.zip(ts.tail).forall { case (a, b) => b <= a },
      "a merge can never increase the token count")
    assert(res.where($"saved_tokens" < 0).isEmpty)
    val charBase = graft.core.Tables.documents(s, sfDir)
      .where($"doc_id".isNotNull && $"text".isNotNull &&
        length(trim($"text")) > 0)
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .where(length($"w") > 0)
      .agg(sum(length($"w"))).as[Long].head()
    assert(ts.head == charBase,
      "0 merges must tokenize to exactly the non-space character count")
  }

  test("q235: stage attribution partitions input; allocation respects caps") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q235_release_manifest")(s, sfDir)
      .localCheckpoint()
    assert(res.where($"n_drop_ppl" + $"n_drop_contam" + $"n_kept"
      =!= $"n_input").isEmpty,
      "every input doc gets exactly one verdict")
    assert(res.where($"epochs_milli" > 2000L).isEmpty,
      "no language may exceed the 2-epoch cap")
    val expectedInput = graft.core.Tables.documents(s, sfDir)
      .where($"text".isNotNull && $"doc_id".isNotNull &&
        $"doc_id" % 97 =!= 0).count()
    assert(res.agg(sum($"n_input")).as[Long].head() == expectedInput,
      "the manifest covers the whole candidate slice")
  }

  test("q237: entropy bounded by log2(doc length); bands ordered") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q237_token_entropy")(s, sfDir)
      .localCheckpoint()
    assert(res.count() > 0)
    assert(res.where($"min_h" < 0L).isEmpty, "entropy is non-negative")
    // H <= log2(n) for any distribution over at most n outcomes; the
    // census keeps per-band token masses, so bound with the global max
    val maxN = res.agg(max($"n_tokens")).as[Long].head()
    val bound = (math.log(maxN.toDouble) / math.log(2.0) + 1e-3) * 1e6
    assert(res.where($"max_h" > bound).isEmpty,
      s"entropy must stay under log2(total tokens) = $bound")
    val byBand = res.groupBy($"band")
      .agg(min($"min_h").as("lo"), max($"max_h").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (b <- byBand.get("low")) assert(b._2 < 4200000L)
    for (b <- byBand.get("mid"))
      assert(b._1 >= 4200000L && b._2 < 4600000L)
    for (b <- byBand.get("high")) assert(b._1 >= 4600000L)
  }

  test("q239: doc slots cover every doc span; language counts bounded") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q239_pack_purity")(s, sfDir)
      .localCheckpoint()
    assert(res.where($"n_langs" < 1L || $"n_langs" > 5L).isEmpty)
    assert(res.where($"n_doc_slots" < $"n_seqs").isEmpty,
      "every sequence holds at least one doc slot")
    val shares = res.agg(sum($"share_ppm")).as[Long].head()
    assert(shares <= 1000000L && shares > 1000000L - res.count() * 2,
      "shares must partition ppm up to DIV truncation")
  }

  test("q229: fertility at least one token per word, compression positive") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q229_tokenizer_fertility")(s, sfDir)
      .localCheckpoint()
    assert(res.count() > 0)
    assert(res.where($"fertility_ppm" < 1000000L).isEmpty,
      "a word can never encode to less than one BPE token")
    assert(res.where($"chars_per_tok_milli" <= 0L).isEmpty)
  }
}
