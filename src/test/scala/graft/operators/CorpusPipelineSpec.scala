package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  test("datacard stage: identical to q180 on raw docs; consistent on a curated corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // the operator IS the q180 implementation — same frame, same card
    val viaStage = CorpusPipeline.datacard(docs).collect().toSeq
    val viaQuery = graft.SparkEntry.queries("q180_datacard")(spark, sfDir)
      .collect().toSeq
    assert(viaStage == viaQuery)
    // on a curated corpus the card must reflect the survivors only
    val staged = CorpusPipeline.build(docs)
    val card = CorpusPipeline.datacard(staged.result)
    val nDocs = card.agg(sum($"n_docs")).as[Long].head()
    assert(nDocs == staged.result.count(),
      "card doc mass must equal the curated corpus size")
    assert(card.where($"n_null_text" =!= 0L).isEmpty,
      "the gate stage dropped null texts, so the curated card has none")
  }

  test("build(cut = localCheckpoint) stages equal the lazy build's (r12)") {
    // the r12 stage-cut hook must be semantics-free: every staged frame
    // and the drop-reason partition are identical with and without it
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val cfg = CorpusPipeline.Config(langs = Seq("de", "en", "es", "fr"),
      evalDocs = Some(docs.where($"doc_id" % 97 === 0)),
      quotaPerLang = Some(40))
    val lazyB = CorpusPipeline.build(docs.where($"doc_id" % 97 =!= 0), cfg)
    val cutB = CorpusPipeline.build(docs.where($"doc_id" % 97 =!= 0), cfg,
      cut = _.localCheckpoint())
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids(cutB.afterExact) == ids(lazyB.afterExact))
    assert(ids(cutB.afterNearDedup) == ids(lazyB.afterNearDedup))
    assert(ids(cutB.afterDecontam) == ids(lazyB.afterDecontam))
    assert(ids(cutB.result) == ids(lazyB.result))
    val dr = (st: CorpusPipeline.Staged) =>
      CorpusPipeline.dropReasons(st, cfg)
        .orderBy("doc_id", "stage").collect().toSeq
    assert(dr(cutB) == dr(lazyB))
  }

  test("redactPii stage rewrites only PII-bearing rows, schema intact, idempotent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src", "reach me at dev@example.com or 415-555-1234"),
      (2L, "src", "plain text with no identifiers"),
      (3L, "src", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    val red = CorpusPipeline.redactPii(docs)
    assert(red.schema == docs.schema, "stage must not change the contract schema")
    val m = red.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    assert(m(1L) == "reach me at <EMAIL> or <PHONE>")
    assert(m(2L) == "plain text with no identifiers")
    assert(m(3L) == null)
    assert(CorpusPipeline.redactPii(red).select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap == m, "idempotent")
  }

  test("stages shrink monotonically and the census adds up") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val eval = docs.filter($"source" === "src19").select($"doc_id", $"text")
    val staged = CorpusPipeline.build(
      docs.filter($"source" =!= "src19"),
      CorpusPipeline.Config(
        langs = Seq("en", "zh", "es"),
        evalDocs = Some(eval),
        quotaPerLang = Some(20)))
    val c = staged.census().toMap
    assert(c("0_input") >= c("1_gate"))
    assert(c("1_gate") >= c("2_lang"))
    assert(c("2_lang") >= c("3_exact"))
    assert(c("3_exact") >= c("4_neardup"))
    assert(c("4_neardup") >= c("5_decontam"))
    assert(c("5_decontam") >= c("6_quota"))
    assert(c("6_quota") > 0)
    // quota respected per language
    val over = staged.result.groupBy($"lang").count().filter($"count" > 20)
    assert(over.count() == 0)
    // only allowed languages survive
    assert(staged.result.filter(!$"lang".isin("en", "zh", "es")).count() == 0)
  }

  test("dropReasons: one reason per dropped doc, stage-ordered, partitions the input exactly") {
    import spark.implicits._
    // one planted doc per drop stage + two clean survivors
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "zz" else s"w$i").mkString(" ")
    val evalText = (1 to 40).map(i => s"e$i").mkString(" ")
    val docs = Seq(
      (1L, "en", "too short"),                    // 1_gate (3 tokens < 10)
      (2L, "zh", long),                           // 2_lang
      (3L, "en", long),                           // survivor (min id of the fp class)
      (4L, "en", long),                           // 3_exact (dup of 3)
      (5L, "en", near),                           // 4_neardup (LSH-near 3)
      (6L, "en", evalText),                       // 5_decontam (shares eval 5-grams)
      (7L, "en", (1 to 40).map(i => s"q$i").mkString(" ")), // 6_quota or kept
      (8L, "en", (1 to 40).map(i => s"r$i").mkString(" ")), // 6_quota or kept
      (9L, "en", null.asInstanceOf[String]))      // 1_gate (null text)
      .toDF("doc_id", "lang", "text")
    val cfg = CorpusPipeline.Config(
      langs = Seq("en"),
      evalDocs = Some(Seq((100L, evalText)).toDF("doc_id", "text")),
      quotaPerLang = Some(2))
    val st = CorpusPipeline.build(docs, cfg)
    val reasons = CorpusPipeline.dropReasons(st, cfg)
      .as[(Long, String, String)].collect().sortBy(_._1)
    val byDoc = reasons.map(r => r._1 -> (r._2, r._3)).toMap
    // one row per dropped doc — no duplicates
    assert(reasons.length == byDoc.size, "exactly one reason per dropped doc")
    assert(byDoc(1L) == ("1_gate", "token_length"))
    assert(byDoc(9L) == ("1_gate", "token_length"))
    assert(byDoc(2L) == ("2_lang", "lang_blocked"))
    assert(byDoc(4L) == ("3_exact", "exact_dup"))
    assert(byDoc(5L) == ("4_neardup", "near_dup"))
    assert(byDoc(6L) == ("5_decontam", "eval_contaminated"))
    // quota 2 keeps two of {3, 7, 8}; the third carries 6_quota
    val kept = st.result.select($"doc_id").as[Long].collect().toSet
    val quotaDropped = Set(3L, 7L, 8L) -- kept
    assert(kept.size == 2 && quotaDropped.size == 1)
    assert(byDoc(quotaDropped.head) == ("6_quota", "quota_sampled"))
    // drops + kept partition the input exactly
    assert(byDoc.keySet ++ kept == (1L to 9L).toSet)
    assert((byDoc.keySet & kept).isEmpty)
  }

  test("spanScrub stage keeps first-occurrence spans, drops empty docs, equals q134's rule") {
    import spark.implicits._
    val boiler = (1 to 16).map(i => s"bp$i").mkString(" ")
    def body(t: String) = (1 to 16).map(i => s"$t$i").mkString(" ")
    val docs = Seq(
      (0L, s"$boiler ${body("a")}", "en"),
      (1L, s"$boiler ${body("b")}", "en"),
      (2L, boiler, "en")) // fully boilerplate → scrubbed empty → dropped
      .toDF("doc_id", "text", "lang")
    val out = CorpusPipeline.spanScrub(docs)
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L))
    assert(out(0)._2 == s"$boiler ${body("a")}") // owner keeps the boilerplate
    assert(out(1)._2 == body("b"))               // later doc loses it
    assert(out.forall(_._3 == "en"))             // other columns carried through
  }

  test("chunk stage emits q105's layout over the pipeline survivors") {
    import spark.implicits._
    val staged = CorpusPipeline.build(Tables.documents(spark, sfDir))
    val chunks = CorpusPipeline.chunk(staged.result)
    val perDoc = chunks.groupBy($"doc_id").count()
    val toks = staged.result
      .select($"doc_id", size(split(trim($"text"), "\\s+")).as("n"))
    val bad = perDoc.join(toks, "doc_id")
      .filter($"count" =!= floor(($"n" - 1) / 24) + 1)
    assert(bad.count() == 0)
    // every chunk holds at most 32 tokens
    val over = chunks
      .filter(size(split($"chunk", " ")) > 32)
    assert(over.count() == 0)
  }

  test("exact stage keeps exactly one doc per fingerprint, the smallest id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      (7L, "one two three four five six seven eight nine ten", "en"))
      .toDF("doc_id", "text", "lang")
    val staged = CorpusPipeline.build(docs, CorpusPipeline.Config())
    assert(staged.afterExact.select($"doc_id").as[Long].collect().toSet == Set(1L, 7L))
  }

  test("decontamination drops docs sharing a 5-gram with the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today friends", "en"),
      (2L, "completely different words with no overlap at all here now", "en"))
      .toDF("doc_id", "text", "lang")
    val eval = Seq(
      (100L, "xx the quick brown fox jumps yy zz aa bb cc", "en"))
      .toDF("doc_id", "text", "lang").select($"doc_id", $"text")
    val staged = CorpusPipeline.build(corpus,
      CorpusPipeline.Config(evalDocs = Some(eval)))
    assert(staged.result.select($"doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("budget stage keeps the greedy salted-hash prefix within the token cap") {
    val s = spark
    import s.implicits._
    val docs = (1L to 50L)
      .map(i => (i, (1 to 10).map(j => s"w${i}_$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val kept = CorpusPipeline
      .budget(docs, CorpusPipeline.Config(), maxTokens = 105L)
      .select($"doc_id").as[Long].collect().toSet
    // 10 tokens per doc, inclusive cum <= 105 => exactly 10 docs survive
    assert(kept.size == 10)
    // and they are THE first 10 in the salted-hash order (local replay)
    def h(i: Long) = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"bud:$i").take(8), 16)
    val expected = (1L to 50L).sortBy(i => (h(i), i)).take(10).toSet
    assert(kept == expected)
    // determinism: a second run selects the identical prefix
    val again = CorpusPipeline
      .budget(docs, CorpusPipeline.Config(), maxTokens = 105L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("qualityFilter keeps exactly the docs whose logit clears the bar") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .where($"text".isNotNull && $"doc_id".isNotNull)
    val kept = CorpusPipeline.qualityFilter(docs, minLogit16 = 0L)
      .select($"doc_id").as[Long].collect().toSet
    // reference: the q203 logit computed independently per doc
    val toks = docs.select($"doc_id", explode(split(trim($"text"), "\\s+")).as("t"))
    val expected = HashedLinearModel.logits(toks, Seq("doc_id"), "t", 1024)
      .where($"logit16" >= 0L).select($"doc_id").as[Long].collect().toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < docs.count(),
      "threshold 0 must actually split the fixture corpus")
    // filtering is a pure subset — no row rewriting
    val cols = CorpusPipeline.qualityFilter(docs).columns.toSeq
    assert(cols == docs.columns.toSeq)
  }
}
