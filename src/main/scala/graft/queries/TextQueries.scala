package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline (SURVEY H-8):
  * token counting, quality scoring, language-ID, fingerprinting — each a
  * codegen'd single-pass scan+agg over `documents`, no UDFs, so the same
  * plan streams over 100 TB of text at parquet-scan speed.
  */
object TextQueries extends QueryPack {

  /** Token counting (whitespace + BPE-ish estimate) per language.
    * Explode + two grouped aggs — whole-stage codegen end to end; the
    * previous aggregate(transform(...)) form was interpreted
    * (CodegenFallback) and 40-80× slower per CLAUDE.md.
    *
    * NULL-text docs are excluded EXPLICITLY here and in every oracle of
    * this pack (`WHERE text IS NOT NULL`): explode of a null array emits
    * no rows, so without the shared filter the two sides would count such
    * docs differently. A null-text row is not a document for text stats. */
  private val q42: Q = (s, d) => {
    import s.implicits._
    val perDoc = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", $"doc_id",
        length(trim($"text")).cast("long").as("chars"),
        explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"doc_id")
      .agg(
        count(lit(1)).as("toks"),
        sum(bpeExtraTokens($"tok")).as("bpe_extra"),
        // chars is constant within the doc group
        max($"chars").as("chars"))
    perDoc
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"toks").as("total_tokens"),
        sum($"toks" + $"bpe_extra").as("total_bpe_tokens"),
        sum($"chars").as("total_chars"),
        round(avg($"toks"), 4).as("avg_tokens"))
      .orderBy($"lang")
  }

  /** Quality scoring: C4/Gopher-style lexical filters (length band,
    * stopword ratio, mean word length) → score histogram per language.
    * Per-doc token stats come from one explode + grouped agg (codegen'd);
    * sum(length(tok)) equals the old non-whitespace character count since
    * tokens are the \s+ split of the trimmed text. */
  private val q43: Q = (s, d) => {
    import s.implicits._
    val perDoc = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", $"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(isStopword($"tok").cast("long")).as("n_stop"),
        sum(length($"tok").cast("long")).as("sum_len"))
    perDoc
      .select($"lang", $"doc_id",
        stopwordRatioOf($"n_stop", $"n_tok").as("stop_ratio"),
        qualityScoreOf($"n_tok",
          stopwordRatioOf($"n_stop", $"n_tok"),
          round($"sum_len".cast("double") / $"n_tok", 4)).as("score"))
      .groupBy($"lang", $"score")
      .agg(
        count(lit(1)).as("n_docs"),
        // stop_ratio is 4-decimal by construction: sum exact basis points,
        // divide once (1-ulp-proof cross-engine; the q19 lesson)
        round(sum(round($"stop_ratio" * 10000).cast("long")) /
          (count(lit(1)) * 10000.0), 4).as("avg_stop_ratio"),
        min($"doc_id").as("min_doc"))
      .orderBy($"lang", $"score")
  }

  /** Language-ID by marker voting vs the labeled lang column — emits the
    * (labeled, guessed) confusion matrix. Deterministic tie-break: highest
    * vote wins, ties broken by language code order via greatest-struct. */
  private val q44: Q = (s, d) => {
    import s.implicits._
    val langs = Seq("de", "en", "es", "fr", "zh")
    // explode + conditional sums stay in whole-stage codegen; the
    // size(filter(tokens)) array-lambda form is interpreted ×5 langs
    val votes = langs.map(l =>
      sum(when($"tok".isin(langMarkers(l): _*), 1L).otherwise(0L)).as(s"v_$l"))
    val voted = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", $"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"doc_id")
      .agg(votes.head, votes.tail: _*)
    // argmax via greatest over (vote, -lang-index) structs: equal votes
    // resolve to the alphabetically-first language in both engines.
    val best = greatest(langs.map(l =>
      struct(col(s"v_$l").cast("long").as("v"),
        lit(-langs.indexOf(l).toLong).as("ord"),
        lit(l).as("lang"))): _*)
    voted
      .select($"lang", best.getField("lang").as("guess"))
      .groupBy($"lang", $"guess")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"guess")
  }

  /** Fingerprinting: md5 content address; bucket by first hex nibble —
    * verifies engine-portable hashing (the prerequisite for cross-system
    * exact dedup) and gives a uniformity histogram. */
  private val q45: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(substring(fingerprint($"text"), 1, 1).as("bucket"),
        $"n_chars")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"bucket")
  }

  /** Repetition ratios (Gopher/Dolma-style quality signal): fraction of
    * duplicate tokens and duplicate 3-shingles per document — high values
    * mark boilerplate/spam. Both ratios on integer counts, round(4) for
    * display only; the filter census buckets at 0.5 (integer-safe:
    * 2·dups >= total). */
  private val q76: Q = (s, d) => {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", $"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"doc_id")
      .agg(count(lit(1)).as("n_tok"), countDistinct($"tok").as("n_uniq"))
    toks
      .select($"lang", $"doc_id", $"n_tok", $"n_uniq",
        (($"n_tok" - $"n_uniq") * 2 >= $"n_tok").as("repetitive"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"repetitive".cast("long")).as("n_repetitive"),
        // per-row ratio rounded to 6 first (identical doubles on both
        // engines), then exact micro-unit sum + one closing division
        round(sum(round((($"n_tok" - $"n_uniq").cast("double") / $"n_tok") * 1000000)
          .cast("long")) / (count(lit(1)) * 1000000.0), 4)
          .as("avg_dup_ratio"))
      .orderBy($"lang")
  }

  /** Benchmark decontamination (the train/eval n-gram overlap check every
    * LLM data pipeline runs before training): the eval split is the docs
    * with `doc_id % 97 == 0`; a training doc is contaminated when it
    * shares any 5-token shingle with any eval doc. Candidates come from
    * an equi join on the shingle — a uniform shuffle key, never an
    * all-pairs compare; at 100 TB the (tiny) eval shingle set broadcasts. */
  private val q89: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).where($"text".isNotNull)
    val sh = graft.functions.DedupFunctions
      .shingleRows(docs.select($"doc_id", $"text"), "doc_id", "text", 5)
    val ev = sh.where($"doc_id" % 97 === 0).select($"s").distinct()
    val tr = sh.where($"doc_id" % 97 =!= 0).distinct()
    // ev is distinct on the join key, so inner join == semi join + count
    val ov = tr.join(ev, "s").groupBy($"doc_id").agg(count(lit(1)).as("n_ov"))
    docs.where($"doc_id" % 97 =!= 0)
      .join(ov, Seq("doc_id"), "left")
      .select($"lang", coalesce($"n_ov", lit(0L)).as("n_ov"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"n_ov" > 0, 1L).otherwise(0L)).as("n_contaminated"),
        sum($"n_ov").as("total_overlap"))
      .orderBy($"lang")
  }

  /** Memorization-exposure audit — q89's screen run in the OPPOSITE
    * direction (the Lee et al. 2022 / Carlini et al. 2021 framing):
    * q89 flags TRAINING docs that leak eval content; this measures, per
    * EVAL document, how much of it the training corpus already contains
    * — the fraction of its distinct 8-gram windows (Lee et al.'s
    * dedup/memorization unit) present anywhere in the train split. An
    * eval item with high coverage cannot distinguish memorization from
    * generalization and gets down-weighted or dropped from the harness.
    * Census per language: eval docs, exposed docs (any overlap), total
    * and covered distinct grams, coverage in exact ppm.
    *
    * Scale shape: grams come from the codegen'd split→posexplode→lead
    * shingle builder; the train gram table is DISTINCT on the join key
    * (one uniform-key exchange, never all-pairs); the eval side is the
    * tiny relation — the semi join is the q89 plan transposed. At
    * 100 TB the train gram set persists as the dedup index already
    * built for q106/StreamingDedup (hashed grams, same key). */
  private val q231: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).where($"text".isNotNull)
    val sh = graft.functions.DedupFunctions
      .shingleRows(docs.select($"doc_id", $"text"), "doc_id", "text", 8)
    val evg = sh.where($"doc_id" % 97 === 0)
      .select($"doc_id", $"s").distinct()
    val trs = sh.where($"doc_id" % 97 =!= 0).select($"s").distinct()
    val cov = evg.join(trs, Seq("s"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_seen"))
    val perDoc = evg.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
      .join(cov, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams", coalesce($"n_seen", lit(0L)).as("n_seen"))
    docs.where($"doc_id" % 97 === 0)
      .select($"doc_id", $"lang")
      .join(perDoc, Seq("doc_id"), "left")
      .select($"lang", coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_seen", lit(0L)).as("n_seen"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_seen" > 0, 1L).otherwise(0L)).as("n_exposed"),
        sum($"n_grams").as("total_grams"),
        sum($"n_seen").as("covered_grams"))
      .select($"lang", $"n_docs", $"n_exposed", $"total_grams",
        $"covered_grams",
        when($"total_grams" > 0,
          expr("covered_grams * 1000000 DIV total_grams"))
          .otherwise(lit(0L)).as("coverage_ppm"))
      .orderBy($"lang")
  }

  /** Per-document token-ENTROPY quality gate (the Gopher/RefinedWeb
    * rule family's information-theoretic member: repetitive junk has
    * low entropy, random noise maxes it; q76's repetition ratio and
    * q142's distinct-token score are its cheaper cousins — entropy
    * also separates "few types, balanced" from "few types, one
    * dominating"): H(doc) = Σ (c/n)·log2(n/c) over the doc's token
    * histogram, banded at literal cuts and censused per (lang, band).
    *
    * Cross-engine closure: each histogram term closes as
    * c · micro(log2 n − log2 c) — two exact-integer-argument log2
    * calls (the q136/q150 class) rounded to micro-bits BEFORE the
    * cross-row sum (the q218 rule); the per-doc mean is an integer
    * DIV, the band a literal integer compare.
    *
    * Scale shape: one tokenizing scan → per-(doc, tok) counts → two
    * doc-keyed hash aggs; the band census is O(langs·bands). Nothing
    * leaves the doc key until the census. */
  private val q237: Q = (s, d) => {
    import s.implicits._
    val cnt = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"lang", $"tok").agg(count(lit(1)).as("c"))
    val n = cnt.groupBy($"doc_id").agg(sum($"c").as("n"))
    val h = cnt.join(n, Seq("doc_id"))
      .select($"doc_id", $"lang", $"n",
        ($"c" * round(round(log2($"n") - log2($"c"), 6) * 1000000)
          .cast("long")).as("term"))
      .groupBy($"doc_id", $"lang")
      .agg(max($"n").as("n"), sum($"term").as("hn"))
      .select($"doc_id", $"lang", $"n", expr("hn DIV n").as("h_micro"))
    h.select($"lang", $"n", $"h_micro",
        when($"h_micro" < 4200000L, "low")
          .when($"h_micro" < 4600000L, "mid")
          .otherwise("high").as("band"))
      .groupBy($"lang", $"band")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"),
        min($"h_micro").as("min_h"), max($"h_micro").as("max_h"))
      .orderBy($"lang", $"band")
  }

  /** Most-exposed eval ITEMS — q231's census made actionable: the
    * specific benchmark documents whose 8-gram content the training
    * corpus already carries, ranked by coverage (the list an eval-harness
    * owner actually consumes: drop or down-weight these items, q231's
    * per-language rates justify the policy). Same gram machinery, one
    * TakeOrdered on the O(eval docs) frame — no new operator math.
    * Audited at the 4-gram SCREEN grain (stricter than q231's 8-gram
    * dedup grain — shorter windows flag more; harness owners sweep the
    * grain downward until the list is non-empty, exactly this corpus'
    * situation: zero 8-gram coverage, a handful of 4-gram echoes).
    *
    * Scale shape: identical to q231 until the per-doc frame (train gram
    * table distinct on the join key, eval the small semi-join side);
    * the ranking is a global top-20 TakeOrdered, never a window over
    * data. */
  private val q238: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).where($"text".isNotNull)
    val sh = graft.functions.DedupFunctions
      .shingleRows(docs.select($"doc_id", $"text"), "doc_id", "text", 4)
    val evg = sh.where($"doc_id" % 97 === 0)
      .select($"doc_id", $"s").distinct()
    val trs = sh.where($"doc_id" % 97 =!= 0).select($"s").distinct()
    val cov = evg.join(trs, Seq("s"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_seen"))
    val perDoc = evg.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
      .join(cov, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams",
        coalesce($"n_seen", lit(0L)).as("n_seen"))
      .where($"n_seen" > 0)
      .select($"doc_id", $"n_grams", $"n_seen",
        expr("n_seen * 1000000 DIV n_grams").as("coverage_ppm"))
    docs.where($"doc_id" % 97 === 0).select($"doc_id", $"lang")
      .join(perDoc, Seq("doc_id"))
      .orderBy($"coverage_ppm".desc, $"doc_id")
      .limit(20)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"coverage_ppm".desc, $"doc_id")))
      .select($"rnk".cast("long").as("rnk"), $"doc_id", $"lang",
        $"n_grams", $"n_seen", $"coverage_ppm")
      .orderBy($"rnk")
  }

  /** TF-IDF keyword extraction, integer-exact: per language, term
    * frequency tf and document frequency df from one explode + grouped
    * agg; the idf weight is the reciprocal-df proxy
    * `(tf * 1e6) div (df + 1)` — monotone in 1/df like log-idf but exact
    * integer arithmetic on both engines (ln() is libm-dependent and
    * unsafe to hash-compare). Top-3 terms per language, ties broken by
    * term; the ranking window partitions by lang over the already
    * vocabulary-sized agg output, not the corpus. */
  private val q90: Q = (s, d) => {
    import s.implicits._
    val tf = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", $"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"tok")
      .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"score".desc, $"tok")
    tf.withColumn("score", expr("(tf * 1000000) DIV (df + 1)"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"lang", $"rank".cast("long").as("rank"), $"tok".as("term"),
        $"tf", $"df", $"score")
      .orderBy($"lang", $"rank")
  }

  /** Dataset mixing / stratified downsampling (the "data recipe" step:
    * rebalance language shares before training): keep a doc iff the
    * portable 32-bit hash of "mix:"+doc_id lands under the language's
    * quota (en downsampled to 40%, the rest kept whole). Hash-based
    * sampling is deterministic, re-runnable, and needs no coordination —
    * every executor decides keep/drop from the row alone, so the op is a
    * narrow filter at any scale. */
  private val q93: Q = (s, d) => {
    import s.implicits._
    val quota = when($"lang" === "en", 40L).otherwise(100L)
    val kept = graft.functions.DedupFunctions
      .hash32(concat(lit("mix:"), $"doc_id".cast("string"))) % 100 < quota
    Tables.documents(s, d)
      .select($"lang", $"n_chars", kept.as("kept"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"kept".cast("long")).as("n_kept"),
        sum(when($"kept", $"n_chars").otherwise(0L)).as("kept_chars"))
      .orderBy($"lang")
  }

  /** Sequence packing (the pre-training batch-prep step: concatenate the
    * corpus in a canonical order and chunk it into fixed-token training
    * sequences): each doc's bin is its STARTING token offset div 4096.
    * The offset is a global running total of per-doc token counts — via
    * [[graft.functions.DistributedRank.withRunningTotal]], so no row-data
    * window ever runs unpartitioned (the q73 lesson, applied to prefix
    * sums); token counts come from size(split(...)), codegen'd without an
    * explode. Census per bin, exact integers. */
  private val q94: Q = (s, d) => {
    import s.implicits._
    val perDoc = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"doc_id", size(split(trim($"text"), "\\s+")).cast("long").as("toks"))
    graft.functions.DistributedRank
      .withRunningTotal(perDoc, "rt", $"toks", $"doc_id")
      .select($"doc_id", $"toks", expr("(rt - toks) DIV 4096").as("bin"))
      .groupBy($"bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"toks").as("bin_tokens"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .orderBy($"bin")
  }

  /** Corpus n-gram hotspots (the memorization / boilerplate audit run
    * before training): top repeated 8-grams appearing in 2+ documents,
    * with occurrence and document counts. One shingle explode + hash agg
    * on the gram (uniform key), then global top-10 via orderBy+limit —
    * which plans as per-partition top-k + single-reducer merge
    * (TakeOrderedAndProject), never a full sort. */
  private val q96: Q = (s, d) => {
    import s.implicits._
    graft.functions.DedupFunctions
      .shingleRows(Tables.documents(s, d).where($"text".isNotNull),
        "doc_id", "text", 8)
      .groupBy($"s")
      .agg(count(lit(1)).as("n_occurrences"), countDistinct($"doc_id").as("n_docs"))
      .where($"n_docs" >= 2)
      .select($"s".as("gram"), $"n_occurrences", $"n_docs")
      .orderBy($"n_occurrences".desc, $"gram")
      .limit(10)
  }

  /** Token-blocklist scrub — the token-granularity form of the reference's
    * substring blacklist filter (P5, `etl/RunLogParser.scala:548-560`) and
    * the shape of a profanity/boilerplate scrub in a training-data
    * pipeline: drop blocked tokens, keep order, re-join, fingerprint the
    * cleaned text. Counting runs on exploded rows (codegen'd); the ordered
    * rebuild uses the q33 pattern (transform over a per-doc bounded
    * collect_list — interpreted, but on ≤100-element arrays after the
    * aggregate, not on the scan path). */
  private val q100: Q = (s, d) => {
    import s.implicits._
    val block = Seq("the", "a", "value")
    Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("blocked", $"w".isin(block: _*))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum($"blocked".cast("long")).as("n_removed"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(when(!$"blocked", struct($"pos", $"w")))),
            x => x.getField("w")))).as("scrub_md5"))
      .orderBy($"doc_id")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * per language, draw 2 docs with probability ∝ weight (n_chars/100)
    * by ranking on key = u^(1/w), u a deterministic md5-derived uniform
    * — the quality-weighted corpus subsampling step, reproducible
    * run-to-run because the "randomness" is a salted content hash, not
    * an RNG. One narrow projection + one per-stratum top-k window
    * (strata are bounded); the key is rounded to 9 digits BEFORE
    * ranking so the 1-ulp cross-engine pow() difference can't flip an
    * order, with doc_id as the tie-break. */
  private val q133: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables.documents(s, d)
      .select($"doc_id", $"lang", ($"n_chars" / 100.0).as("wt"),
        (conv(substring(md5(concat($"doc_id".cast("string"), lit("ws")).cast("binary")), 1, 8),
          16, 10).cast("double") / lit(4294967296.0)).as("u"))
      .withColumn("samp_key", round(pow($"u", lit(1.0) / $"wt"), 9))
    val w = Window.partitionBy($"lang").orderBy($"samp_key".desc, $"doc_id")
    keyed.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 2)
      .select($"lang", $"rnk".cast("long").as("rnk"), $"doc_id",
        round($"samp_key", 6).as("samp_key"))
      .orderBy($"lang", $"rnk")
  }

  /** Unigram cross-entropy quality score — the LM-perplexity proxy of
    * CCNet-style filtering, self-trained: build the corpus token
    * histogram, then score each document by its mean
    * −log2 p(token) (bits/token). Low bits = templated/common text,
    * high bits = rare-token soup; both tails are what quality filters
    * cut. Real pipelines swap the histogram for a KenLM scored the same
    * shape.
    *
    * Scale shape: one token-histogram shuffle (output O(vocab) — Zipf
    * guarantees it's small), histogram joined back onto the token
    * stream WITHOUT a forced broadcast hint: the vocab frame grows
    * ~n^0.5 with the corpus (Heaps), so the broadcast-audit rule
    * applies (a frame tracking corpus growth never carries a forced
    * hint — the q171/q137 precedent) and AQE broadcasts at runtime
    * while the frame fits; only the 1-row totals frame keeps its
    * hint. One hash agg per doc closes it. */
  private val q136: Q = (s, d) => {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("tok"))
    val hist = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val total = hist.agg(sum($"cnt").as("n"))
    toks.join(hist, Seq("tok"))
      .crossJoin(broadcast(total))
      .select($"doc_id", (-log2($"cnt" / $"n")).as("bits"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round(avg($"bits"), 4).as("bits_per_token"))
      .orderBy($"doc_id")
  }

  /** Bigram PMI collocations — phrase mining for vocabulary/tokenizer
    * work: score adjacent pairs by pointwise mutual information
    * log2(p(ab) / (p(a)·p(b))), floor cnt_ab ≥ 5, top-20. The PMI is
    * ONE log2 over a ratio of exact integer products (all < 2^53), so
    * both engines see identical doubles; ordering is on the ROUNDED
    * score with the pair as tie-break.
    *
    * Scale shape: bigrams from a per-doc window lead (partitioned by
    * doc — never global), two histogram aggs (O(vocab), O(bigram
    * vocab)), unigram histogram joined onto the bigram counts WITHOUT a
    * forced broadcast hint (the vocab frame grows ~n^0.5 with the
    * corpus — Heaps — so AQE decides at runtime, the q171 rule; only
    * the 1-row totals frame keeps its hint), final TakeOrdered top-20
    * (no global sort). */
  private val q137: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select($"doc_id", posexplode(split(trim($"text"), "\\s+")))
      .toDF("doc_id", "pos", "tok")
    val uni = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val bi = toks.withColumn("nxt", lead($"tok", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"tok".as("tok_a"), $"nxt".as("tok_b"))
      .agg(count(lit(1)).as("cnt_ab"))
    val totals = toks.agg(count(lit(1)).as("n_tok")).crossJoin(
      bi.agg(sum($"cnt_ab").as("n_bi")))
    bi.filter($"cnt_ab" >= 5)
      .join(uni.select($"tok".as("tok_a"), $"cnt".as("cnt_a")), Seq("tok_a"))
      .join(uni.select($"tok".as("tok_b"), $"cnt".as("cnt_b")), Seq("tok_b"))
      .crossJoin(broadcast(totals))
      .select($"tok_a", $"tok_b", $"cnt_ab",
        round(log2(($"cnt_ab" * $"n_tok" * $"n_tok").cast("double") /
          ($"n_bi" * $"cnt_a" * $"cnt_b").cast("double")), 4).as("pmi"))
      .orderBy($"pmi".desc, $"tok_a", $"tok_b")
      .limit(20)
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023): score every document by how much more likely its
    * hashed-unigram features are under a TARGET distribution than under
    * the RAW corpus distribution — the published recipe for steering a
    * 100 TB crawl toward a high-quality target domain. Target here is
    * the English slice; features are tokens hashed into 1024 buckets
    * (md5-derived so both engines agree); add-one smoothing on both
    * histograms. Per-doc log-weight = Σ_b c_db · llr_b.
    *
    * Determinism: each bucket's llr is ONE log2 over a ratio of exact
    * integer products (all < 2^53 at any plausible SF), so both engines
    * see identical doubles; the per-doc sum runs over ≤1024 bucket
    * terms (rounded to 4 — ulp noise is ~1e-12).
    *
    * Scale shape: ONE pass builds BOTH histograms (conditional sum vs
    * count in the same grouped agg — no second token scan); the
    * O(1024)-row llr table is BROADCAST back onto the per-(doc,bucket)
    * counts, so the only data-sized shuffles are the two map-side-
    * combinable hash aggs keyed by bucket and by (doc,bucket). */
  private val q140: Q = (s, d) => {
    import s.implicits._
    val nB = 1024
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .select($"doc_id", $"lang",
        (conv(substring(md5($"tok".cast("binary")), 1, 8), 16, 10)
          .cast("long") % nB).as("b"))
    val hist = toks.groupBy($"b").agg(
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val tot = hist.agg(sum($"ct").as("nt"), sum($"cr").as("nr"))
    val llr = hist.crossJoin(broadcast(tot))
      .select($"b", log2((($"ct" + 1) * ($"nr" + nB)).cast("double") /
        (($"cr" + 1) * ($"nt" + nB)).cast("double")).as("llr"))
    toks.groupBy($"doc_id", $"b").agg(count(lit(1)).as("c"))
      .join(broadcast(llr), Seq("b"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tok"),
        round(sum($"c" * $"llr"), 4).as("dsir_logw"))
      .orderBy($"doc_id")
  }

  /** Zipf rank-frequency slope per language — the corpus-health
    * diagnostic curation teams run after filtering: natural text obeys
    * freq ∝ rank^s with s ≈ −1, and a filtered/deduplicated slice whose
    * slope drifts far from −1 signals boilerplate domination (too
    * shallow) or over-aggressive dedup (too steep). Slope/intercept are
    * the closed-form OLS of ln(freq) on ln(rank) over each language's
    * top-100 tokens.
    *
    * Determinism: ranks and frequencies are exact integers under the
    * total (freq DESC, tok) order; the OLS sums run over ≤100 doubles
    * (magnitudes ≲40, no cancellation in the denominator — n·Σx² ≈
    * 1.2·(Σx)² at n=100), rounded to 4 — far above ulp noise.
    *
    * Scale shape: token census = one map-side-combinable hash agg; the
    * top-100 window partitions by lang (parallel across languages — and
    * at web scale the census first prunes with a per-partition top-k,
    * the q132 TopKAggregator shape); OLS is one tiny hash agg. */
  private val q146: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val freq = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("f"))
    val top = freq
      .withColumn("r", row_number()
        .over(Window.partitionBy($"lang").orderBy($"f".desc, $"tok")))
      .where($"r" <= 100)
      .select($"lang",
        log($"r".cast("double")).as("x"), log($"f".cast("double")).as("y"))
    top.groupBy($"lang")
      .agg(count(lit(1)).as("n_terms"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .where($"n_terms" >= 2)
      .withColumn("slope_raw",
        ($"n_terms" * $"sxy" - $"sx" * $"sy") /
          ($"n_terms" * $"sxx" - $"sx" * $"sx"))
      .select($"lang", $"n_terms",
        round($"slope_raw", 4).as("zipf_slope"),
        round(($"sy" - $"slope_raw" * $"sx") / $"n_terms", 4)
          .as("zipf_intercept"))
      .orderBy($"lang")
  }

  /** Heaps' law vocabulary-growth curve per source — the dual of q146's
    * Zipf slope: natural text grows vocabulary V(n) ≈ K·nᵝ with β ≈
    * 0.4–0.6 in cumulative token count n; a source whose β collapses is
    * template/boilerplate-dominated (vocabulary saturates), one whose β
    * nears 1 is id-noise (every token fresh). Curve sampled at 10
    * doc_id-decile checkpoints per source, then closed-form OLS of
    * ln(cum vocab) on ln(cum tokens) — output (source, n_pts,
    * heaps_beta, heaps_intercept).
    *
    * Determinism (round-7 hardening — the r6 red row): checkpoint
    * boundaries are VALUE-based integer cuts `bmin + (bmax-bmin)·c DIV
    * 10` — pure integer arithmetic, no quantile convention of either
    * engine involved (the r6 spelling hung on `approx_percentile ==
    * quantile_disc` index conventions, which proved driver-DuckDB
    * version-sensitive exactly at dense-integer decile boundaries);
    * cumulative masses are exact integer conditional sums; each ln of
    * an exact integer is identical cross-engine (q136/q150 precedent)
    * and is immediately quantized to integer milli-ln units, so the
    * OLS sums, the closing beta (integer ppm via DIV — truncation
    * toward zero in BOTH engines, verified incl. negatives) and the
    * intercept (integer micro-ln) never sum a float across rows.
    *
    * Scale shape: one tokenizing scan feeds both the per-doc token
    * census and the (source, token)-keyed first-occurrence min — both
    * map-side-combinable hash aggs; the O(sources) boundary frame
    * broadcasts back, cumulative masses are 10 conditional sums inside
    * ONE agg (no fan-out), and everything after is O(sources·10) rows.
    * At 100 TB the only caveat is the quantile sketch leaving its exact
    * regime — boundary drift only moves checkpoint positions, and the
    * diagnostic reads the slope, not the cuts. */
  private val q189: Q = (s, d) => {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"source".isNotNull && $"doc_id".isNotNull)
      .select($"source", $"doc_id", explode(tokens($"text")).as("tok"))
    val perDoc = toks.groupBy($"source", $"doc_id")
      .agg(count(lit(1)).as("ntok"))
    val bounds = perDoc.groupBy($"source")
      .agg(min($"doc_id").as("bmin"), max($"doc_id").as("bmax"))
      .select($"source" +: (1 to 10).map(c =>
        expr(s"bmin + (bmax - bmin) * $c DIV 10").as(s"b$c")): _*)
    val ftok = toks.groupBy($"source", $"tok").agg(min($"doc_id").as("fdoc"))
    val ct = perDoc.join(broadcast(bounds), Seq("source"))
      .groupBy($"source")
      .agg((1 to 10).map(c =>
        sum(when($"doc_id" <= col(s"b$c"), $"ntok").otherwise(0L))
          .as(s"ct$c")).head,
        (1 to 10).map(c =>
          sum(when($"doc_id" <= col(s"b$c"), $"ntok").otherwise(0L))
            .as(s"ct$c")).tail: _*)
    val cv = ftok.join(broadcast(bounds), Seq("source"))
      .groupBy($"source")
      .agg((1 to 10).map(c =>
        sum(when($"fdoc" <= col(s"b$c"), 1L).otherwise(0L)).as(s"cv$c")).head,
        (1 to 10).map(c =>
          sum(when($"fdoc" <= col(s"b$c"), 1L).otherwise(0L)).as(s"cv$c"))
          .tail: _*)
    val pts = ct.join(cv, Seq("source"))
      .select($"source", explode(array((1 to 10).map(c =>
        struct(col(s"ct$c").as("ctok"), col(s"cv$c").as("cvoc"))): _*)).as("p"))
      .where($"p.ctok" > 0 && $"p.cvoc" > 0)
      .select($"source",
        round(log($"p.ctok".cast("double")) * 1000).cast("long").as("x"),
        round(log($"p.cvoc".cast("double")) * 1000).cast("long").as("y"))
    pts.groupBy($"source")
      .agg(count(lit(1)).as("n_pts"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .where($"n_pts" >= 2 &&
        ($"n_pts" * $"sxx" - $"sx" * $"sx") =!= 0L)
      .withColumn("beta_ppm",
        expr("(n_pts * sxy - sx * sy) * 1000000 DIV (n_pts * sxx - sx * sx)"))
      .select($"source", $"n_pts", $"beta_ppm",
        expr("(sy * 1000000 - beta_ppm * sx) DIV (n_pts * 1000)")
          .as("intercept_u"))
      .orderBy($"source")
  }

  /** Count–Min frequency-sketch serving (q202 —
    * [[graft.operators.CountMin]]): build the per-source d×w token
    * counter table ONCE, then answer point-frequency probes from the
    * O(sources·d·w) state — the frequency complement of the HLL (q08),
    * GK (q182) and Misra–Gries (q164) sketch families. Probes here are
    * the 8 leading stopwords; the report shows est vs exact vs the
    * overcount (CMS error is one-sided — collisions only ADD), and the
    * oracle replicates the ENTIRE counter matrix via the shared md5
    * bucket idiom, so the row hash-matches in the collision regime —
    * stronger than q182's exact-regime trick. d=4, w=256 keeps the
    * fixture visibly in the collision regime; the ε-bound claim at
    * production widths is CountMinSpec's.
    *
    * Scale shape: one tokenizing scan → d narrow bucket rows per token
    * → a map-side-combinable count (the exchange carries sparse
    * counters, never tokens); probing is O(probes·d) against the
    * counter table. At 100 TB the counter table is KBs per source and
    * merges across ingest batches by integer addition. */
  private val q202: Q = (s, d) => {
    import s.implicits._
    val D = 4; val W = 256
    val probeToks = graft.functions.TextFunctions.stopwords.take(8)
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"source".isNotNull)
      .select($"source", explode(tokens($"text")).as("tok"))
    val sketch = graft.operators.CountMin
      .sketchTable(toks, Seq("source"), "tok", D, W)
    val probes = toks.select($"source").distinct()
      .crossJoin(probeToks.toDF("tok"))
    val est = graft.operators.CountMin
      .estimate(sketch, probes, Seq("source"), "tok", D, W)
    val exact = toks.where($"tok".isin(probeToks: _*))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("source", "tok"), "left")
      .select($"source", $"tok", $"est",
        coalesce($"n_exact", lit(0L)).as("n_exact"),
        ($"est" - coalesce($"n_exact", lit(0L))).as("overcount"))
      .orderBy($"source", $"tok")
  }

  /** Model-based quality-filter inference census (q203 —
    * [[graft.operators.HashedLinearModel]]): run a hashed linear text
    * classifier over every document (the FineWeb-Edu / DCLM filtering
    * stage) and report the per-source pass census. The logit is an
    * EXACT integer in sixteenths (md5-derived dyadic weights — the
    * stand-in for learned weights; production broadcasts a real weight
    * table, same plan), keep/drop thresholds the logit directly
    * (sigmoid is monotone — never evaluated, so no cross-engine `exp`),
    * and every reported number is an integer sum or DIV.
    *
    * Scale shape: one tokenizing scan → two md5s + an integer add per
    * token → doc-keyed hash agg → O(sources) census. The cheapest
    * possible shape for model-scoring 100 TB of text. */
  private val q203: Q = (s, d) => {
    import s.implicits._
    val DIMS = 1024
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"source".isNotNull && $"doc_id".isNotNull)
      .select($"source", $"doc_id", explode(tokens($"text")).as("tok"))
    graft.operators.HashedLinearModel
      .logits(toks, Seq("source", "doc_id"), "tok", DIMS)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"logit16" >= 0L).cast("long")).as("n_pass"),
        sum($"logit16").as("sum_logit16"))
      .withColumn("pass_ppm", expr("n_pass * 1000000 DIV n_docs"))
      .select($"source", $"n_docs", $"n_pass", $"pass_ppm", $"sum_logit16")
      .orderBy($"source")
  }

  /** Weak-supervision LABEL-MODEL census (programmatic labeling,
    * Snorkel — Ratner et al. VLDB'18: many cheap labeling functions
    * vote; the label model reads their agreement structure before
    * anyone trains on the votes): K = 3 independent labeling functions
    * (three [[graft.operators.HashedLinearModel]] scorers under
    * disjoint salts — production swaps in real heuristics/models, same
    * plan) vote per document, and the census reports per source the
    * majority-positive count, unanimity vs split, and the pairwise
    * agreement mass — the inputs a label model (or a simple
    * disagreement-based acquisition rule) consumes. Every vote is a
    * threshold on an exact integer logit, so the whole report is
    * integer arithmetic.
    *
    * Scale shape: ALL THREE models' per-token weights ride ONE
    * tokenizing scan (the q207 pattern — three md5 pairs per token),
    * one doc-keyed hash agg, O(sources) census. No join, no broadcast,
    * no window. */
  private val q219: Q = (s, d) => {
    import s.implicits._
    import graft.operators.HashedLinearModel.{bucket, weight16}
    val DIMS = 1024
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"source".isNotNull && $"doc_id".isNotNull)
      .select($"source", $"doc_id", explode(tokens($"text")).as("tok"))
    val per = toks.select($"source" +: $"doc_id" +:
      (1 to 3).map(k =>
        weight16(bucket($"tok", DIMS, s"lf$k"), s"lf${k}w").as(s"w$k")): _*)
    val lg = per.groupBy($"source", $"doc_id")
      .agg(sum($"w1").as("l1"), sum($"w2").as("l2"), sum($"w3").as("l3"))
    val v = lg.select($"source",
      (($"l1" >= 0L).cast("long") + ($"l2" >= 0L).cast("long")
        + ($"l3" >= 0L).cast("long")).as("n_yes"),
      ((($"l1" >= 0L) === ($"l2" >= 0L)).cast("long")
        + (($"l1" >= 0L) === ($"l3" >= 0L)).cast("long")
        + (($"l2" >= 0L) === ($"l3" >= 0L)).cast("long")).as("pair_agree"))
    v.groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum(($"n_yes" >= 2L).cast("long")).as("n_maj_pos"),
        sum(($"n_yes" === 0L || $"n_yes" === 3L).cast("long"))
          .as("n_unanimous"),
        sum(($"n_yes" === 1L || $"n_yes" === 2L).cast("long")).as("n_split"),
        sum($"pair_agree").as("sum_pair_agree"))
      .orderBy($"source")
  }

  /** Preference-PAIR construction (the DPO/RLHF reward-data prep shape —
    * Rafailov et al. 2023: each training example is a (chosen, rejected)
    * response pair under a reward score, kept only when the margin is
    * decisive): within each (source, lang) candidate group, chosen =
    * the reward-argmax document, rejected = the argmin (ties break on
    * doc_id — deterministic), pair emitted when margin > 0. The reward
    * model is the q203 hashed linear scorer, so the margin is an EXACT
    * integer in sixteenths; production swaps in a learned reward model,
    * identical plan.
    *
    * Scale shape: ONE tokenizing scan → doc-keyed logit agg; both
    * extremes come from a single (source, lang)-partitioned exchange
    * (two row_numbers over one window partition — one sort); output is
    * O(groups). No window is ever unpartitioned, nothing broadcasts. */
  private val q211: Q = (s, d) => {
    import s.implicits._
    val DIMS = 1024
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"source".isNotNull &&
        $"lang".isNotNull && $"doc_id".isNotNull)
      .select($"source", $"lang", $"doc_id", explode(tokens($"text")).as("tok"))
    val scored = graft.operators.HashedLinearModel
      .logits(toks, Seq("source", "lang", "doc_id"), "tok", DIMS)
    val wUp = Window.partitionBy($"source", $"lang")
      .orderBy($"logit16".desc, $"doc_id")
    val wDn = Window.partitionBy($"source", $"lang")
      .orderBy($"logit16".asc, $"doc_id")
    val pairs = scored
      .withColumn("r_hi", row_number().over(wUp))
      .withColumn("r_lo", row_number().over(wDn))
    val hi = pairs.where($"r_hi" === 1)
      .select($"source", $"lang", $"doc_id".as("chosen_id"),
        $"logit16".as("chosen16"))
    val lo = pairs.where($"r_lo" === 1)
      .select($"source", $"lang", $"doc_id".as("rejected_id"),
        $"logit16".as("rejected16"))
    hi.join(lo, Seq("source", "lang"))
      .where($"chosen16" - $"rejected16" > 0)
      .select($"source", $"lang", $"chosen_id", $"rejected_id",
        ($"chosen16" - $"rejected16").as("margin16"))
      .orderBy($"source", $"lang")
  }

  /** DoReMi-style domain REWEIGHTING census (Xie et al. 2023 "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * domain weights follow the CLIPPED EXCESS of a proxy model over a
    * reference model, normalized across domains and smoothed 7/8 toward
    * the data, 1/8 toward uniform — the loss-DRIVEN member of the
    * mixture-planning family (q130 sets count-based temperature
    * weights, q216 budget-constrained epochs; this one listens to the
    * models). Excess here is max(0, learner16 − reference16) per doc
    * under the q207 salt pairs — production swaps in real per-domain
    * excess losses, identical plan — so every reported number is exact
    * integer arithmetic (ppm via DIV on nonnegative integers, where
    * Spark DIV and DuckDB // agree).
    *
    * Scale shape: both models ride ONE tokenizing scan (q207), one
    * doc-keyed agg, O(sources) census joined to a 1-row total. */
  private val q220: Q = (s, d) => {
    import s.implicits._
    import graft.operators.HashedLinearModel.{bucket, weight16}
    val DIMS = 1024
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"source".isNotNull && $"doc_id".isNotNull)
      .select($"source", $"doc_id", explode(tokens($"text")).as("tok"))
    val docs = toks
      .select($"source", $"doc_id",
        weight16(bucket($"tok", DIMS), "hlmw").as("w_p"),
        weight16(bucket($"tok", DIMS, "hlmr"), "hlmwr").as("w_r"))
      .groupBy($"source", $"doc_id")
      .agg(greatest(sum($"w_p") - sum($"w_r"), lit(0L)).as("excess16"))
    val dom = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"excess16").as("excess16"))
    val tot = dom.agg(sum($"excess16").as("tot16"), count(lit(1)).as("k"))
    // tot16 = 0 (every excess clipped) would divide by zero — an empty
    // report is the honest "no signal" answer, identical in both engines
    dom.crossJoin(broadcast(tot)).where($"tot16" > 0)
      .select($"source", $"n_docs", $"excess16",
        expr("excess16 * 1000000 DIV tot16").as("weight_ppm"),
        expr("(excess16 * 1000000 DIV tot16) * 7 DIV 8 + 1000000 DIV (8 * k)")
          .as("smoothed_ppm"))
      .orderBy($"source")
  }

  /** Learnability-ranked selection (q207 — the two-model data-selection
    * shape: RHO-loss "reducible holdout loss", Mindermann et al.
    * ICML'22; JEST's learnability = learner score − reference score,
    * Evans et al. 2024): a document is worth training on when the
    * LEARNER model scores it low but the REFERENCE model scores it high
    * — here the difference of two [[graft.operators.HashedLinearModel]]
    * scorers over the same hashed feature space with disjoint salts
    * (production: the actual learner checkpoint vs a held-out-trained
    * reference; identical plan — two weight lookups in one scan).
    * Output: the global top-10 most-learnable docs, integer sixteenths.
    *
    * Scale shape: ONE tokenizing scan carries BOTH models' per-token
    * weights (two md5 pairs per token); one doc-keyed agg; the top-10
    * is a TakeOrdered — no window, no join beyond the census. */
  private val q207: Q = (s, d) => {
    import s.implicits._
    val DIMS = 1024
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"source".isNotNull && $"doc_id".isNotNull)
      .select($"source", $"doc_id", explode(tokens($"text")).as("tok"))
    import graft.operators.HashedLinearModel.{bucket, weight16}
    val scored = toks
      .select($"source", $"doc_id",
        weight16(bucket($"tok", DIMS, "hlmr"), "hlmwr").as("w_ref"),
        weight16(bucket($"tok", DIMS), "hlmw").as("w_lrn"))
      .groupBy($"source", $"doc_id")
      .agg((sum($"w_ref") - sum($"w_lrn")).as("learn16"))
    scored
      .orderBy($"learn16".desc, $"doc_id")
      .limit(10)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"learn16".desc, $"doc_id")))
      .select($"rnk".cast("long").as("rnk"), $"doc_id", $"source", $"learn16")
      .orderBy($"rnk")
  }

  /** HELD-OUT perplexity under a train-split bigram LM — the real CCNet
    * scoring shape (Wenzek et al. 2020: a KenLM trained on a clean
    * reference corpus scores the crawl; documents the LM finds probable
    * are kept). q171/q179 self-score on a full-corpus LM, which can
    * never see an unseen token; this query completes the stage with the
    * two production ingredients those skip: a TRAIN/HELD-OUT split
    * (doc_id%10 — the q117 leakage-split convention) and OOV mass. The
    * model is Jelinek-Mercer with a dyadic 3/4 weight and an add-one
    * unigram floor:
    *   p(nxt|tok) = 3/4 · c12/ctx + 1/4 · (c2+1)/(T+V)
    * so unseen bigrams back off to the unigram, unseen tokens to the
    * uniform floor 1/(4(T+V)) — every held-out token scores finite.
    *
    * Cross-engine closure (stronger than q171's rounded avg): over the
    * common denominator the per-token bits are
    *   log2(4·ctx·(T+V)) − log2(3·c12·(T+V) + ctx·(c2+1))
    * — two log2 calls on EXACT-integer arguments (the q136/q150 class;
    * integral up to 2⁵³, ~petatoken corpora), rounded to micro-bits and
    * summed as integers; the census mean is an integer DIV.
    *
    * Scale shape: one tokenizing scan feeds train and test splits; the
    * LM tables (bi/ctx/uni) are vocab-sized — shuffle-joined, never
    * broadcast (the q171 audit rule); only the 1-row (T,V) stats frame
    * carries a hint. At 100 TB the trained tables persist once and
    * daily scoring is three hash joins against them (or a per-executor
    * LM binary via mapPartitions — same math, no joins). */
  private val q210: Q = (s, d) => {
    import s.implicits._
    val wd = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull)
      .select($"doc_id", $"lang", posexplode(split(trim($"text"), "\\s+")))
      .toDF("doc_id", "lang", "pos", "tok")
    val bigrams = toks
      .withColumn("nxt", lead($"tok", 1).over(wd))
      .where($"nxt".isNotNull)
    val train = bigrams.where($"doc_id" % 10 =!= 0)
    val bi  = train.groupBy($"tok", $"nxt").agg(count(lit(1)).as("c12"))
    val ctx = train.groupBy($"tok").agg(count(lit(1)).as("ctx"))
    val uni = train.groupBy($"nxt").agg(count(lit(1)).as("c2"))
    val stats = train.agg(count(lit(1)).as("t"),
      countDistinct($"nxt").as("v"))
    val scored = bigrams.where($"doc_id" % 10 === 0)
      .join(bi, Seq("tok", "nxt"), "left")
      .join(ctx, Seq("tok"), "left")
      .join(uni, Seq("nxt"), "left")
      .crossJoin(broadcast(stats))
      .select($"doc_id", $"lang",
        round(round(
          log2(lit(4L) * coalesce($"ctx", lit(1L)) * ($"t" + $"v")) -
          log2(lit(3L) * coalesce($"c12", lit(0L)) * ($"t" + $"v")
            + coalesce($"ctx", lit(1L)) * (coalesce($"c2", lit(0L)) + lit(1L))),
          6) * 1000000).cast("long").as("mb"))
    scored.groupBy($"lang")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_bigrams"),
        sum($"mb").as("nll_mb"))
      .select($"lang", $"n_docs", $"n_bigrams", $"nll_mb",
        expr("nll_mb DIV n_bigrams").as("mb_per_bigram"))
      .orderBy($"lang")
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020 —
    * the published pipeline's actual routing decision: after the KenLM
    * scores every crawl document, CCNet splits each language at the
    * per-language perplexity TERCILES and keeps head+middle for
    * training). q210 builds the score; this query completes the stage
    * with the decision: per-document mean bits-per-bigram under the
    * SAME train-split Jelinek-Mercer LM (identical textual expression —
    * the q183 row-level-parity rule), integer micro-bit mbpt per doc,
    * per-language tercile cuts, and the (lang, bucket) census a mixture
    * planner consumes.
    *
    * Cross-engine closure: per-token bits are q210's exact-integer-log2
    * form; the per-doc mean is an integer DIV; the cuts come from
    * `approx_percentile` at accuracy=10⁶ — the q182 trick: in the exact
    * regime (<10⁶ docs per language) its ceil(q·n) convention IS
    * DuckDB's `quantile_disc`, with epsilon-shifted fractions
    * (0.3333334/0.6666668) so q·n never lands on an integer where the
    * two index conventions could split. Bucket labels and the census
    * are then pure integer comparisons.
    *
    * Scale shape: one tokenizing scan feeds LM training and scoring
    * (q210's shuffle-joined LM tables — never broadcast, the corpus-
    * growth audit rule); the per-doc agg is one hash agg; the cuts
    * frame is O(languages) rows (a census — broadcast back is safe and
    * hinted); at 100 TB the cuts switch to the sketch regime where
    * SketchAccuracySpec pins the rank-error bound and the bucket edges
    * are approximate by design (CCNet's own terciles are). */
  private val q225: Q = (s, d) => {
    import s.implicits._
    val wd = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull)
      .select($"doc_id", $"lang", posexplode(split(trim($"text"), "\\s+")))
      .toDF("doc_id", "lang", "pos", "tok")
    val bigrams = toks
      .withColumn("nxt", lead($"tok", 1).over(wd))
      .where($"nxt".isNotNull)
    val train = bigrams.where($"doc_id" % 10 =!= 0)
    val bi  = train.groupBy($"tok", $"nxt").agg(count(lit(1)).as("c12"))
    val ctx = train.groupBy($"tok").agg(count(lit(1)).as("ctx"))
    val uni = train.groupBy($"nxt").agg(count(lit(1)).as("c2"))
    val stats = train.agg(count(lit(1)).as("t"),
      countDistinct($"nxt").as("v"))
    val scored = bigrams
      .join(bi, Seq("tok", "nxt"), "left")
      .join(ctx, Seq("tok"), "left")
      .join(uni, Seq("nxt"), "left")
      .crossJoin(broadcast(stats))
      .select($"doc_id", $"lang",
        round(round(
          log2(lit(4L) * coalesce($"ctx", lit(1L)) * ($"t" + $"v")) -
          log2(lit(3L) * coalesce($"c12", lit(0L)) * ($"t" + $"v")
            + coalesce($"ctx", lit(1L)) * (coalesce($"c2", lit(0L)) + lit(1L))),
          6) * 1000000).cast("long").as("mb"))
    // two consumers (the tercile cuts and the bucket join) would
    // recompute the whole LM stack twice — the O(docs) per-doc frame
    // checkpoints once instead. Measured crossover: 24% faster at the
    // graded sf0.1 (recompute > serialization) but NEUTRAL at the 100×
    // probe, where the RDD round-trip's row serialization costs what
    // the warm-cache recompute does — at real scale persist the frame
    // columnar (or recompute) instead of an RDD checkpoint
    val perDoc = scored.groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_bg"), sum($"mb").as("nll"))
      .select($"doc_id", $"lang", $"n_bg", expr("nll DIV n_bg").as("mbpt"))
      .localCheckpoint()
    val cuts = perDoc.groupBy($"lang")
      .agg(expr("approx_percentile(mbpt, array(0.3333334, 0.6666668), 1000000)")
        .as("cs"))
      .select($"lang", $"cs".getItem(0).as("c1"), $"cs".getItem(1).as("c2"))
    perDoc.join(broadcast(cuts), Seq("lang"))
      .select($"lang",
        when($"mbpt" <= $"c1", "head")
          .when($"mbpt" <= $"c2", "middle")
          .otherwise("tail").as("bucket"),
        $"n_bg", $"mbpt")
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bg").as("n_bigrams"),
        min($"mbpt").as("min_mbpt"), max($"mbpt").as("max_mbpt"))
      .orderBy($"lang", $"bucket")
  }

  /** Keyword weak-supervision domain tagger + mixture census — the
    * labeling-function shape (Ratner et al., Snorkel VLDB'18) pipelines
    * use to report corpus composition before training (The Pile-style
    * domain shares): each topic owns a keyword list, a document's topic
    * is the argmax keyword-hit count (ties break on topic name, no hits
    * → 'none'), and the census reports per-(lang, topic) doc counts and
    * integer-ppm shares.
    *
    * Scale shape: ONE tokenizing scan; the keyword→topic map is a
    * literal CASE chain (codegen'd — no join against a keyword table
    * needed below thousands of keywords); per-doc argmax is a window
    * bounded by |topics| rows per doc; the census is a hash agg with the
    * O(langs) totals frame broadcast back. Shares are exact integer ppm
    * (DIV), the q169 rule — no float crosses the hash. */
  private val q190: Q = (s, d) => {
    import s.implicits._
    val topics: Seq[(String, Seq[String])] = Seq(
      "compute" -> Seq("join", "merge", "hash", "agg"),
      "ordering" -> Seq("sort", "order", "group"),
      "storage" -> Seq("scan", "filter", "table", "row"),
      "streaming" -> Seq("stream", "batch", "window"))
    val docs = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull)
      .select($"doc_id", $"lang")
    val topicOf = topics.tail.foldLeft(
      when($"tok".isin(topics.head._2: _*), topics.head._1)) {
      case (acc, (t, kws)) => acc.when($"tok".isin(kws: _*), t)
    }
    val hits = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .select($"doc_id", topicOf.as("topic"))
      .where($"topic".isNotNull)
      .groupBy($"doc_id", $"topic").agg(count(lit(1)).as("cnt"))
    val wArg = Window.partitionBy($"doc_id").orderBy($"cnt".desc, $"topic")
    val assigned = hits.withColumn("rn", row_number().over(wArg))
      .where($"rn" === 1).select($"doc_id", $"topic")
    val census = docs.join(assigned, Seq("doc_id"), "left")
      .select($"lang", coalesce($"topic", lit("none")).as("topic"))
      .groupBy($"lang", $"topic").agg(count(lit(1)).as("n_docs"))
    val tot = census.groupBy($"lang").agg(sum($"n_docs").as("tot"))
    census.join(broadcast(tot), Seq("lang"))
      .select($"lang", $"topic", $"n_docs",
        expr("(n_docs * 1000000) DIV tot").as("share_ppm"))
      .orderBy($"lang", $"topic")
  }

  /** Exact per-language heavy-hitter tokens (count > N_lang/30) via the
    * two-pass Misra–Gries prune — [[graft.operators.HeavyHitters]] holds
    * the scale story (O(groups·k) exchange instead of a full-vocabulary
    * shuffle; candidates are a guaranteed superset, the recount and the
    * integer threshold are exact, so the output is deterministic and
    * oracle-able even though MG weights are not). The oracle computes the
    * same set the naive way: GROUP BY token HAVING cnt·(k+1) > N. The
    * fixture's 31-token vocabulary makes the prune nominal here; the
    * operator spec (MisraGriesSpec) exercises the summary on adversarial
    * streams where it actually discards. */
  private val q164: Q = (s, d) => {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", explode(split(trim($"text"), "\\s+")).as("tok"))
    graft.operators.HeavyHitters.exact(toks, "lang", "tok", k = 29)
      .orderBy($"lang", $"tok")
  }

  /** Exact ranking-eval AUC (Mann–Whitney U with tie-corrected average
    * ranks): does the q43 lexical quality score separate REPETITIVE
    * documents (q76's 2·dup-tokens ≥ total flag)? The classifier-health
    * check run before trusting any score-based gate (q142/q156's
    * calibration complement). AUC here reads as "probability a random
    * repetitive doc scores below a random clean one" — positives are the
    * BAD docs a gate would drop.
    *
    * Exactness: scores quantize to integer decis, ranks live as DOUBLED
    * integers (average rank of a tie bucket = (2·below + n + 1)/2, so
    * 2·rank is always integral), and AUC ships as integer ppm via
    * BIGINT floor division — no float ever crosses the hash (the q149
    * rule). Scale shape: one grouped agg to per-doc rows, one to
    * (lang, deci-score) buckets; the rank window runs over BUCKETS
    * (O(distinct scores) rows per language, not O(docs)) — the same
    * aggregate-first trick as q158's boundary gate. */
  private val q169: Q = (s, d) => {
    import s.implicits._
    val perDoc = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", $"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        countDistinct($"tok").as("n_uniq"),
        sum(isStopword($"tok").cast("long")).as("n_stop"),
        sum(length($"tok").cast("long")).as("sum_len"))
      .select($"lang",
        round(qualityScoreOf($"n_tok",
          stopwordRatioOf($"n_stop", $"n_tok"),
          round($"sum_len".cast("double") / $"n_tok", 4)) * 10)
          .cast("long").as("s10"),
        ((($"n_tok" - $"n_uniq") * 2) >= $"n_tok").cast("long").as("pos"))
    val wr = Window.partitionBy($"lang").orderBy($"s10")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .groupBy($"lang", $"s10")
      .agg(count(lit(1)).as("n"), sum($"pos").as("n1"))
      .withColumn("cum_less", coalesce(sum($"n").over(wr), lit(0L)))
      .groupBy($"lang")
      .agg(
        sum($"n1" * (lit(2L) * $"cum_less" + $"n" + 1L)).as("r1_2"),
        sum($"n1").as("n_pos"),
        (sum($"n") - sum($"n1")).as("n_neg"))
      .where($"n_pos" > 0 && $"n_neg" > 0)
      .select($"lang", $"n_pos", $"n_neg",
        expr("CAST((r1_2 - n_pos * (n_pos + 1)) * 1000000 DIV (2 * n_pos * n_neg) AS BIGINT)")
          .as("auc_ppm"))
      .orderBy($"lang")
  }

  /** Bigram-interpolated cross-entropy (the stronger CCNet-style LM
    * proxy over q136's unigram): per-doc mean bits under
    * p(w₂|w₁) = ¾·c(w₁w₂)/c(w₁) + ¼·c(w₂)/N — Jelinek-Mercer with a
    * DYADIC λ=0.75, so the interpolated probability is the exact
    * rational (3·c₁₂·N + c₁·c₂) / (4·c₁·N) and each token costs ONE
    * log2 over integer products — identical doubles on both engines
    * (the q137 discipline). Integer products stay < 2⁵³ while corpus
    * tokens N < ~5·10⁷; past that (any real corpus) shift the counts
    * to log-space doubles — the plan shape is unchanged.
    *
    * Scale shape: bigrams from a per-doc lead window (partitioned by
    * doc, never global). Bigram vocabulary grows near-LINEARLY with
    * corpus size, so the histogram is NEVER broadcast (at 100 TB it is
    * billions of rows): instead the per-bigram bits value is computed
    * once on the O(bigram vocab) histogram — unigram counts attach to
    * the histogram, not the token stream, so the two `tok`/`nxt` joins
    * touch vocab-sized frames (AQE may still elect to broadcast `uni`,
    * which is sub-linear by Heaps' law; that choice is size-based, not
    * forced) — and the enriched histogram shuffle-equi-joins back onto
    * the bigram stream on (tok, nxt), the same key the histogram agg
    * already hashed on. One exchange of the stream, one hash agg per
    * doc, no unbounded broadcast anywhere. Only the 1-row corpus total
    * is broadcast. log2 now runs once per DISTINCT bigram rather than
    * per occurrence. */
  /** q171's per-doc frame (doc_id, n_bigrams, bits_per_bigram rounded 4)
    * without the final ORDER BY — shared by q171 and q179's bucketing. */
  private def bigramBitsPerDoc(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val wd = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"doc_id", posexplode(split(trim($"text"), "\\s+")))
      .toDF("doc_id", "pos", "tok")
    val uni = toks.groupBy($"tok").agg(count(lit(1)).as("c1"))
    val total = toks.agg(count(lit(1)).as("n"))
    val bigrams = toks
      .withColumn("nxt", lead($"tok", 1).over(wd))
      .where($"nxt".isNotNull)
    val bi = bigrams.groupBy($"tok", $"nxt").agg(count(lit(1)).as("c12"))
    val biBits = bi
      .join(uni, Seq("tok"))
      .join(uni.select($"tok".as("nxt"), $"c1".as("c2")), Seq("nxt"))
      .crossJoin(broadcast(total))
      .select($"tok", $"nxt",
        (log2(lit(4L) * $"c1" * $"n") -
          log2(lit(3L) * $"c12" * $"n" + $"c1" * $"c2")).as("bits"))
    bigrams
      .join(biBits, Seq("tok", "nxt"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg($"bits"), 4).as("bits_per_bigram"))
  }

  private val q171: Q = (s, d) => {
    import s.implicits._
    bigramBitsPerDoc(s, d).orderBy($"doc_id")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    * language, split documents into head/middle/tail TERCILES of the
    * q171 LM score (lowest bits = head = cleanest), the split CCNet
    * uses to keep head+middle and drop (or down-weight) the tail. The
    * census reports each bucket's size and rounded bits range — the
    * boundaries a sampling stage would apply.
    *
    * Determinism: the ntile orders by the ROUNDED per-doc bits (the
    * value the q171 oracle already hash-matches) with a doc_id
    * tie-break, so bucket assignment is identical in both engines; the
    * census emits only count/min/max of those rounded values — no
    * further float arithmetic crosses the hash.
    *
    * Scale shape: everything of q171's, plus one window over O(docs)
    * per-doc rows partitioned by lang. At 100 TB replace the exact
    * ntile with q158's broadcast percentile-boundary gate — same
    * output contract, no per-lang sort (measured head-to-head there). */
  private val q179: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"bits_per_bigram", $"doc_id")
    bigramBitsPerDoc(s, d)
      .join(Tables.documents(s, d).select($"doc_id", $"lang"), Seq("doc_id"))
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"bits_per_bigram").as("min_bits"),
        max($"bits_per_bigram").as("max_bits"))
      .orderBy($"lang", $"bucket")
  }

  /** Heavy-hitter PHRASES per source — the boilerplate-detection
    * production shape ("which exact n-grams dominate each site":
    * templates, footers, nav chrome): [[graft.operators.HeavyHitters]]'
    * two-pass Misra–Gries prune composed with the dedup family's gram
    * generator ([[graft.functions.DedupFunctions.shingleRows]], the q89
    * decontamination generator). This is where the O(groups·k) exchange
    * guarantee MATTERS: unlike q164's unigram vocabulary (Heaps-law
    * sub-linear), n-gram vocabulary grows ~linearly with the corpus —
    * the naive groupBy(source, gram) shuffles every distinct n-gram,
    * billions of rows at 100 TB, where the MG summary exchange stays at
    * O(sources · k) forever. Gram size is a generator parameter;
    * production boilerplate hunts run 5-grams — this fixture's
    * random-31-token text has no repeated 5-gram (max share 0.0014, a
    * measured property of the synthetic corpus), so the oracle-gated
    * form runs 2-gram phrases at k=199 (count > N_src/200), where the
    * fixture has real hitters. The gram stream joins its (doc_id,
    * source) dimension on the window's own doc_id partitioning —
    * co-partitioned, no extra gram-stream exchange. */
  private val q174: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).where($"text".isNotNull)
    val grams = graft.functions.DedupFunctions
      .shingleRows(docs.select($"doc_id", $"text"), "doc_id", "text", 2)
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      .select($"source", $"s".as("gram"))
    graft.operators.HeavyHitters.exact(grams, "source", "gram", k = 199)
      .orderBy($"source", $"gram")
  }

  /** Per-source corpus datacard — the datasheet report (Gebru et al.,
    * "Datasheets for Datasets") a 100 TB ingest publishes per source:
    * doc/char/token mass, language spread, null-text count, Gopher-style
    * repetition census, stopword ratio, and mean word length — ALL from
    * ONE tokenizing scan of `documents`. Fusion is the point: at 100 TB
    * the wall-clock cost of corpus statistics is reading the text, so K
    * separate signal jobs cost K scans while this plan feeds every
    * signal from the same explode + two-level agg (plan-asserted single
    * parquet scan, PlanAssertSpec). Implementation lives in
    * [[graft.operators.Datacard]]; [[graft.operators.CorpusPipeline
    * .datacard]] publishes the same card over a curated corpus. Ratio
    * determinism follows the q43/q76 contract: per-doc ratios rounded
    * to fixed decimals, summed as exact integers, one closing
    * division. */
  private val q180: Q = (s, d) =>
    graft.operators.Datacard.of(Tables.documents(s, d))

  /** The fixed retrieval query for the BM25 family: one rare term
    * ("dup", df≈5% — the discriminative signal) and two common ones.
    * Inlined identically into the DuckDB mirror. */
  private[queries] val Bm25Terms = Seq("dup", "spark", "window")

  /** Per-doc Okapi BM25 scores (k1=1.2, b=0.75) for [[Bm25Terms]], in
    * exact integer micro-units: (lang, doc_id, bm25_u).
    *
    * Scale shape: ONE tokenizing scan computes doc length and each
    * term's tf as conditional sums of the same explode (no per-term
    * scan); the corpus stats (N, avgdl, per-term df) are a 1-ROW frame
    * cross-joined broadcast back, so scoring is a narrow codegen'd
    * projection — at 100 TB, ad-hoc query scoring costs one scan plus
    * O(1) stats, the inverted-index-free shape that works when queries
    * are rare and the corpus is the product.
    *
    * Determinism: idf uses log2 (the engine-portable log of this repo —
    * q136/q137/q171 precedent; BM25 rank order is log-base invariant),
    * every term score is the same left-to-right double expression both
    * engines parse, and the 3-term sum is written out in fixed order
    * before the single micro-unit rounding — an integer crosses the
    * hash. */
  private[queries] def bm25PerDoc(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    import s.implicits._
    val aggs = count(lit(1)).as("n_tok") +:
      Bm25Terms.zipWithIndex.map { case (t, i) =>
        sum(when($"tok" === t, 1L).otherwise(0L)).as(s"tf$i")
      }
    val per = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", $"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"doc_id")
      .agg(aggs.head, aggs.tail: _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tok")) ++
      Bm25Terms.indices.map(i =>
        sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val stats = per.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = $"sum_tok".cast("double") / $"n_docs"
    def termScore(i: Int) =
      log2(($"n_docs" - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0) *
        (col(s"tf$i") * 2.2) /
        (col(s"tf$i") + lit(1.2) *
          (lit(0.25) + lit(0.75) * ($"n_tok".cast("double") / avgdl)))
    per.crossJoin(broadcast(stats))
      .select($"lang", $"doc_id",
        round(Bm25Terms.indices.map(termScore).reduce(_ + _) * 1000000)
          .cast("long").as("bm25_u"))
  }

  /** DuckDB mirror of [[bm25PerDoc]] as a WITH-clause body; `sc` is the
    * (lang, doc_id, bm25_u) relation. */
  private[queries] val bm25Cte: String = {
    val toks = "regexp_split_to_array(trim(text), '\\s+')"
    val tfs = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter($toks, x -> x = '$t')) AS tf$i"
    }.mkString(",\n    ")
    val dfs = Bm25Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n    ")
    val terms = Bm25Terms.indices.map(i =>
      s"""log2((n_docs - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * 2.2)
         |      / (tf$i + 1.2 * (0.25 + 0.75 * (CAST(n_tok AS DOUBLE)
         |          / (CAST(sum_tok AS DOUBLE) / n_docs))))""".stripMargin)
      .mkString("\n    + ")
    s"""p AS (
       |  SELECT lang, doc_id, len($toks) AS n_tok,
       |    $tfs
       |  FROM documents WHERE text IS NOT NULL),
       |g AS (
       |  SELECT count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       |    $dfs
       |  FROM p),
       |sc AS (
       |  SELECT lang, doc_id,
       |    CAST(round(($terms) * 1000000) AS BIGINT) AS bm25_u
       |  FROM p, g)""".stripMargin
  }

  /** Okapi BM25 ranking (Robertson/Spärck Jones) — the lexical ranker
    * every retrieval/RAG stack starts from: top-10 docs per language for
    * the fixed [[Bm25Terms]] query. See [[bm25PerDoc]] for the one-scan
    * + 1-row-stats-broadcast scale shape and the determinism contract. */
  private val q183: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"bm25_u".desc, $"doc_id")
    bm25PerDoc(s, d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where($"rnk" <= 10)
      .select($"lang", $"rnk", $"doc_id", $"bm25_u")
      .orderBy($"lang", $"rnk")
  }

  /** TRAINED quality-classifier census — closes the loop every
    * model-based query in this suite documents ("production swaps in
    * learned weights"): [[graft.operators.LogReg]] trains the hashed
    * linear classifier IN-ENGINE (full-batch gradient descent, hard-
    * sigmoid link — see the operator scaladoc for why that closes
    * training over exact integers), scores the corpus with the LEARNED
    * weights, and reports the per-source keep census with teacher
    * confusion counts plus the nonzero-weight census. Teacher labels
    * here are a rare-positive keyword gate (y = doc contains 'dup' —
    * ~5% of the fixture, the FineWeb-Edu regime of few good docs), so
    * the fixture is genuinely linearly separable and the learned
    * accuracy is visible: n_correct = n_docs per source at sf ≥ 0.01.
    * FineWeb-Edu swaps LLM-graded labels onto the identical plan.
    * Training config measured on the fixtures (see LogRegSpec):
    * PRESENCE features (fastText's default — count features put the
    * corpus's shared-vocabulary length direction in front of the
    * signal), class-BALANCED integer doc weights (without them the
    * 95%-negative teacher trains to the majority class), and a halving
    * dyadic rate from η = 4 (constant rates ring between the two
    * class-majority predictions).
    *
    * Cross-engine closure: every trained weight is an exact lattice
    * integer, so the oracle replays all ITERS rounds as unrolled CTEs
    * (the q139 fixed-unroll precedent) and hash-matches — no float
    * ever crosses engines.
    *
    * Scale shape: ONE tokenizing scan into the checkpointed
    * (doc, bucket, presence) frame; per round one broadcast join
    * against the O(dims)-bounded model frame, one doc agg, one
    * residual shuffle join, one bucket agg (LogReg scaladoc); census =
    * one grouped agg × a 1-row weight-stats crossJoin. */
  private val q222: Q = (s, d) => {
    import s.implicits._
    import graft.operators.LogReg
    val DIMS = 1024
    val ITERS = 8
    // checkpoint-once (r12): docs is consumed by labels, the scored
    // join AND (via feats) both the trainer's lf materialization and
    // the scoring pass — each action re-ran the corpus tokenize before
    // the cut. feats likewise feeds two actions (train, score).
    val docs = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull && $"source".isNotNull)
      .select($"doc_id", $"source",
        array_contains(tokens($"text"), "dup").cast("long").as("y"),
        $"text")
      .localCheckpoint()
    val toks = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
    val feats = LogReg.features(toks, "doc_id", "tok", DIMS, binary = true)
      .localCheckpoint()
    val labels = LogReg.balancedLabels(docs.select($"doc_id", $"y"), "doc_id")
    val w = LogReg.train(feats, labels, "doc_id",
      iters = ITERS, etaLog2 = 2, decay = true, weightCol = Some("wt"))
    val scored = LogReg.score(feats, w, "doc_id")
      .join(docs.select($"doc_id", $"source", $"y"), Seq("doc_id"))
    val wstats = w.agg(count(lit(1)).as("n_w"),
      coalesce(sum($"w"), lit(0L)).as("sum_w"))
    scored.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"y").as("n_pos"),
        sum(($"logit_w" >= 0L).cast("long")).as("n_keep"),
        sum(when(($"logit_w" >= 0L) === ($"y" === 1L), 1L).otherwise(0L))
          .as("n_correct"))
      .crossJoin(broadcast(wstats))
      .select($"source", $"n_docs", $"n_pos", $"n_keep", $"n_correct",
        $"n_w", $"sum_w")
      .orderBy($"source")
  }

  /** HELD-OUT evaluation of the in-engine trainer + the trained gate
    * wired end to end (round-8 verdict #6) — the "does the quality
    * filter generalize" number FineWeb-Edu reports: train [[graft
    * .operators.LogReg]] on the doc_id % 7 ≠ 0 slice ONLY (mod 7, not
    * the q210 mod-10 convention: the fixture strides doc_id across
    * sources in blocks of 20/25, so a mod-10 eval slice degenerates to
    * two sources; 7 is coprime with the stride and every source
    * contributes held-out docs), then gate the UNSEEN
    * doc_id % 7 = 0 slice through [[graft.operators.CorpusPipeline
    * .qualityFilterTrained]] — the production keep/drop API consuming
    * the LEARNED weights, closing the train→gate loop q206 documents
    * with stand-in weights — and report the per-source confusion
    * counts (tp/fp/fn/tn) as exact integers; accuracy, precision and
    * recall are their ratios, left to the reader so every published
    * number stays hash-exact.
    *
    * Cross-engine closure: identical to q222 (all-integer unrolled GD
    * rounds) with the train-slice filter applied to every training
    * CTE; the eval slice never leaks into features, class balance, or
    * the gradient normalizer. Scale shape: q222's (one tokenize scan
    * per slice, checkpointed features, O(dims) model broadcasts); the
    * gate adds one semi join. */
  private val q242: Q = (s, d) => {
    import s.implicits._
    import graft.operators.{CorpusPipeline, LogReg}
    val DIMS = 1024
    val ITERS = 8
    // checkpoint-once (r12): both slices and the final census re-read
    // docs across several actions — tokenize + label once
    val docs = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull && $"source".isNotNull)
      .select($"doc_id", $"source",
        array_contains(tokens($"text"), "dup").cast("long").as("y"),
        $"text")
      .localCheckpoint()
    val train = docs.where($"doc_id" % 7 =!= 0)
    val eval = docs.where($"doc_id" % 7 === 0)
    val trToks = train.select($"doc_id", explode(tokens($"text")).as("tok"))
    val trFeats = LogReg.features(trToks, "doc_id", "tok", DIMS, binary = true)
    val labels = LogReg.balancedLabels(train.select($"doc_id", $"y"), "doc_id")
    val w = LogReg.train(trFeats, labels, "doc_id",
      iters = ITERS, etaLog2 = 2, decay = true, weightCol = Some("wt"))
    val kept = CorpusPipeline
      .qualityFilterTrained(eval, w, CorpusPipeline.Config(),
        dims = DIMS, minLogitW = 0L, binary = true)
      .select($"doc_id", lit(1L).as("kept"))
    eval.join(kept, Seq("doc_id"), "left")
      .select($"source", $"y", coalesce($"kept", lit(0L)).as("kept"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_eval"), sum($"y").as("n_pos"),
        sum($"kept" * $"y").as("tp"),
        sum($"kept" * (lit(1L) - $"y")).as("fp"),
        sum((lit(1L) - $"kept") * $"y").as("fn"),
        sum((lit(1L) - $"kept") * (lit(1L) - $"y")).as("tn"))
      .orderBy($"source")
  }

  /** Threshold-CALIBRATION sweep for the trained gate — the step
    * between q242's fixed-τ confusion report and shipping a filter:
    * FineWeb-Edu publishes precision/recall at a swept score threshold
    * and picks τ where precision holds (3 in their 0–5 grade scale);
    * this query computes the whole curve in one pass. Train exactly as
    * q242 (doc_id % 7 ≠ 0 slice, 8 unrolled GD rounds — oracle CTEs
    * byte-shared via [[duckLogregTrainCtes]]/[[duckGdRounds]], the
    * q223-sentinel sharing rule), score the UNSEEN slice once, then
    * cross-join the O(1) dyadic threshold ladder (9 exact lattice
    * integers spanning the clamp range — no data-derived quantiles, so
    * the ladder is engine-free text) and aggregate exact global
    * confusion counts per τ. keep = logit_w ≥ τ, so τ = 0 reproduces
    * q242's totals by construction (cross-checked in the spec).
    *
    * Scale shape: the trainer is q242's (fixed rounds, O(dims) model
    * broadcasts, checkpointed features); the sweep adds ONE broadcast
    * of a 9-row literal frame and one grouped agg over |eval| × 9
    * rows — never a per-threshold rescan. Output O(thresholds). */
  private val q247: Q = (s, d) => {
    import s.implicits._
    calibrationParts(s, d)._3.orderBy($"tau")
  }

  /** Shared q247/q248 machinery: (labeled docs, trained weights,
    * unordered per-τ confusion sweep) — one definition so the curve
    * q248 selects its operating point from is EXACTLY the curve q247
    * reports (the duckGdRounds sharing rule, Spark-side). */
  private def calibrationParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    import graft.operators.LogReg
    val DIMS = 1024
    val ITERS = 8
    // checkpoint-once (r12): the labeled corpus feeds the train slice
    // (features + labels), the eval slice (features + scored join) and
    // q248's whole-corpus scoring/census — one tokenize+label pass
    val docs = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull && $"source".isNotNull)
      .select($"doc_id", $"source",
        array_contains(tokens($"text"), "dup").cast("long").as("y"),
        $"text")
      .localCheckpoint()
    val train = docs.where($"doc_id" % 7 =!= 0)
    val eval = docs.where($"doc_id" % 7 === 0)
    val trToks = train.select($"doc_id", explode(tokens($"text")).as("tok"))
    val trFeats = LogReg.features(trToks, "doc_id", "tok", DIMS, binary = true)
    val labels = LogReg.balancedLabels(train.select($"doc_id", $"y"), "doc_id")
    val w = LogReg.train(trFeats, labels, "doc_id",
      iters = ITERS, etaLog2 = 2, decay = true, weightCol = Some("wt"))
    val evToks = eval.select($"doc_id", explode(tokens($"text")).as("tok"))
    val evFeats = LogReg.features(evToks, "doc_id", "tok", DIMS, binary = true)
    val scored = LogReg.score(evFeats, w, "doc_id")
      .join(eval.select($"doc_id", $"y"), Seq("doc_id"))
    val taus = calibrationTaus.toDF("tau")
    val sweep = scored.crossJoin(broadcast(taus))
      .select($"tau", $"y",
        ($"logit_w" >= $"tau").cast("long").as("kept"))
      .groupBy($"tau")
      .agg(sum($"kept").as("n_keep"),
        sum($"kept" * $"y").as("tp"),
        sum($"kept" * (lit(1L) - $"y")).as("fp"),
        sum((lit(1L) - $"kept") * $"y").as("fn"),
        sum((lit(1L) - $"kept") * (lit(1L) - $"y")).as("tn"))
    (docs, w, sweep)
  }

  /** CALIBRATED release — the sweep→ship closure over q247: q247
    * reports the detector's precision/recall curve; this query SELECTS
    * the operating point and gates the corpus with it, the step
    * FineWeb-Edu performs between publishing the threshold sweep and
    * releasing the filtered corpus. The rule is exact-integer (never a
    * float ratio): τ* = the qualifying threshold — detector precision
    * ≥ 3/4 as the cross-multiplication 4·tp ≥ 3·(tp+fp) — that catches
    * the most dups (max tp, ties to the smallest τ); if NO threshold
    * qualifies the release falls back to the most conservative ladder
    * point (max τ — flag least, ship most, a deliberate choice the
    * scaladoc of the fallback row records). The WHOLE corpus (train +
    * eval slices — the release is everything) is then scored with the
    * learned weights and docs with logit_w ≥ τ* are flagged as
    * dup-like; the manifest reports per source: docs scored, flagged,
    * released, released token mass, and τ* itself (so the selection
    * rule is oracle-checked, not just the census).
    *
    * Scale shape: trainer + sweep are q247's (fixed rounds, O(dims)
    * model broadcasts); τ* lives on a ≤9-row frame reduced to ONE row
    * and broadcast (1-row stat — the broadcast-audit-rule exemption);
    * corpus scoring is ONE tokenizing scan; census output O(sources).
    * Oracle: trainer/sweep CTEs byte-shared with q242/q247
    * ([[duckLogregTrainCtes]]/[[duckGdRounds]]), the selection a
    * scalar subquery over the shared sweep text. */
  private val q248: Q = (s, d) => {
    import s.implicits._
    import graft.operators.LogReg
    val DIMS = 1024
    val (docs, w, sweep) = calibrationParts(s, d)
    val qual = sweep
      .where(lit(4L) * $"tp" >= lit(3L) * ($"tp" + $"fp"))
      .orderBy($"tp".desc, $"tau".asc).limit(1)
      .select($"tau", lit(0L).as("pri"))
    // fallback: max-τ ladder point (flag least) when nothing qualifies
    val fallback = Seq((calibrationTaus.max, 1L)).toDF("tau", "pri")
    val tauStar = qual.union(fallback).orderBy($"pri").limit(1).select($"tau")
    val allToks = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
    val allFeats = LogReg.features(allToks, "doc_id", "tok", DIMS, binary = true)
    val scoredAll = LogReg.score(allFeats, w, "doc_id")
    docs.select($"doc_id", $"source",
        size(tokens($"text")).cast("long").as("ntok"))
      .join(scoredAll, Seq("doc_id"))
      .crossJoin(broadcast(tauStar))
      .select($"source", $"ntok", $"tau",
        ($"logit_w" >= $"tau").cast("long").as("flagged"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"flagged").as("n_flagged"),
        sum(lit(1L) - $"flagged").as("n_released"),
        sum((lit(1L) - $"flagged") * $"ntok").as("released_tokens"),
        min($"tau").as("tau_star"))
      .orderBy($"source")
  }

  /** The q247 threshold ladder: exact dyadic lattice integers spanning
    * LogReg's ±2^24 weight clamp at logit grain — fixed text on both
    * engines (never data-derived), ONE definition so the Spark frame
    * and the oracle VALUES list cannot drift. */
  private[queries] val calibrationTaus: Seq[Long] =
    Seq(-(1L << 20), -(1L << 16), -(1L << 12), -(1L << 8), 0L,
      1L << 8, 1L << 12, 1L << 16, 1L << 20)

  val queries: Map[String, Q] = Map(
    "q248_calibrated_release" -> q248,
    "q247_gate_calibration" -> q247,
    "q242_trained_eval" -> q242,
    "q222_trained_filter" -> q222,
    "q189_heaps_growth" -> q189,
    "q190_domain_tagger" -> q190,
    "q202_cms_freq" -> q202,
    "q203_quality_classifier" -> q203,
    "q219_weak_labels" -> q219,
    "q220_doremi_weights" -> q220,
    "q207_learnability_select" -> q207,
    "q210_heldout_ppl" -> q210,
    "q225_ppl_buckets" -> q225,
    "q231_memorization" -> q231,
    "q237_token_entropy" -> q237,
    "q238_exposed_evals" -> q238,
    "q211_preference_pairs" -> q211,
    "q183_bm25" -> q183,
    "q180_datacard" -> q180,
    "q179_ccnet_buckets" -> q179,
    "q174_phrase_hitters" -> q174,
    "q171_bigram_bits" -> q171,
    "q169_rank_auc" -> q169,
    "q164_heavy_hitters" -> q164,
    "q146_zipf_slope" -> q146,
    "q140_dsir_weights" -> q140,
    "q137_pmi_collocations" -> q137,
    "q136_unigram_bits" -> q136,
    "q133_weighted_sample" -> q133,
    "q76_repetition" -> q76,
    "q100_token_scrub" -> q100,
    "q42_token_count" -> q42,
    "q43_quality_score" -> q43,
    "q44_lang_id" -> q44,
    "q45_fingerprint" -> q45,
    "q89_decontaminate" -> q89,
    "q90_tfidf" -> q90,
    "q93_stratified_mix" -> q93,
    "q94_sequence_pack" -> q94,
    "q96_ngram_hotspots" -> q96
  )

  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Shared q222/q242 oracle machinery: the `iters` unrolled
    * gradient-descent rounds over a `lf` labeled-feature CTE and a
    * 1-row `wtot` normalizer CTE — ONE text both the full-corpus
    * trainer census and the held-out eval replay, so the two oracles
    * can never drift apart (the q223-sentinel sharing rule). Constants
    * are LogReg's lattice: M = 2^20, σ_h half/slope, clamp 2^24,
    * η = 2^2 halving per round. */
  private[queries] def duckGdRounds(iters: Int): String = {
    val m = 1L << 20
    val half = 1L << 19
    val slope = 1L << 10 // 2^(MScale - WScale - 2)
    val wmax = 1L << 24
    (1 to iters).map { r =>
      val pw = s"w${r - 1}"
      // 2^(MScale - WScale - etaLog2 + round), etaLog2 = 2, decay
      val shift = 1L << (10 + (r - 1))
      s"""l$r AS (
         |  SELECT lf.doc_id, max(lf.ym) AS ym, max(lf.wt) AS wt,
         |    CAST(sum(lf.c * coalesce(pw.w, 0)) AS BIGINT) AS lg
         |  FROM lf LEFT JOIN $pw pw ON lf.b = pw.b GROUP BY lf.doc_id),
         |r$r AS (
         |  SELECT doc_id,
         |    (ym - least(greatest($half + lg * $slope, 0), $m)) * wt AS rr
         |  FROM l$r),
         |g$r AS (
         |  SELECT lf.b, CAST(sum(lf.c * r.rr) AS BIGINT) AS g
         |  FROM lf JOIN r$r r USING (doc_id) GROUP BY lf.b),
         |w$r AS MATERIALIZED (
         |  SELECT b, w FROM (
         |    SELECT coalesce(pw.b, g.b) AS b,
         |      least(greatest(coalesce(pw.w, 0)
         |        + coalesce(g.g // ((SELECT wtot FROM wtot) * $shift), 0),
         |        -$wmax), $wmax) AS w
         |    FROM $pw pw FULL OUTER JOIN g$r g ON pw.b = g.b)
         |  WHERE w <> 0)""".stripMargin
    }.mkString(",\n")
  }

  /** Shared q242/q246 oracle machinery: the train-slice label/feature/
    * normalizer CTE chain (docs, tr, toks, f, cls, nn, wts, lf, wtot,
    * w0) feeding [[duckGdRounds]] — parameterized ONLY by the
    * train-slice predicate, so the trainer the held-out eval replays
    * and the trainer the export flagship replays are one text. */
  private[queries] def duckLogregTrainCtes(slice: String): String = {
    import graft.operators.HashedLinearModel.duckBucket
    val dims = 1024
    val m = 1L << 20
    s"""docs AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    CASE WHEN list_contains(
       |      regexp_split_to_array(trim(text), '\\s+'), 'dup')
       |      THEN 1 ELSE 0 END AS y,
       |    text
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id IS NOT NULL
       |    AND source IS NOT NULL),
       |tr AS MATERIALIZED (SELECT * FROM docs WHERE $slice),
       |toks AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM tr),
       |f AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ${duckBucket("tok", dims)} AS b, 1 AS c
       |  FROM toks
       |  UNION ALL SELECT DISTINCT doc_id, -1 AS b, 1 AS c FROM toks),
       |cls AS (SELECT y, count(*) AS ny FROM tr GROUP BY y),
       |nn AS (SELECT count(*) AS n FROM tr),
       |wts AS (SELECT y, (n * 8) // (2 * ny) AS wt FROM cls, nn),
       |lf AS MATERIALIZED (
       |  SELECT f.doc_id, f.b, f.c, d.y * $m AS ym, w.wt
       |  FROM f JOIN tr d USING (doc_id) JOIN wts w USING (y)),
       |wtot AS (
       |  SELECT CAST(sum(w.wt) AS BIGINT) AS wtot
       |  FROM tr d JOIN wts w USING (y)),
       |w0 AS (SELECT CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS w
       |       WHERE false)""".stripMargin
  }

  /** Shared q247/q248 oracle machinery: the trainer replay
    * ([[duckLogregTrainCtes]]/[[duckGdRounds]], byte-shared with
    * q242/q246) + held-out scoring + the calibrationTaus VALUES ladder
    * + the per-(τ, doc) keep frame `j` — ONE text, so the curve q248's
    * selection rule reads is exactly the curve q247 reports. Every
    * downstream sum CAST BIGINT (the q223 HUGEINT rule). */
  private def duckCalibrationCtes: String = {
    import graft.operators.HashedLinearModel.duckBucket
    val dims = 1024
    val iters = 8
    val rounds = duckGdRounds(iters)
    val tauValues = calibrationTaus.map(t => s"($t)").mkString(", ")
    s"""${duckLogregTrainCtes("doc_id % 7 <> 0")},
       |$rounds,
       |ev AS MATERIALIZED (SELECT * FROM docs WHERE doc_id % 7 = 0),
       |etoks AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM ev),
       |ef AS (
       |  SELECT DISTINCT doc_id, ${duckBucket("tok", dims)} AS b, 1 AS c
       |  FROM etoks
       |  UNION ALL SELECT DISTINCT doc_id, -1 AS b, 1 AS c FROM etoks),
       |sc AS (
       |  SELECT ef.doc_id, CAST(sum(ef.c * coalesce(w.w, 0)) AS BIGINT) AS lw
       |  FROM ef LEFT JOIN w$iters w ON ef.b = w.b GROUP BY ef.doc_id),
       |taus(tau) AS (VALUES $tauValues),
       |j AS (
       |  SELECT t.tau, d.y,
       |    CASE WHEN sc.lw >= t.tau THEN 1 ELSE 0 END AS kept
       |  FROM sc JOIN ev d USING (doc_id) CROSS JOIN taus t)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q247_gate_calibration" ->
      s"""WITH $duckCalibrationCtes
         |SELECT CAST(tau AS BIGINT) AS tau,
         |  CAST(sum(kept) AS BIGINT) AS n_keep,
         |  CAST(sum(kept * y) AS BIGINT) AS tp,
         |  CAST(sum(kept * (1 - y)) AS BIGINT) AS fp,
         |  CAST(sum((1 - kept) * y) AS BIGINT) AS fn,
         |  CAST(sum((1 - kept) * (1 - y)) AS BIGINT) AS tn
         |FROM j GROUP BY tau ORDER BY tau""".stripMargin,
    "q248_calibrated_release" -> {
      // sweep/selection over the SHARED calibration CTEs, then one
      // full-corpus scoring pass (af/asc0 mirror ef/sc over `docs`)
      // and the per-source release census; τ* selection is exact
      // integer cross-multiplication (precision ≥ 3/4 ⇔ 4·tp ≥
      // 3·(tp+fp)), fallback = max ladder point when none qualifies
      import graft.operators.HashedLinearModel.duckBucket
      val dims = 1024
      val iters = 8
      s"""WITH $duckCalibrationCtes,
         |sweep AS (
         |  SELECT CAST(tau AS BIGINT) AS tau,
         |    CAST(sum(kept * y) AS BIGINT) AS tp,
         |    CAST(sum(kept * (1 - y)) AS BIGINT) AS fp
         |  FROM j GROUP BY tau),
         |sel AS (
         |  SELECT CAST(coalesce(
         |    (SELECT tau FROM sweep WHERE 4 * tp >= 3 * (tp + fp)
         |     ORDER BY tp DESC, tau ASC LIMIT 1),
         |    ${calibrationTaus.max}) AS BIGINT) AS tau),
         |atoks AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM docs),
         |af AS (
         |  SELECT DISTINCT doc_id, ${duckBucket("tok", dims)} AS b, 1 AS c
         |  FROM atoks
         |  UNION ALL SELECT DISTINCT doc_id, -1 AS b, 1 AS c FROM atoks),
         |asc0 AS (
         |  SELECT af.doc_id, CAST(sum(af.c * coalesce(w.w, 0)) AS BIGINT) AS lw
         |  FROM af LEFT JOIN w$iters w ON af.b = w.b GROUP BY af.doc_id),
         |rel AS (
         |  SELECT d.source, s.tau,
         |    CASE WHEN a.lw >= s.tau THEN 1 ELSE 0 END AS flagged,
         |    len(regexp_split_to_array(trim(d.text), '\\s+')) AS ntok
         |  FROM asc0 a JOIN docs d USING (doc_id) CROSS JOIN sel s)
         |SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(flagged) AS BIGINT) AS n_flagged,
         |  CAST(sum(1 - flagged) AS BIGINT) AS n_released,
         |  CAST(sum((1 - flagged) * ntok) AS BIGINT) AS released_tokens,
         |  CAST(min(tau) AS BIGINT) AS tau_star
         |FROM rel GROUP BY source ORDER BY source""".stripMargin
    },
    "q242_trained_eval" -> {
      // q222's training replay with every training CTE filtered to the
      // doc_id % 7 <> 0 slice (mod 7: coprime with the fixture's
      // source stride — see the query scaladoc); the held-out slice only appears in the
      // scoring tail, gated at lw >= 0 (= qualityFilterTrained's
      // minLogitW = 0)
      import graft.operators.HashedLinearModel.duckBucket
      val dims = 1024
      val iters = 8
      val rounds = duckGdRounds(iters)
      s"""WITH ${duckLogregTrainCtes("doc_id % 7 <> 0")},
         |$rounds,
         |ev AS MATERIALIZED (SELECT * FROM docs WHERE doc_id % 7 = 0),
         |etoks AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM ev),
         |ef AS (
         |  SELECT DISTINCT doc_id, ${duckBucket("tok", dims)} AS b, 1 AS c
         |  FROM etoks
         |  UNION ALL SELECT DISTINCT doc_id, -1 AS b, 1 AS c FROM etoks),
         |sc AS (
         |  SELECT ef.doc_id, CAST(sum(ef.c * coalesce(w.w, 0)) AS BIGINT) AS lw
         |  FROM ef LEFT JOIN w$iters w ON ef.b = w.b GROUP BY ef.doc_id),
         |j AS (
         |  SELECT d.source, d.y,
         |    CASE WHEN sc.lw >= 0 THEN 1 ELSE 0 END AS kept
         |  FROM sc JOIN ev d USING (doc_id))
         |SELECT source, count(*) AS n_eval,
         |  CAST(sum(y) AS BIGINT) AS n_pos,
         |  CAST(sum(kept * y) AS BIGINT) AS tp,
         |  CAST(sum(kept * (1 - y)) AS BIGINT) AS fp,
         |  CAST(sum((1 - kept) * y) AS BIGINT) AS fn,
         |  CAST(sum((1 - kept) * (1 - y)) AS BIGINT) AS tn
         |FROM j GROUP BY source ORDER BY source""".stripMargin
    },
    "q183_bm25" ->
      s"""WITH $bm25Cte,
         |r AS (
         |  SELECT lang, doc_id, bm25_u,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY bm25_u DESC, doc_id) AS rnk
         |  FROM sc)
         |SELECT lang, rnk, doc_id, bm25_u FROM r
         |WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    "q180_datacard" ->
      s"""WITH t AS (SELECT source, lang, doc_id, n_chars,
         |    CASE WHEN text IS NULL THEN NULL
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
         |  FROM documents),
         |d AS (SELECT source, lang, doc_id, n_chars,
         |    coalesce(len(w), 0) AS n_tok,
         |    coalesce(len(list_distinct(w)), 0) AS n_uniq,
         |    coalesce(len(list_filter(w, x -> x IN ($stopList))), 0) AS n_stop,
         |    coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS sum_len
         |  FROM t)
         |SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_tok = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(sum(CASE WHEN n_tok > 0 AND (n_tok - n_uniq) * 2 >= n_tok
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
         |  round(CAST(sum(CASE WHEN n_tok > 0
         |      THEN CAST(round(n_stop::DOUBLE / n_tok * 10000) AS BIGINT)
         |      ELSE 0 END) AS BIGINT)
         |    / (sum(CASE WHEN n_tok > 0 THEN 1 ELSE 0 END) * 10000.0), 4)
         |    AS avg_stop_ratio,
         |  round(CAST(sum(CASE WHEN n_tok > 0
         |      THEN CAST(round(sum_len::DOUBLE / n_tok * 10000) AS BIGINT)
         |      ELSE 0 END) AS BIGINT)
         |    / (sum(CASE WHEN n_tok > 0 THEN 1 ELSE 0 END) * 10000.0), 4)
         |    AS avg_word_len
         |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q174_phrase_hitters" ->
      """WITH t AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT source, array_to_string(w[r.i:r.i+1], ' ') AS gram
        |      FROM t, unnest(range(1, len(w))) r(i)),
        |n AS (SELECT source, count(*) AS n_grp FROM g GROUP BY source),
        |c AS (SELECT source, gram, count(*) AS cnt FROM g GROUP BY source, gram)
        |SELECT c.source, gram, cnt, n_grp
        |FROM c JOIN n USING (source)
        |WHERE cnt * 200 > n_grp
        |ORDER BY source, gram""".stripMargin,
    "q179_ccnet_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, unnest(w) AS tok FROM t),
        |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |bg AS (SELECT doc_id, w[r.i] AS tok, w[r.i + 1] AS nxt
        |       FROM t, unnest(range(1, len(w))) r(i)),
        |bi AS (SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c12
        |       FROM bg GROUP BY tok, nxt),
        |pd AS (
        |  SELECT doc_id, round(avg(log2((4 * ua.c1 * n)::DOUBLE)
        |                 - log2((3 * bi.c12 * n + ua.c1 * ub.c1)::DOUBLE)), 4)
        |           AS bits_per_bigram
        |  FROM bg
        |  JOIN bi USING (tok, nxt)
        |  JOIN uni ua ON ua.tok = bg.tok
        |  JOIN uni ub ON ub.tok = bg.nxt, tot
        |  GROUP BY doc_id),
        |pl AS (
        |  SELECT d.lang, bits_per_bigram,
        |         ntile(3) OVER (PARTITION BY d.lang
        |                        ORDER BY bits_per_bigram, pd.doc_id) AS bucket
        |  FROM pd JOIN documents d ON d.doc_id = pd.doc_id)
        |SELECT lang, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |       min(bits_per_bigram) AS min_bits,
        |       max(bits_per_bigram) AS max_bits
        |FROM pl GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    "q171_bigram_bits" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, unnest(w) AS tok FROM t),
        |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |bg AS (SELECT doc_id, w[r.i] AS tok, w[r.i + 1] AS nxt
        |       FROM t, unnest(range(1, len(w))) r(i)),
        |bi AS (SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c12
        |       FROM bg GROUP BY tok, nxt)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       round(avg(log2((4 * ua.c1 * n)::DOUBLE)
        |                 - log2((3 * bi.c12 * n + ua.c1 * ub.c1)::DOUBLE)), 4)
        |         AS bits_per_bigram
        |FROM bg
        |JOIN bi USING (tok, nxt)
        |JOIN uni ua ON ua.tok = bg.tok
        |JOIN uni ub ON ub.tok = bg.nxt, tot
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q169_rank_auc" ->
      (s"""WITH p AS (
        |  SELECT lang,
        |    CAST(round(round(
        |      (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 1000
        |            THEN 0.4 ELSE 0.1 END)
        |    + (CASE WHEN round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        |                 t -> t IN ($stopList)))::DOUBLE
        |               / len(regexp_split_to_array(trim(text), '\\s+')), 4) > 0.05
        |            THEN 0.3 ELSE 0.0 END)
        |    + (CASE WHEN round(length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE
        |               / len(regexp_split_to_array(trim(text), '\\s+')), 4) BETWEEN 3.0 AND 10.0
        |            THEN 0.3 ELSE 0.1 END), 1) * 10) AS BIGINT) AS s10,
        |    CASE WHEN (len(regexp_split_to_array(trim(text), '\\s+'))
        |               - len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))) * 2
        |              >= len(regexp_split_to_array(trim(text), '\\s+'))
        |         THEN 1 ELSE 0 END AS pos
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT lang, s10, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n1
        |      FROM p GROUP BY lang, s10),
        |r AS (SELECT lang, s10, n, n1,
        |        coalesce(sum(n) OVER (PARTITION BY lang ORDER BY s10
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_less
        |      FROM b),
        |a AS (SELECT lang,
        |        CAST(sum(n1 * (2 * cum_less + n + 1)) AS BIGINT) AS r1_2,
        |        CAST(sum(n1) AS BIGINT) AS n_pos,
        |        CAST(sum(n) - sum(n1) AS BIGINT) AS n_neg
        |      FROM r GROUP BY lang)
        |SELECT lang, n_pos, n_neg,
        |       CAST((r1_2 - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
        |FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY lang""".stripMargin),
    "q164_heavy_hitters" ->
      """WITH t AS (SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |           FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT lang, count(*) AS n_grp FROM t GROUP BY lang),
        |c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY lang, tok)
        |SELECT c.lang, tok, cnt, n_grp
        |FROM c JOIN n USING (lang)
        |WHERE cnt * 30 > n_grp
        |ORDER BY lang, tok""".stripMargin,
    "q190_domain_tagger" -> {
      val cases = Seq(
        "compute" -> Seq("join", "merge", "hash", "agg"),
        "ordering" -> Seq("sort", "order", "group"),
        "storage" -> Seq("scan", "filter", "table", "row"),
        "streaming" -> Seq("stream", "batch", "window"))
        .map { case (t, kws) =>
          s"WHEN tok IN (${kws.map(k => s"'$k'").mkString(", ")}) THEN '$t'"
        }.mkString("\n    ")
      s"""WITH docs AS (SELECT doc_id, lang FROM documents
         |  WHERE text IS NOT NULL AND doc_id IS NOT NULL),
         |hits AS (
         |  SELECT doc_id, topic, count(*) AS cnt FROM (
         |    SELECT doc_id, CASE
         |    $cases
         |    END AS topic
         |    FROM (SELECT doc_id,
         |        unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL))
         |  WHERE topic IS NOT NULL GROUP BY 1, 2),
         |assigned AS (
         |  SELECT doc_id, topic FROM (
         |    SELECT doc_id, topic, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY cnt DESC, topic) AS rn
         |    FROM hits) WHERE rn = 1),
         |census AS (
         |  SELECT lang, coalesce(topic, 'none') AS topic,
         |    count(*) AS n_docs
         |  FROM docs LEFT JOIN assigned USING (doc_id) GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS tot
         |  FROM census GROUP BY lang)
         |SELECT lang, topic, n_docs,
         |  CAST((n_docs * 1000000) // tot AS BIGINT) AS share_ppm
         |FROM census JOIN tot USING (lang)
         |ORDER BY lang, topic""".stripMargin
    },
    "q211_preference_pairs" -> {
      import graft.operators.HashedLinearModel.{duckBucket, duckWeight16}
      s"""WITH toks AS (
         |  SELECT source, lang, doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL
         |    AND lang IS NOT NULL AND doc_id IS NOT NULL),
         |scored AS (
         |  SELECT source, lang, doc_id,
         |    CAST(sum(${duckWeight16(duckBucket("tok", 1024))}) AS BIGINT)
         |      AS logit16
         |  FROM toks GROUP BY 1, 2, 3),
         |r AS (
         |  SELECT source, lang, doc_id, logit16,
         |    row_number() OVER (PARTITION BY source, lang
         |                       ORDER BY logit16 DESC, doc_id) AS r_hi,
         |    row_number() OVER (PARTITION BY source, lang
         |                       ORDER BY logit16 ASC, doc_id) AS r_lo
         |  FROM scored)
         |SELECT source, lang, h.doc_id AS chosen_id, l.doc_id AS rejected_id,
         |  h.logit16 - l.logit16 AS margin16
         |FROM (SELECT * FROM r WHERE r_hi = 1) h
         |JOIN (SELECT * FROM r WHERE r_lo = 1) l USING (source, lang)
         |WHERE h.logit16 - l.logit16 > 0
         |ORDER BY source, lang""".stripMargin
    },
    "q225_ppl_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |bg AS (SELECT doc_id, lang, w[r.i] AS tok, w[r.i + 1] AS nxt
        |       FROM t, unnest(range(1, len(w))) r(i)),
        |train AS (SELECT * FROM bg WHERE doc_id % 10 <> 0),
        |bi AS (SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c12
        |       FROM train GROUP BY tok, nxt),
        |ctx AS (SELECT tok, CAST(count(*) AS BIGINT) AS ctx
        |        FROM train GROUP BY tok),
        |uni AS (SELECT nxt, CAST(count(*) AS BIGINT) AS c2
        |        FROM train GROUP BY nxt),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS t,
        |                 CAST(count(DISTINCT nxt) AS BIGINT) AS v FROM train),
        |sc AS (
        |  SELECT g.doc_id, g.lang,
        |    CAST(round(round(
        |      log2((4 * COALESCE(c.ctx, 1) * (s.t + s.v))::DOUBLE)
        |      - log2((3 * COALESCE(b.c12, 0) * (s.t + s.v)
        |              + COALESCE(c.ctx, 1) * (COALESCE(u.c2, 0) + 1))::DOUBLE),
        |      6) * 1000000) AS BIGINT) AS mb
        |  FROM bg g
        |  LEFT JOIN bi b ON b.tok = g.tok AND b.nxt = g.nxt
        |  LEFT JOIN ctx c ON c.tok = g.tok
        |  LEFT JOIN uni u ON u.nxt = g.nxt, stats s),
        |pd AS (
        |  SELECT doc_id, lang, count(*) AS n_bg,
        |    CAST(sum(mb) AS BIGINT) // count(*) AS mbpt
        |  FROM sc GROUP BY doc_id, lang),
        |cuts AS (
        |  SELECT lang AS clang, quantile_disc(mbpt, 0.3333334) AS c1,
        |         quantile_disc(mbpt, 0.6666668) AS c2
        |  FROM pd GROUP BY lang)
        |SELECT pd.lang,
        |  CASE WHEN mbpt <= c1 THEN 'head'
        |       WHEN mbpt <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs,
        |  CAST(sum(n_bg) AS BIGINT) AS n_bigrams,
        |  min(mbpt) AS min_mbpt, max(mbpt) AS max_mbpt
        |FROM pd JOIN cuts ON pd.lang = cuts.clang
        |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    "q210_heldout_ppl" ->
      """WITH t AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |bg AS (SELECT doc_id, lang, w[r.i] AS tok, w[r.i + 1] AS nxt
        |       FROM t, unnest(range(1, len(w))) r(i)),
        |train AS (SELECT * FROM bg WHERE doc_id % 10 <> 0),
        |bi AS (SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c12
        |       FROM train GROUP BY tok, nxt),
        |ctx AS (SELECT tok, CAST(count(*) AS BIGINT) AS ctx
        |        FROM train GROUP BY tok),
        |uni AS (SELECT nxt, CAST(count(*) AS BIGINT) AS c2
        |        FROM train GROUP BY nxt),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS t,
        |                 CAST(count(DISTINCT nxt) AS BIGINT) AS v FROM train),
        |sc AS (
        |  SELECT g.doc_id, g.lang,
        |    CAST(round(round(
        |      log2((4 * COALESCE(c.ctx, 1) * (s.t + s.v))::DOUBLE)
        |      - log2((3 * COALESCE(b.c12, 0) * (s.t + s.v)
        |              + COALESCE(c.ctx, 1) * (COALESCE(u.c2, 0) + 1))::DOUBLE),
        |      6) * 1000000) AS BIGINT) AS mb
        |  FROM bg g
        |  LEFT JOIN bi b ON b.tok = g.tok AND b.nxt = g.nxt
        |  LEFT JOIN ctx c ON c.tok = g.tok
        |  LEFT JOIN uni u ON u.nxt = g.nxt, stats s
        |  WHERE g.doc_id % 10 = 0)
        |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_bigrams,
        |  CAST(sum(mb) AS BIGINT) AS nll_mb,
        |  CAST(CAST(sum(mb) AS BIGINT) // count(*) AS BIGINT) AS mb_per_bigram
        |FROM sc GROUP BY lang ORDER BY lang""".stripMargin,
    "q207_learnability_select" -> {
      import graft.operators.HashedLinearModel.{duckBucket, duckWeight16}
      s"""WITH toks AS (
         |  SELECT source, doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
         |scored AS (
         |  SELECT source, doc_id,
         |    CAST(sum(${duckWeight16(duckBucket("tok", 1024, "hlmr"), "hlmwr")})
         |      - sum(${duckWeight16(duckBucket("tok", 1024))}) AS BIGINT)
         |      AS learn16
         |  FROM toks GROUP BY 1, 2)
         |SELECT rnk, doc_id, source, learn16 FROM (
         |  SELECT doc_id, source, learn16,
         |    row_number() OVER (ORDER BY learn16 DESC, doc_id) AS rnk
         |  FROM scored) WHERE rnk <= 10 ORDER BY rnk""".stripMargin
    },
    "q222_trained_filter" -> {
      // exact-integer training replay: the ITERS gradient-descent
      // rounds unroll as CTEs (w0 empty = all-zero weights; each round
      // = logit left join, hard-sigmoid residual × balanced doc weight,
      // gradient agg, weight merge with the same truncating // and
      // clamp LogReg uses; the divisor doubles per round = the halving
      // dyadic rate). Rounds text shared with q242 (duckGdRounds) —
      // the held-out twin must replay the identical trainer.
      import graft.operators.HashedLinearModel.duckBucket
      val dims = 1024
      val iters = 8
      val m = 1L << 20
      val rounds = duckGdRounds(iters)
      s"""WITH docs AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CASE WHEN list_contains(
         |      regexp_split_to_array(trim(text), '\\s+'), 'dup')
         |      THEN 1 ELSE 0 END AS y,
         |    text
         |  FROM documents
         |  WHERE text IS NOT NULL AND doc_id IS NOT NULL
         |    AND source IS NOT NULL),
         |toks AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM docs),
         |f AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, ${duckBucket("tok", dims)} AS b, 1 AS c
         |  FROM toks
         |  UNION ALL SELECT DISTINCT doc_id, -1 AS b, 1 AS c FROM toks),
         |cls AS (SELECT y, count(*) AS ny FROM docs GROUP BY y),
         |nn AS (SELECT count(*) AS n FROM docs),
         |wts AS (SELECT y, (n * 8) // (2 * ny) AS wt FROM cls, nn),
         |lf AS MATERIALIZED (
         |  SELECT f.doc_id, f.b, f.c, d.y * $m AS ym, w.wt
         |  FROM f JOIN docs d USING (doc_id) JOIN wts w USING (y)),
         |wtot AS (
         |  SELECT CAST(sum(w.wt) AS BIGINT) AS wtot
         |  FROM docs d JOIN wts w USING (y)),
         |w0 AS (SELECT CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS w
         |       WHERE false),
         |$rounds,
         |sc AS (
         |  SELECT f.doc_id, CAST(sum(f.c * coalesce(w.w, 0)) AS BIGINT) AS lw
         |  FROM f LEFT JOIN w$iters w ON f.b = w.b GROUP BY f.doc_id),
         |j AS (SELECT d.source, d.y, sc.lw FROM sc JOIN docs d USING (doc_id)),
         |ws AS (SELECT count(*) AS n_w,
         |       CAST(coalesce(sum(w), 0) AS BIGINT) AS sum_w FROM w$iters)
         |SELECT j.source, count(*) AS n_docs,
         |  CAST(sum(j.y) AS BIGINT) AS n_pos,
         |  CAST(sum(CASE WHEN j.lw >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(sum(CASE WHEN (j.lw >= 0) = (j.y = 1) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  max(ws.n_w) AS n_w, max(ws.sum_w) AS sum_w
         |FROM j, ws GROUP BY j.source ORDER BY j.source""".stripMargin
    },
    "q203_quality_classifier" -> {
      import graft.operators.HashedLinearModel.{duckBucket, duckWeight16}
      s"""WITH toks AS (
         |  SELECT source, doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
         |lg AS (
         |  SELECT source, doc_id,
         |    CAST(sum(${duckWeight16(duckBucket("tok", 1024))}) AS BIGINT)
         |      AS logit16
         |  FROM toks GROUP BY 1, 2)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN logit16 >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pass,
         |  CAST(sum(CASE WHEN logit16 >= 0 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS pass_ppm,
         |  CAST(sum(logit16) AS BIGINT) AS sum_logit16
         |FROM lg GROUP BY source ORDER BY source""".stripMargin
    },
    "q220_doremi_weights" -> {
      import graft.operators.HashedLinearModel.{duckBucket, duckWeight16}
      s"""WITH toks AS (
         |  SELECT source, doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
         |docs AS (
         |  SELECT source, doc_id,
         |    greatest(CAST(sum(${duckWeight16(duckBucket("tok", 1024))})
         |        AS BIGINT)
         |      - CAST(sum(${duckWeight16(duckBucket("tok", 1024, "hlmr"), "hlmwr")})
         |        AS BIGINT), 0) AS excess16
         |  FROM toks GROUP BY 1, 2),
         |dom AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(excess16) AS BIGINT) AS excess16
         |  FROM docs GROUP BY source),
         |tot AS (SELECT CAST(sum(excess16) AS BIGINT) AS tot16,
         |        count(*) AS k FROM dom)
         |SELECT d.source, d.n_docs, d.excess16,
         |  CAST(d.excess16 * 1000000 // t.tot16 AS BIGINT) AS weight_ppm,
         |  CAST((d.excess16 * 1000000 // t.tot16) * 7 // 8
         |    + 1000000 // (8 * t.k) AS BIGINT) AS smoothed_ppm
         |FROM dom d CROSS JOIN tot t WHERE t.tot16 > 0
         |ORDER BY d.source""".stripMargin
    },
    "q219_weak_labels" -> {
      import graft.operators.HashedLinearModel.{duckBucket, duckWeight16}
      def lf(k: Int) =
        s"CAST(sum(${duckWeight16(duckBucket("tok", 1024, s"lf$k"), s"lf${k}w")}) AS BIGINT)"
      s"""WITH toks AS (
         |  SELECT source, doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
         |lg AS (
         |  SELECT source, doc_id, ${lf(1)} AS l1, ${lf(2)} AS l2,
         |    ${lf(3)} AS l3
         |  FROM toks GROUP BY 1, 2),
         |v AS (
         |  SELECT source,
         |    (CASE WHEN l1 >= 0 THEN 1 ELSE 0 END
         |     + CASE WHEN l2 >= 0 THEN 1 ELSE 0 END
         |     + CASE WHEN l3 >= 0 THEN 1 ELSE 0 END) AS n_yes,
         |    (CASE WHEN (l1 >= 0) = (l2 >= 0) THEN 1 ELSE 0 END
         |     + CASE WHEN (l1 >= 0) = (l3 >= 0) THEN 1 ELSE 0 END
         |     + CASE WHEN (l2 >= 0) = (l3 >= 0) THEN 1 ELSE 0 END)
         |      AS pair_agree
         |  FROM lg)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_yes >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_maj_pos,
         |  CAST(sum(CASE WHEN n_yes = 0 OR n_yes = 3 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_unanimous,
         |  CAST(sum(CASE WHEN n_yes = 1 OR n_yes = 2 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_split,
         |  CAST(sum(pair_agree) AS BIGINT) AS sum_pair_agree
         |FROM v GROUP BY source ORDER BY source""".stripMargin
    },
    "q202_cms_freq" -> {
      val pts = graft.functions.TextFunctions.stopwords.take(8)
      val inList = pts.map(t => s"'$t'").mkString(", ")
      val vals = pts.map(t => s"('$t')").mkString(", ")
      s"""WITH toks AS (
         |  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |counters AS (
         |  SELECT source, r, b, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT source, r,
         |      ('0x' || substr(md5('cm' || r || ':' || tok), 1, 8))::BIGINT % 256 AS b
         |    FROM toks CROSS JOIN range(0, 4) t(r))
         |  GROUP BY 1, 2, 3),
         |probes AS (
         |  SELECT s.source, p.tok
         |  FROM (SELECT DISTINCT source FROM toks) s
         |  CROSS JOIN (VALUES $vals) p(tok)),
         |pb AS (
         |  SELECT source, tok, r,
         |    ('0x' || substr(md5('cm' || r || ':' || tok), 1, 8))::BIGINT % 256 AS b
         |  FROM probes CROSS JOIN range(0, 4) t(r)),
         |est AS (
         |  SELECT source, tok, CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS est
         |  FROM pb LEFT JOIN counters c USING (source, r, b)
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n_exact
         |  FROM toks WHERE tok IN ($inList) GROUP BY 1, 2)
         |SELECT e.source, e.tok, e.est,
         |  CAST(COALESCE(x.n_exact, 0) AS BIGINT) AS n_exact,
         |  CAST(e.est - COALESCE(x.n_exact, 0) AS BIGINT) AS overcount
         |FROM est e LEFT JOIN ex x USING (source, tok)
         |ORDER BY source, tok""".stripMargin
    },
    "q189_heaps_growth" -> {
      val cts = (1 to 10).map(c =>
        s"CAST(sum(CASE WHEN doc_id <= b$c THEN ntok ELSE 0 END) AS BIGINT) AS ct$c")
        .mkString(",\n    ")
      val cvs = (1 to 10).map(c =>
        s"CAST(sum(CASE WHEN fdoc <= b$c THEN 1 ELSE 0 END) AS BIGINT) AS cv$c")
        .mkString(",\n    ")
      val bs = (1 to 10).map(c =>
        s"min(doc_id) + (max(doc_id) - min(doc_id)) * $c // 10 AS b$c")
        .mkString(",\n    ")
      val melt = (1 to 10).map(c =>
        s"SELECT source, ct$c AS ctok, cv$c AS cvoc FROM j")
        .mkString("\n  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT source, doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
         |perdoc AS (SELECT source, doc_id, count(*) AS ntok
         |  FROM toks GROUP BY 1, 2),
         |bounds AS (SELECT source,
         |    $bs
         |  FROM perdoc GROUP BY source),
         |ftok AS (SELECT source, tok, min(doc_id) AS fdoc
         |  FROM toks GROUP BY 1, 2),
         |ct AS (SELECT p.source,
         |    $cts
         |  FROM perdoc p JOIN bounds USING (source) GROUP BY 1),
         |cv AS (SELECT f.source,
         |    $cvs
         |  FROM ftok f JOIN bounds USING (source) GROUP BY 1),
         |j AS (SELECT * FROM ct JOIN cv USING (source)),
         |pts AS (
         |  SELECT source,
         |    CAST(round(ln(ctok) * 1000) AS BIGINT) AS x,
         |    CAST(round(ln(cvoc) * 1000) AS BIGINT) AS y
         |  FROM ($melt)
         |  WHERE ctok > 0 AND cvoc > 0),
         |ols AS (
         |  SELECT source,
         |    CAST(count(*) AS BIGINT) AS n_pts,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM pts GROUP BY source
         |  HAVING count(*) >= 2 AND (count(*) * sum(x * x) - sum(x) * sum(x)) <> 0),
         |closed AS (
         |  SELECT source, n_pts,
         |    CAST((n_pts * sxy - sx * sy) * 1000000
         |      // (n_pts * sxx - sx * sx) AS BIGINT) AS beta_ppm,
         |    sx, sy
         |  FROM ols)
         |SELECT source, n_pts, beta_ppm,
         |  CAST((sy * 1000000 - beta_ppm * sx) // (n_pts * 1000) AS BIGINT)
         |    AS intercept_u
         |FROM closed ORDER BY source""".stripMargin
    },
    "q146_zipf_slope" ->
      """WITH freq AS (
        |  SELECT lang, tok, count(*) AS f
        |  FROM (SELECT lang,
        |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |        FROM documents WHERE text IS NOT NULL)
        |  GROUP BY lang, tok),
        |top AS (
        |  SELECT lang, ln(r) AS x, ln(f) AS y FROM (
        |    SELECT lang, f, row_number() OVER (PARTITION BY lang
        |        ORDER BY f DESC, tok) AS r
        |    FROM freq) WHERE r <= 100),
        |ols AS (
        |  SELECT lang, count(*) AS n_terms, sum(x) AS sx, sum(y) AS sy,
        |         sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM top GROUP BY lang HAVING count(*) >= 2)
        |SELECT lang, n_terms,
        |  round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 4)
        |    AS zipf_slope,
        |  round((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)
        |    * sx) / n_terms, 4) AS zipf_intercept
        |FROM ols ORDER BY lang""".stripMargin,
    "q140_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) % 1024 AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |        FROM documents WHERE text IS NOT NULL)),
        |hist AS (
        |  SELECT b, CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |         count(*) AS cr
        |  FROM toks GROUP BY b),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
        |               CAST(sum(cr) AS BIGINT) AS nr FROM hist),
        |llr AS (
        |  SELECT b, log2(((ct + 1) * (nr + 1024))::DOUBLE /
        |                 ((cr + 1) * (nt + 1024))::DOUBLE) AS llr
        |  FROM hist, tot),
        |pdb AS (SELECT doc_id, b, count(*) AS c FROM toks GROUP BY doc_id, b)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |       round(sum(c * llr), 4) AS dsir_logw
        |FROM pdb JOIN llr USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q137_pmi_collocations" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(w) AS tok FROM t),
        |uni AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |bi AS (
        |  SELECT w[r.i] AS tok_a, w[r.i + 1] AS tok_b, count(*) AS cnt_ab
        |  FROM t, unnest(range(1, len(w))) r(i)
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM toks) AS n_tok,
        |         (SELECT CAST(sum(cnt_ab) AS BIGINT) FROM bi) AS n_bi)
        |SELECT tok_a, tok_b, cnt_ab,
        |       round(log2((cnt_ab * n_tok * n_tok)::DOUBLE /
        |                  (n_bi * ua.cnt * ub.cnt)::DOUBLE), 4) AS pmi
        |FROM bi
        |JOIN uni ua ON ua.tok = tok_a
        |JOIN uni ub ON ub.tok = tok_b, tot
        |WHERE cnt_ab >= 5
        |ORDER BY pmi DESC, tok_a, tok_b LIMIT 20""".stripMargin,
    "q136_unigram_bits" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |hist AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist)
        |SELECT doc_id, count(*) AS n_tok,
        |       round(avg(-log2(cnt / n)), 4) AS bits_per_token
        |FROM toks JOIN hist USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q133_weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars / 100.0 AS wt,
        |         CAST(('0x' || substr(md5(doc_id::VARCHAR || 'ws'), 1, 8)) AS UBIGINT)
        |           / 4294967296.0 AS u
        |  FROM documents),
        |k AS (SELECT doc_id, lang, round(power(u, 1.0 / wt), 9) AS samp_key FROM b),
        |r AS (SELECT lang, doc_id, samp_key,
        |        row_number() OVER (PARTITION BY lang
        |                           ORDER BY samp_key DESC, doc_id) AS rnk
        |      FROM k)
        |SELECT lang, rnk, doc_id, round(samp_key, 6) AS samp_key FROM r
        |WHERE rnk <= 2 ORDER BY lang, rnk""".stripMargin,
    "q100_token_scrub" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> x IN ('the', 'a', 'value'))) AS BIGINT) AS n_removed,
        |  md5(array_to_string(list_filter(string_split(text, ' '),
        |    x -> x NOT IN ('the', 'a', 'value')), ' ')) AS scrub_md5
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,
    "q76_repetition" ->
      """WITH t AS (SELECT lang, doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_uniq
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN (n_tok - n_uniq) * 2 >= n_tok THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_repetitive,
        |  round(CAST(sum(CAST(round((n_tok - n_uniq)::DOUBLE / n_tok * 1000000) AS BIGINT)) AS DOUBLE)
        |    / (count(*) * 1000000.0), 4) AS avg_dup_ratio
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q42_token_count" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS total_tokens,
        |  CAST(sum(bpe) AS BIGINT) AS total_bpe_tokens,
        |  CAST(sum(chars) AS BIGINT) AS total_chars,
        |  round(avg(toks), 4) AS avg_tokens
        |FROM (SELECT lang,
        |        len(regexp_split_to_array(trim(text), '\s+')) AS toks,
        |        len(regexp_split_to_array(trim(text), '\s+'))
        |          + list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |              t -> greatest(CAST(ceil(length(t) / 6.0) AS BIGINT) - 1, 0))) AS bpe,
        |        length(trim(text)) AS chars
        |      FROM documents WHERE text IS NOT NULL)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q43_quality_score" ->
      (s"""SELECT lang, score, count(*) AS n_docs,
        |  round(CAST(sum(CAST(round(stop_ratio * 10000) AS BIGINT)) AS DOUBLE)
        |    / (count(*) * 10000.0), 4) AS avg_stop_ratio,
        |  min(doc_id) AS min_doc
        |FROM (SELECT lang, doc_id,
        |        round(
        |          (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 1000
        |                THEN 0.4 ELSE 0.1 END)
        |        + (CASE WHEN round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        |                     t -> t IN ($stopList)))::DOUBLE
        |                   / len(regexp_split_to_array(trim(text), '\\s+')), 4) > 0.05
        |                THEN 0.3 ELSE 0.0 END)
        |        + (CASE WHEN round(length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE
        |                   / len(regexp_split_to_array(trim(text), '\\s+')), 4) BETWEEN 3.0 AND 10.0
        |                THEN 0.3 ELSE 0.1 END), 1)::DOUBLE AS score,
        |        round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        |                t -> t IN ($stopList)))::DOUBLE
        |          / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS stop_ratio
        |      FROM documents WHERE text IS NOT NULL)
        |GROUP BY lang, score ORDER BY lang, score""").stripMargin,
    "q44_lang_id" ->
      """SELECT lang, guess, count(*) AS n
        |FROM (SELECT lang,
        |        CASE
        |          WHEN v_de >= v_en AND v_de >= v_es AND v_de >= v_fr AND v_de >= v_zh THEN 'de'
        |          WHEN v_en >= v_es AND v_en >= v_fr AND v_en >= v_zh THEN 'en'
        |          WHEN v_es >= v_fr AND v_es >= v_zh THEN 'es'
        |          WHEN v_fr >= v_zh THEN 'fr'
        |          ELSE 'zh' END AS guess
        |      FROM (SELECT lang,
        |              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                  t -> t IN ('der','die','und'))) AS v_de,
        |              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                  t -> t IN ('the','and','of'))) AS v_en,
        |              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                  t -> t IN ('el','la','de'))) AS v_es,
        |              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                  t -> t IN ('le','la','et'))) AS v_fr,
        |              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                  t -> t IN ('de','shi','le'))) AS v_zh
        |            FROM documents WHERE text IS NOT NULL))
        |GROUP BY lang, guess ORDER BY lang, guess""".stripMargin,
    "q45_fingerprint" ->
      """SELECT substr(md5(trim(text)), 1, 1) AS bucket,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q237_token_entropy" ->
      """WITH cnt AS (
        |  SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, lang,
        |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |        FROM documents
        |        WHERE text IS NOT NULL AND doc_id IS NOT NULL)
        |  GROUP BY doc_id, lang, tok),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
        |      FROM cnt GROUP BY doc_id),
        |h AS (
        |  SELECT cnt.doc_id, cnt.lang, max(n.n) AS n,
        |    CAST(sum(cnt.c * CAST(round(round(
        |        log2(n.n::DOUBLE) - log2(cnt.c::DOUBLE), 6) * 1000000)
        |      AS BIGINT)) AS BIGINT) // max(n.n) AS h_micro
        |  FROM cnt JOIN n ON cnt.doc_id = n.doc_id
        |  GROUP BY cnt.doc_id, cnt.lang),
        |b AS (
        |  SELECT lang, n, h_micro,
        |    CASE WHEN h_micro < 4200000 THEN 'low'
        |         WHEN h_micro < 4600000 THEN 'mid'
        |         ELSE 'high' END AS band
        |  FROM h)
        |SELECT lang, band, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  min(h_micro) AS min_h, max(h_micro) AS max_h
        |FROM b GROUP BY lang, band ORDER BY lang, band""".stripMargin,
    "q238_exposed_evals" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        |              FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, array_to_string(a[i:i+3], ' ') AS s
        |       FROM toks, unnest(range(1, len(a) - 2)) AS t(i)),
        |evg AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 = 0),
        |trs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 <> 0),
        |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seen
        |        FROM evg SEMI JOIN trs USING (s) GROUP BY doc_id),
        |pd AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |         CAST(coalesce(any_value(c.n_seen), 0) AS BIGINT) AS n_seen
        |       FROM evg e LEFT JOIN cov c ON e.doc_id = c.doc_id
        |       GROUP BY e.doc_id),
        |x AS (
        |  SELECT d.doc_id, d.lang, p.n_grams, p.n_seen,
        |    p.n_seen * 1000000 // p.n_grams AS coverage_ppm
        |  FROM documents d JOIN pd p ON d.doc_id = p.doc_id
        |  WHERE d.doc_id % 97 = 0 AND p.n_seen > 0)
        |SELECT rnk, doc_id, lang, n_grams, n_seen, coverage_ppm FROM (
        |  SELECT *, CAST(row_number() OVER (
        |      ORDER BY coverage_ppm DESC, doc_id) AS BIGINT) AS rnk
        |  FROM x) WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    "q231_memorization" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        |              FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, array_to_string(a[i:i+7], ' ') AS s
        |       FROM toks, unnest(range(1, len(a) - 6)) AS t(i)),
        |evg AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 = 0),
        |trs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 <> 0),
        |cov AS (SELECT doc_id, count(*) AS n_seen
        |        FROM evg SEMI JOIN trs USING (s) GROUP BY doc_id),
        |pd AS (SELECT e.doc_id, count(*) AS n_grams,
        |         coalesce(any_value(c.n_seen), 0) AS n_seen
        |       FROM evg e LEFT JOIN cov c ON e.doc_id = c.doc_id
        |       GROUP BY e.doc_id)
        |SELECT d.lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN coalesce(p.n_seen, 0) > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_exposed,
        |  CAST(sum(coalesce(p.n_grams, 0)) AS BIGINT) AS total_grams,
        |  CAST(sum(coalesce(p.n_seen, 0)) AS BIGINT) AS covered_grams,
        |  CASE WHEN sum(coalesce(p.n_grams, 0)) > 0
        |    THEN CAST(sum(coalesce(p.n_seen, 0)) AS BIGINT) * 1000000
        |         // CAST(sum(coalesce(p.n_grams, 0)) AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS coverage_ppm
        |FROM documents d LEFT JOIN pd p ON d.doc_id = p.doc_id
        |WHERE d.text IS NOT NULL AND d.doc_id % 97 = 0
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q89_decontaminate" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        |              FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, array_to_string(a[i:i+4], ' ') AS s
        |       FROM toks, unnest(range(1, len(a) - 3)) AS t(i)),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
        |ov AS (SELECT doc_id, count(*) AS n_ov FROM tr JOIN ev USING (s) GROUP BY doc_id)
        |SELECT d.lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN coalesce(o.n_ov, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contaminated,
        |  CAST(sum(coalesce(o.n_ov, 0)) AS BIGINT) AS total_overlap
        |FROM documents d LEFT JOIN ov o ON d.doc_id = o.doc_id
        |WHERE d.text IS NOT NULL AND d.doc_id % 97 <> 0
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q90_tfidf" ->
      """WITH tf AS (
        |  SELECT lang, tok, count(*) AS tf, count(DISTINCT doc_id) AS df
        |  FROM (SELECT lang, doc_id,
        |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |        FROM documents WHERE text IS NOT NULL)
        |  GROUP BY lang, tok)
        |SELECT lang, rank, term, tf, df, score FROM (
        |  SELECT lang, tok AS term, CAST(tf AS BIGINT) AS tf,
        |    CAST(df AS BIGINT) AS df,
        |    CAST((tf * 1000000) // (df + 1) AS BIGINT) AS score,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (tf * 1000000) // (df + 1) DESC, tok) AS rank
        |  FROM tf)
        |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
    "q93_stratified_mix" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM (SELECT lang, n_chars,
        |        ('0x' || substr(md5('mix:' || doc_id), 1, 8))::BIGINT % 100
        |          < (CASE WHEN lang = 'en' THEN 40 ELSE 100 END) AS kept
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q94_sequence_pack" ->
      """WITH p AS (SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id, toks,
        |    sum(toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS rt
        |  FROM p)
        |SELECT CAST((rt - toks) // 4096 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM r GROUP BY 1 ORDER BY bin""".stripMargin,
    "q96_ngram_hotspots" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        |              FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, array_to_string(a[i:i+7], ' ') AS s
        |       FROM toks, unnest(range(1, len(a) - 6)) AS t(i))
        |SELECT s AS gram, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY n_occurrences DESC, gram LIMIT 10""".stripMargin
  )
}
