package graft.queries

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

  val queries: Map[String, Q] = Map(
    "q76_repetition" -> q76,
    "q42_token_count" -> q42,
    "q43_quality_score" -> q43,
    "q44_lang_id" -> q44,
    "q45_fingerprint" -> q45
  )

  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  val oracle: Map[String, String] = Map(
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
        |                THEN 0.3 ELSE 0.1 END), 1) AS score,
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
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
