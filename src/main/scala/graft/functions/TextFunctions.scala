package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline layer
  * (SURVEY §7.4 H-8: language-ID, quality scoring, token counting, document
  * fingerprinting). No UDFs anywhere. Whole-document scalars (tokenCount,
  * meanTokenLen, fingerprint) are codegen'd row expressions; the per-token
  * statistics (BPE estimate, stopword counts) are provided as PER-TOKEN
  * helpers for the explode + grouped-agg formulation — Spark's array
  * higher-order functions (transform/filter/aggregate) are CodegenFallback
  * and re-evaluated per enclosing aggregate, 40-80× slower (CLAUDE.md),
  * so no function here builds on them.
  *
  * Tokenization contract (shared with every dedup/similarity operator and
  * with the DuckDB oracles): trim the text, split on runs of whitespace.
  * CAVEAT (mirrored EXACTLY by every oracle, so cross-engine parity
  * always holds): Spark's trim() strips only spaces, so text padded with
  * tabs/newlines yields a trailing "" token, and empty text yields one
  * "" token. Inputs are expected whitespace-normalized upstream; a
  * filter-empty-token variant must change every oracle mirror in the
  * same commit.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count (whitespace; the BPE-ish sub-token estimate is
    * `n_tok + sum([[bpeExtraTokens]])` over exploded tokens). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Extra BPE-ish sub-tokens contributed by ONE token: one more token per
    * 6 characters of long words (approximates sub-word splits without a
    * vocabulary). Apply to an exploded token column and `sum` per doc —
    * the codegen'd replacement for an interpreted aggregate(transform(...)). */
  def bpeExtraTokens(tok: Column): Column =
    greatest(ceil(length(tok) / 6.0).cast("long") - 1L, lit(0L))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column =
    round(length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      tokenCount(text), 4)

  /** English stopword ratio — the lexical-quality signal used by C4/Gopher
    * style filters. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are",
    "was", "for", "on", "with", "as", "by", "at", "from", "that", "this")

  /** Is ONE (exploded) token an English stopword? `sum(isStopword.cast(long))`
    * per doc replaces the interpreted size(filter(toks, ...)) form. */
  def isStopword(tok: Column): Column = tok.isin(stopwords: _*)

  /** Stopword ratio from precomputed per-doc counts, rounded like the
    * oracles: `round(n_stop / n_tok, 4)`. */
  def stopwordRatioOf(nStop: Column, nTok: Column): Column =
    round(nStop.cast("double") / nTok, 4)

  /** Composite quality score in [0,1] from precomputed per-doc statistics:
    * length band + stopword band + mean word length band. Inputs are the
    * ALREADY-ROUNDED ratio/mean (round 4), matching the oracle exactly.
    * Deterministic arithmetic only, oracle-expressible. */
  def qualityScoreOf(nTok: Column, stopRatio: Column, meanLen: Column): Column = {
    val lenScore = when(nTok.between(10, 1000), 0.4).otherwise(0.1)
    val stopScore = when(stopRatio > 0.05, 0.3).otherwise(0.0)
    val wordScore = when(meanLen.between(3.0, 10.0), 0.3).otherwise(0.1)
    round(lenScore + stopScore + wordScore, 1)
  }

  /** Heuristic language ID by marker-token voting. Markers are ASCII
    * function words per language (the fixture corpus is synthetic ASCII, so
    * character n-grams carry no signal; marker voting is the deterministic
    * n-gram-family heuristic both engines can evaluate). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "la", "et"),
    "de" -> Seq("der", "die", "und"),
    "zh" -> Seq("de", "shi", "le"))

  /** Deterministic document fingerprint: md5 of the trimmed text (content
    * addressing for exact dedup; same value computable by any engine). */
  def fingerprint(text: Column): Column = md5(trim(text).cast("binary"))

}
