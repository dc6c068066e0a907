package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / identifier detection and redaction — the privacy pass every
  * production corpus pipeline runs before training (the reference's
  * pipeline has no public-web privacy stage, so this follows the shape
  * of the published ones: typed regex detectors + placeholder
  * substitution, e.g. Dolma / FineWeb / RedPajama).
  *
  * Every pattern is written in the Java-regex ∩ RE2 common subset
  * (no lookaround, no backreferences, ASCII `\d`/`\b`) so the Spark
  * side and the DuckDB oracle compile the SAME detector text — the
  * cross-engine contract the whole oracle surface rests on.
  *
  * Detection counts each pattern independently on the ORIGINAL text
  * (an email's digits also count as an id-number hit — detection is a
  * census, not a partition); redaction is SEQUENTIAL in declaration
  * order, most-specific first, so the broad digit-run pattern never
  * eats inside an already-typed match. Placeholders contain no
  * digits, dots or `@`, so [[scrub]] is idempotent by construction.
  *
  * Scale shape: both detection and redaction are codegen'd row
  * expressions riding whatever scan already reads the column — zero
  * shuffles, zero UDFs; the census downstream is one grouped agg per
  * surface. At 100 TB this is the cheapest stage in the pipeline.
  */
object PiiScrub {

  /** (detector name, pattern, placeholder), redaction order. */
  val detectors: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b", "<PHONE>"),
    ("id_number", "\\d{6,}", "<ID>"))

  /** Non-overlapping match count of one detector (0 for NULL text). */
  def hitCount(text: Column, pattern: String): Column =
    coalesce(size(regexp_extract_all(text, lit(pattern), lit(0))), lit(0))
      .cast("long")

  /** Redact ONE detector's matches with its placeholder. */
  def scrubOne(text: Column, pattern: String, placeholder: String): Column =
    regexp_replace(text, pattern, placeholder)

  /** Full sequential redaction, declaration order (see scaladoc). */
  def scrub(text: Column): Column =
    detectors.foldLeft(text) { case (c, (_, p, ph)) => scrubOne(c, p, ph) }
}
