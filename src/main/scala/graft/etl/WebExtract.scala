package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-page text EXTRACTION — the stage every web-scale corpus pipeline
  * runs FIRST (CCNet/RefinedWeb/Dolma all begin at raw HTML; the
  * reference's parser family P1–P4 starts at log lines, this is the
  * web-corpus analog): strip a well-formed HTML payload down to its
  * visible text with chained NATIVE string expressions, so the whole
  * extraction runs inside whole-stage codegen on the scan — no UDF, no
  * shuffle, linear over the corpus.
  *
  * Order matters and is part of the contract:
  *  1. `<script>`/`<style>` BLOCKS go first (their bodies legally
  *     contain bare `<` — `if (1 < 2)` — which would corrupt a naive
  *     tag-strip), then comments, then every remaining tag → a space;
  *  2. entities decode AFTER tag-stripping (else `&lt;b&gt;` would
  *     fabricate a strippable tag) with `&amp;` LAST (else `&amp;lt;`
  *     double-decodes);
  *  3. whitespace collapses to single spaces and trims.
  *
  * Honest-tier note: regex extraction assumes well-formed markup — a
  * literal `>` inside an attribute value truncates that tag's strip.
  * Production web extraction (trafilatura/jsoup class, not available
  * offline in this env) is a real parser in a narrow `mapPartitions`
  * with the SAME pipeline shape either way: extraction is a per-row
  * map on the ingest scan, and everything downstream (language ID,
  * quality, dedup) consumes its output unchanged. */
object WebExtract {

  /** (pattern → replacement) regex passes, in contract order. Shared
    * with the oracle generator so both engines run the same patterns
    * (Java and RE2 agree on this subset: inline `(?is)`, lazy `.*?`,
    * ASCII `\s`). */
  val tagPasses: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]+>" -> " ")

  /** Entity decodes, in contract order (`&amp;` last). */
  val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible text of `html` as one codegen'd column expression. */
  def extractText(html: Column): Column = {
    val stripped = tagPasses.foldLeft(html) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    val decoded = entities.foldLeft(stripped) { case (c, (e, ch)) =>
      call_function("replace", c, lit(e), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The SAME extraction as DuckDB SQL text over an expression string
    * (DuckDB needs the explicit 'g' option — its regexp_replace is
    * first-match-only by default, where Spark's is global). */
  def extractSqlDuck(inner: String): String = {
    val stripped = tagPasses.foldLeft(inner) { case (c, (pat, rep)) =>
      s"regexp_replace($c, '$pat', '$rep', 'g')"
    }
    val decoded = entities.foldLeft(stripped) { case (c, (e, ch)) =>
      val lit = ch match {
        case "'" => "''"
        case x => x
      }
      s"replace($c, '$e', '$lit')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}
