package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{isStopword, tokens}

/** Fused per-source corpus datacard (Gebru et al., "Datasheets for
  * Datasets") — the publishable summary a corpus build ends with:
  * doc/char/token mass, language spread, null-text count, Gopher-style
  * repetition census, stopword ratio, mean word length.
  *
  * Fusion is the design point: at 100 TB the cost of corpus statistics
  * is READING THE TEXT, so K separate signal jobs cost K scans while
  * this plan feeds every signal from one explode + two-level aggregate
  * (plan-asserted single FileScan in PlanAssertSpec via q180, which is
  * this operator applied to the raw table). [[CorpusPipeline.datacard]]
  * publishes the same card over a curated corpus.
  *
  * Ratio determinism (oracle contract): per-doc ratios are rounded to
  * fixed decimals, summed as exact integers, divided once.
  *
  * Input contract: `idCol` is assumed NON-NULL and UNIQUE within a
  * source (the corpus primary key — every upstream `Tables.documents`
  * consumer shares it). Rows sharing a doc_id would collapse into one
  * per-doc row here while a strictly per-row consumer counts them
  * separately; run dedup/id-repair first if the corpus can't promise
  * it. `n_null_text` counts docs with NO TOKENS — NULL, empty, or
  * whitespace-only text all land in it (it is an "empty text" census,
  * not a SQL-NULL census). */
object Datacard {

  def of(docs: DataFrame, sourceCol: String = "source",
      langCol: String = "lang", idCol: String = "doc_id",
      charsCol: String = "n_chars", textCol: String = "text"): DataFrame = {
    val perDoc = docs
      .select(col(sourceCol).as("source"), col(langCol).as("lang"),
        col(idCol).as("doc_id"), col(charsCol).as("n_chars"),
        explode_outer(when(col(textCol).isNotNull, tokens(col(textCol))))
          .as("tok"))
      .groupBy(col("source"), col("doc_id"))
      .agg(
        max(col("lang")).as("lang"),
        max(col("n_chars")).as("n_chars"),
        count(col("tok")).as("n_tok"),
        countDistinct(col("tok")).as("n_uniq"),
        sum(isStopword(col("tok")).cast("long")).as("n_stop"),
        sum(length(col("tok")).cast("long")).as("sum_len"))
    perDoc
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("n_tok") === 0L).cast("long")).as("n_null_text"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tok")).as("total_tokens"),
        sum((col("n_tok") > 0L &&
            (col("n_tok") - col("n_uniq")) * 2 >= col("n_tok"))
          .cast("long")).as("n_repetitive"),
        round(sum(when(col("n_tok") > 0,
            round(col("n_stop").cast("double") / col("n_tok") * 10000)
              .cast("long"))
          .otherwise(0L)) /
          (sum((col("n_tok") > 0L).cast("long")) * 10000.0), 4)
          .as("avg_stop_ratio"),
        round(sum(when(col("n_tok") > 0,
            round(col("sum_len").cast("double") / col("n_tok") * 10000)
              .cast("long"))
          .otherwise(0L)) /
          (sum((col("n_tok") > 0L).cast("long")) * 10000.0), 4)
          .as("avg_word_len"))
      .orderBy(col("source"))
  }
}
