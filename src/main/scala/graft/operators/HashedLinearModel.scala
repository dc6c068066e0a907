package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear text-classifier INFERENCE at corpus scale — the
  * model-based quality-filtering stage modern pipelines run over every
  * document (FineWeb-Edu's educational scorer, DCLM's fastText filter;
  * the hashing-trick linear form of Weinberger et al. ICML'09): each
  * token hashes into one of `dims` buckets, the document's logit is the
  * sum of its tokens' bucket weights plus a bias, and keep/drop is a
  * threshold on the logit (sigmoid is monotone, so thresholding the
  * logit IS thresholding the probability — the sigmoid itself is never
  * evaluated, which also keeps the pipeline free of cross-engine
  * `exp` differences).
  *
  * Weights here are INTEGER SIXTEENTHS in [-8, 8] derived from the
  * bucket id by the repo's md5 idiom — so a document's logit is an
  * EXACT integer (in 1/16 units) accumulated in any order (the
  * integer-units float contract, and why q203 hash-matches an oracle),
  * and the weight "table" is a pure function both engines compute
  * inline: nothing is broadcast, nothing is joined. A production model
  * swaps [[weight16]] for a learned weight lookup (a broadcast of
  * `dims` integers — KBs at fastText's 2M buckets); every other part
  * of the plan is unchanged.
  *
  * Scale shape: ONE tokenizing scan; per-token work is two md5s and an
  * integer add; the per-doc logit is a map-side-combinable hash agg on
  * the doc key. At 100 TB this is the cheapest possible shape for
  * running a linear model over every document — the same scan the
  * datacard (q180) rides.
  */
object HashedLinearModel {

  /** Token → bucket in [0, dims): md5 hex prefix mod dims. */
  def bucket(tok: Column, dims: Int, salt: String = "hlm"): Column =
    conv(substring(md5(concat(lit(s"$salt:"), tok).cast("binary")), 1, 8),
      16, 10).cast("long") % dims

  /** Bucket → weight in integer sixteenths, k ∈ [-8, 8]: a deterministic
    * md5-derived stand-in for learned weights, engine-replicable. */
  def weight16(b: Column, salt: String = "hlmw"): Column =
    (conv(substring(md5(concat(lit(s"$salt:"), b.cast("string"))
      .cast("binary")), 1, 2), 16, 10).cast("long") % 17) - 8

  /** DuckDB mirrors for oracle construction. */
  def duckBucket(tokExpr: String, dims: Int, salt: String = "hlm"): String =
    s"(('0x' || substr(md5('$salt:' || $tokExpr), 1, 8))::BIGINT % $dims)"
  def duckWeight16(bExpr: String, salt: String = "hlmw"): String =
    s"((('0x' || substr(md5('$salt:' || CAST($bExpr AS VARCHAR)), 1, 2))::BIGINT % 17) - 8)"

  /** Per-document logit in integer sixteenths: (docCols..., n_tok,
    * logit16) where logit16 = bias16 + Σ weight16(bucket(token)).
    * `toks` carries one row per (doc, token). Distinct salts = distinct
    * models over the same feature space (the two-model learnability
    * pairing q207 runs). */
  def logits(toks: DataFrame, docCols: Seq[String], tokCol: String,
      dims: Int, bias16: Long = 0L, bucketSalt: String = "hlm",
      weightSalt: String = "hlmw"): DataFrame =
    toks
      .select(docCols.map(col) :+
        weight16(bucket(col(tokCol), dims, bucketSalt), weightSalt)
          .as("__w16"): _*)
      .groupBy(docCols.map(col): _*)
      .agg(count(lit(1)).as("n_tok"),
        (sum(col("__w16")) + lit(bias16)).as("logit16"))
}
