package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r13 native BPE expressions ([[graft.expressions.BpeTable]],
  * `graft_bpe_{tokens,ntokens,curve}`) to the pre-r13 typed-map
  * implementations token-for-token: the dataframe surfaces
  * [[BpeTrainer.tokenize]] / [[BpeTrainer.countTokens]] /
  * [[BpeTrainer.countTokensCurve]] must return row-identical results to
  * [[BpeTrainer.tokenizeTyped]] / `countTokensTyped` /
  * `countTokensCurveTyped` on the committed vocabulary, on random
  * trained lists over random corpora, and on adversarial texts
  * (whitespace framing, control chars, non-vocab unicode, aliasing
  * merges). Also asserts the plan claim: the encode path carries no
  * typed-map boundary (`MapElements` / object ser/de) any more. */
class BpeExprSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def checkAll(docs: DataFrame, merges: Seq[(String, String)],
      sizes: Seq[Int], tag: String): Unit = {
    assert(rows(BpeTrainer.tokenize(docs, "doc_id", "text", merges)) ==
      rows(BpeTrainer.tokenizeTyped(docs, "doc_id", "text", merges)),
      s"$tag: tokenize expression != typed map")
    // countTokensTyped NPEs on null text (pre-r13 behavior); compare on
    // the non-null subset, where the expression must agree exactly
    val nn = docs.where(col("text").isNotNull)
    assert(rows(BpeTrainer.countTokens(nn, "doc_id", "text", merges)) ==
      rows(BpeTrainer.countTokensTyped(nn, "doc_id", "text", merges)),
      s"$tag: countTokens expression != typed map")
    if (merges.nonEmpty)
      assert(rows(BpeTrainer.countTokensCurve(docs, "doc_id", "text", merges, sizes)) ==
        rows(BpeTrainer.countTokensCurveTyped(docs, "doc_id", "text", merges, sizes)),
        s"$tag: countTokensCurve expression != typed map")
  }

  test("expression == typed map on the committed packMerges vocabulary over the fixture corpus") {
    val s = spark
    val docs = graft.core.Tables.documents(s, sfDir)
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val ms = graft.queries.CorpusOpsQueries.packMerges
    checkAll(docs, ms, Seq(0, 6, 12), "fixture corpus")
  }

  test("expression == typed map on random trained lists over random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      val alpha = if (trial % 2 == 0) "ab" else "abc"
      val docs = (1 to 25).map { i =>
        val words = (1 to (1 + rnd.nextInt(8))).map(_ =>
          (1 to (1 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val merges = BpeTrainer.train(docs, "text", nMerges = 8)
      checkAll(docs, merges, Seq(0, merges.size / 2, merges.size), s"trial $trial")
    }
  }

  test("expression == typed map on adversarial texts: framing whitespace, control chars, aliasing merges") {
    val s = spark
    import s.implicits._
    // ms contains an ALIASING pair: ("a","bc") and ("ab","c") both
    // produce "abc" — the int-id interning must keep them string-equal
    val ms = Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c"), ("abc", "abc"))
    val docs = Seq(
      (1L, "abc abcabc aabbcc"),
      (2L, "  \t abc \n\r abcabcabc  "),
      (3L, "abc abc abéc 😀abc"), // control, accented, surrogate pair
      (4L, ""), (5L, "   "), (6L, null.asInstanceOf[String]),
      (7L, "a b c ab bc abc"),
      (8L, "ababab abcabc ccc")).toDF("doc_id", "text")
    checkAll(docs, ms, Seq(0, 2, 5), "adversarial")
    // duplicate pair in the list: first-wins rank semantics
    val dup = Seq(("a", "b"), ("b", "c"), ("a", "b"))
    checkAll(docs, dup, Seq(0, 1, 3), "duplicate pair")
    // empty merge list
    checkAll(docs, Nil, Seq(0), "empty merges")
  }

  test("plan: the countTokens encode path has no typed-map boundary (MapElements/ser-de gone)") {
    val s = spark
    val docs = graft.core.Tables.documents(s, sfDir)
      .where(col("doc_id").isNotNull && col("text").isNotNull)
    val plan = BpeTrainer.countTokens(docs, "doc_id", "text",
      graft.queries.CorpusOpsQueries.packMerges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapElements"), s"typed map survived:\n$plan")
    assert(!plan.contains("DeserializeToObject"), s"object ser/de survived:\n$plan")
    assert(plan.contains("graft_bpe_ntokens"), s"native expression missing:\n$plan")
  }
}
