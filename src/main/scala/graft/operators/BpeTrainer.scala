package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * tokenizer-training step of a training-data pipeline, which the q42
  * token census and q94 packing presuppose but nothing yet produced.
  *
  * Scale design: classic BPE counts symbol pairs WEIGHTED BY WORD
  * FREQUENCY, so training runs entirely on the word HISTOGRAM
  * (`groupBy(word).count()` — O(distinct words), a tiny fraction of
  * corpus size; ScaleProbe measures it flat under 10× corpus
  * replication). Each merge round is one flatMap over the histogram
  * (adjacent symbol pairs), one grouped sum, and one TakeOrdered
  * top-1 driver action (the k-means loop shape — never a global
  * window); the merged histogram is localCheckpoint'ed per round so
  * lineage stays flat. Ties break deterministically on
  * (count desc, left asc, right asc), so the learned merge sequence is
  * reproducible across runs and cluster layouts.
  *
  * The reference has no tokenizer training (its text work stops at
  * delimited-log parsing); this is a beyond-reference H-8 operator like
  * the dedup family. No SQL oracle is practical (iterative, like
  * [[KMeans.lloyd]]) — BpeTrainerSpec instead proves the merge sequence
  * equal to a local reference implementation and pins the invariants
  * (monotone token shrinkage, round-trip concatenation). */
object BpeTrainer {

  /** One histogram row: a word as its current symbol sequence + count. */
  final case class WordSyms(syms: Seq[String], n: Long)

  /** Learn up to `nMerges` merges; returns them in application order.
    * Stops early when no pair occurs at least `minCount` times. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1 (got $nMerges)")
    val spark = docs.sparkSession
    import spark.implicits._
    var hist: Dataset[WordSyms] = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .where(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => WordSyms(w.map(_.toString), n) }
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.size < nMerges) {
      val top = hist
        .flatMap(ws => ws.syms.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1), ws.n)))
        .toDF("a", "b", "n")
        .groupBy($"a", $"b").agg(sum($"n").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b")
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption.filter(_._3 >= minCount) match {
        case None => done = true
        case Some((a, b, _)) =>
          merges += ((a, b))
          hist = hist
            .map(ws => WordSyms(applyMerge(ws.syms, a, b), ws.n))
            .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Left-to-right greedy application of one merge (standard BPE rule:
    * after "aa"+"a" on "aaaa" the result is ["aa","aa"], not 3 overlaps). */
  private[operators] def applyMerge(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode every document with a learned merge list: (original columns
    * +) `n_bpe_tokens`. The merges broadcast as a plain list; encoding is
    * a narrow typed map — no shuffle, embarrassingly parallel. */
  def countTokens(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.trim.split("\\s+").iterator.filter(_.nonEmpty).map { w =>
          bc.value.foldLeft(w.map(_.toString): Seq[String]) {
            case (syms, (a, b)) => applyMerge(syms, a, b)
          }.size.toLong
        }.sum
        (id, toks)
      }
      .toDF(idCol, "n_bpe_tokens")
  }
}
