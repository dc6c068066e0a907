package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE vocabulary ARTIFACT (VERDICT r9 #3):
  * train→save→load→encode identity — the loaded model tokenizes every
  * word exactly as the in-memory one — plus loud failure on a torn or
  * rank-gapped artifact, and idempotent re-publish. */
class BpeVocabSpec extends SparkSpec {

  private def dir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_bpe_vocab_$tag").toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  test("train -> save -> load -> encode identity on a trained vocabulary") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      "the data the data spark spark row group",
      "query order sort stream fast vector the data",
      "part spark row order query the the data")
      .toDF("text")
    val trained = BpeTrainer.trainBatched(corpus, "text", 24, minCount = 2L)
    assert(trained.nonEmpty)
    val d = dir("ident")
    BpeTrainer.save(s, trained, d)
    val loaded = BpeTrainer.load(s, d)
    assert(loaded == trained, "merge list must round-trip in order")
    // encode identity over every distinct corpus word + adversarials
    val words = corpus.as[String].collect()
      .flatMap(_.split("\\s+")).distinct.toSeq ++
      Seq("thedata", "sparkrow", "q", "zz", "")
    val rt = BpeTrainer.ranksOf(trained)
    val rl = BpeTrainer.ranksOf(loaded)
    words.foreach { w =>
      assert(BpeTrainer.encodeWord(w, rl) == BpeTrainer.encodeWord(w, rt),
        s"loaded model must tokenize '$w' identically")
    }
    // re-publish converges (same artifact content, loadable)
    BpeTrainer.save(s, trained, d)
    assert(BpeTrainer.load(s, d) == trained)
  }

  test("a torn artifact fails loud: meta/merge count mismatch and " +
    "non-contiguous ranks are both rejected") {
    val s = spark; import s.implicits._
    val d = dir("torn")
    BpeTrainer.save(s, Seq("a" -> "b", "ab" -> "c"), d)
    // drop a merge row behind meta's back
    val kept = s.read.parquet(s"$d/merges").where(col("rank") === 0L)
    kept.write.mode("overwrite").parquet(s"$d/merges2")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$d/merges"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$d/merges2"),
      new org.apache.hadoop.fs.Path(s"$d/merges"))
    val e = intercept[IllegalArgumentException] { BpeTrainer.load(s, d) }
    assert(e.getMessage.contains("corrupt bpe vocabulary"))
    // rank gap (0, 2) with matching count: still rejected
    val d2 = dir("gap")
    BpeTrainer.save(s, Seq("a" -> "b", "ab" -> "c"), d2)
    Seq((0L, "a", "b"), (2L, "ab", "c")).toDF("rank", "lhs", "rhs")
      .write.mode("overwrite").parquet(s"$d2/merges_g")
    val fs2 = new org.apache.hadoop.fs.Path(d2)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs2.delete(new org.apache.hadoop.fs.Path(s"$d2/merges"), true)
    fs2.rename(new org.apache.hadoop.fs.Path(s"$d2/merges_g"),
      new org.apache.hadoop.fs.Path(s"$d2/merges"))
    val e2 = intercept[IllegalArgumentException] { BpeTrainer.load(s, d2) }
    assert(e2.getMessage.contains("corrupt bpe vocabulary"))
  }

  test("q259 lineage: the loaded committed vocabulary equals the " +
    "literal, and the curve prefix at full size equals countTokens") {
    val s = spark; import s.implicits._
    val d = dir("committed")
    val pm = graft.queries.CorpusOpsQueries.packMerges
    BpeTrainer.save(s, pm, d)
    assert(BpeTrainer.load(s, d) == pm)
    val docs = Seq((1L, "the data is fast"), (2L, "spark query order"))
      .toDF("doc_id", "text")
    val full = BpeTrainer.countTokens(docs, "doc_id", "text", pm)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val curve = BpeTrainer
      .countTokensCurve(docs, "doc_id", "text", BpeTrainer.load(s, d),
        Seq(pm.size))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(curve == full,
      "full-prefix curve under the loaded model == direct count")
  }
}
