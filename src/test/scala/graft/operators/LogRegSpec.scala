package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer hashed logistic trainer: convergence on a separable
  * fixture, determinism, the class-balance weights, the lattice clamp,
  * and the end-to-end plug into CorpusPipeline.qualityFilterTrained —
  * the loop every "production swaps in learned weights" scaladoc
  * promised. */
class LogRegSpec extends SparkSpec {

  private val DIMS = 256

  /** 40 docs over a shared vocabulary; positives carry the marker token
    * 'needle' (rare-positive, the FineWeb-Edu regime). */
  private def fixture = {
    val s = spark
    import s.implicits._
    val common = Seq("alpha", "beta", "gamma", "delta", "eps")
    (0 until 40).map { i =>
      val base = (0 until 6).map(j => common((i + j) % common.size))
      val words = if (i % 8 == 0) base :+ "needle" else base
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def toksOf(docs: DataFrame) = {
    val s = spark
    import s.implicits._
    docs.select($"doc_id", explode(split(trim($"text"), "\\s+")).as("tok"))
  }

  private def labelsOf(docs: DataFrame) = {
    val s = spark
    import s.implicits._
    docs.select($"doc_id",
      array_contains(split(trim($"text"), "\\s+"), "needle")
        .cast("long").as("y"))
  }

  private def trained(docs: DataFrame): DataFrame = {
    val feats = LogReg.features(toksOf(docs), "doc_id", "tok", DIMS,
      binary = true)
    val labels = LogReg.balancedLabels(labelsOf(docs), "doc_id")
    LogReg.train(feats, labels, "doc_id", iters = 8, etaLog2 = 2,
      decay = true, weightCol = Some("wt"))
  }

  test("separable rare-positive fixture trains to 100% accuracy") {
    val s = spark
    import s.implicits._
    val docs = fixture
    val w = trained(docs)
    val feats = LogReg.features(toksOf(docs), "doc_id", "tok", DIMS,
      binary = true)
    val preds = LogReg.score(feats, w, "doc_id")
      .join(labelsOf(docs), Seq("doc_id"))
    val wrong = preds.where(($"logit_w" >= 0L) =!= ($"y" === 1L)).count()
    assert(wrong == 0L, s"classifier must separate the fixture ($wrong wrong)")
  }

  test("training is deterministic: two runs yield identical weight sets") {
    val s = spark
    import s.implicits._
    val docs = fixture
    val w1 = trained(docs).as[(Long, Long)].collect().toSet
    val w2 = trained(docs).as[(Long, Long)].collect().toSet
    assert(w1 == w2)
    assert(w1.nonEmpty)
  }

  test("weights stay on the clamped lattice and the frame stays sparse") {
    val s = spark
    import s.implicits._
    val w = trained(fixture)
    val wmax = 1L << LogReg.WMaxLog2
    assert(w.where(abs($"w") > wmax || $"w" === 0L).isEmpty,
      "every stored weight is nonzero and |w| <= 2^WMaxLog2")
  }

  test("balancedLabels: integer class weights equalize residual mass") {
    val s = spark
    import s.implicits._
    val labels = labelsOf(fixture)
    val wts = LogReg.balancedLabels(labels, "doc_id")
      .select($"y", $"wt").distinct().as[(Long, Long)].collect().toMap
    // 40 docs, 5 positive: wt_1 = 320 DIV 10 = 32, wt_0 = 320 DIV 70 = 4
    assert(wts == Map(1L -> 32L, 0L -> 4L))
  }

  test("qualityFilterTrained keeps exactly the teacher-positive docs") {
    val s = spark
    import s.implicits._
    val docs = fixture
    val w = trained(docs)
    val kept = CorpusPipeline
      .qualityFilterTrained(docs, w, dims = DIMS, minLogitW = 0L,
        binary = true)
      .select($"doc_id").as[Long].collect().toSet
    val teacher = labelsOf(docs).where($"y" === 1L)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == teacher)
  }

  test("single-class labels train without error and predict that class") {
    val s = spark
    import s.implicits._
    val docs = fixture.where($"doc_id" % 8 =!= 0) // negatives only
    val feats = LogReg.features(toksOf(docs), "doc_id", "tok", DIMS,
      binary = true)
    val labels = LogReg.balancedLabels(labelsOf(docs), "doc_id")
    val w = LogReg.train(feats, labels, "doc_id", iters = 3, etaLog2 = 2,
      decay = true, weightCol = Some("wt"))
    val preds = LogReg.score(feats, w, "doc_id")
    assert(preds.where($"logit_w" >= 0L).isEmpty,
      "an all-negative teacher yields an all-negative student")
  }
}
