package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Closes the PQ loop end-to-end: train m sub-codebooks on the fixture
  * embeddings ([[KMeans.lloydCentroids]] per subspace), encode the
  * corpus to m small codes, ADC-search a set of queries, and measure
  * recall@10 against exact brute-force L2. Deterministic end-to-end
  * (lloyd seeding/ties, strict-< code ties, vec_id tie-breaks), so the
  * measured recall is a constant of the fixture and the assert pins it
  * as a regression gate. Also pins the compression contract (m codes
  * per vector, codes < ks) and encode determinism across partitionings. */
class PqRecallSpec extends SparkSpec {

  private val Dim = 64
  private val M = 8
  private val Ks = 16
  private val TopK = 10
  private val NQ = 10

  test("trained PQ-ADC search recovers brute-force L2 neighbors on the fixture") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir)
      .select($"vec_id", $"embedding").localCheckpoint()
    val model = ProductQuantizer.train(e, "vec_id", "embedding", Dim, M, Ks, iters = 3)
    assert(model.codebooks.size == M)
    assert(model.codebooks.forall(_.size == Ks))
    assert(model.subDim == Dim / M)

    val enc = ProductQuantizer.encode(e, "vec_id", "embedding", model)
      .localCheckpoint()
    val sizes = enc.select(size($"codes")).as[Int].distinct().collect().toSeq
    assert(sizes == Seq(M), s"every vector must carry exactly $M codes: $sizes")
    assert(enc.select(array_max($"codes")).as[Int].collect().max < Ks)

    val queries = e.filter($"vec_id" < NQ)
      .as[(Long, Array[Float])].collect().toMap
    val corpus = e.as[(Long, Array[Float])].collect()
    var adcHit = 0; var rrHit = 0; var tot = 0
    queries.toSeq.sortBy(_._1).foreach { case (_, qv) =>
      val adc = ProductQuantizer.search(enc, "vec_id", qv, model, TopK)
        .select($"vec_id").as[Long].collect().toSet
      val rr = ProductQuantizer
        .searchRerank(enc, e, "vec_id", "embedding", qv, model, TopK, shortlist = 50)
        .select($"vec_id").as[Long].collect().toSet
      // exact L2 brute force, ulp-stable on integer-ish fixture floats
      val truth = corpus
        .map { case (id, v) =>
          (id, v.zip(qv).map { case (a, b) => val d = a.toDouble - b; d * d }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(TopK).map(_._1).toSet
      adcHit += adc.intersect(truth).size
      rrHit += rr.intersect(truth).size
      tot += TopK
    }
    val adcRecall = adcHit.toDouble / tot
    val rrRecall = rrHit.toDouble / tot
    info(f"ADC-only recall@$TopK = $adcRecall%.3f; rerank(50) recall = $rrRecall%.3f")
    // the fixture's clusters are tight relative to (m=8, ks=16)
    // quantization error, so raw ADC misorders neighbors (measured 0.34)
    // — exactly why the production pipeline reranks an ADC shortlist
    // with exact distances on the 10% it kept (measured 0.76). Re-measure before
    // loosening either pin.
    assert(adcRecall >= 0.25, f"ADC shortlist quality collapsed: $adcRecall%.3f")
    assert(rrRecall >= 0.70, f"PQ+rerank recall@$TopK regressed: $rrRecall%.3f")
  }

  test("encoding is deterministic and partitioning-independent") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir).select($"vec_id", $"embedding")
    val model = ProductQuantizer.train(e, "vec_id", "embedding", Dim, M, Ks, iters = 2)
    val a = ProductQuantizer.encode(e.repartition(1), "vec_id", "embedding", model)
      .orderBy($"vec_id").as[(Long, Seq[Int])].collect().toSeq
    val b = ProductQuantizer.encode(e.repartition(7), "vec_id", "embedding", model)
      .orderBy($"vec_id").as[(Long, Seq[Int])].collect().toSeq
    assert(a == b)
  }
}
