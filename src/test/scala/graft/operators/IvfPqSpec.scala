package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** IVF-PQ — the composition production ANN systems actually deploy
  * (FAISS `IVFx,PQy`): a coarse lloyd quantizer routes each vector to a
  * cell, PQ encodes the RESIDUAL (vector − cell centroid; residuals
  * concentrate near zero, so the same code budget quantizes them
  * tighter than raw vectors), and a query probes only its nearest
  * cells, ADC-scoring each cell's members with a per-cell residual
  * lookup table before an exact rerank of the merged shortlist. At
  * 100 TB: the encoded table is 8× smaller than raw and only
  * probes/cells of it is touched per query — both the memory and the
  * compute path of the full-corpus scan are gone. Composes
  * [[KMeans.lloyd]] + [[ProductQuantizer]] unchanged; everything is
  * deterministic, so the measured recall pins as a regression gate. */
class IvfPqSpec extends SparkSpec {

  private val Dim = 64
  private val Cells = 8
  private val Probes = 3
  private val M = 8
  private val Ks = 16
  private val TopK = 10
  private val NQ = 8

  test("IVF-PQ probe-3 search with exact rerank recovers brute-force neighbors") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir)
      .select($"vec_id", $"embedding").localCheckpoint()
    val assign = KMeans.lloyd(e, "vec_id", "embedding", k = Cells, iters = 3)
    // trained centroids from the final assignment (the IvfRecallSpec shape)
    val centMap: Map[Long, Array[Float]] = e.join(assign, Seq("vec_id"))
      .select($"cluster", posexplode($"embedding"))
      .groupBy($"cluster", $"pos").agg(avg($"col".cast("double")).as("m"))
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.sortBy(_._2).map(_._3.toFloat).toArray }

    val bcCent = s.sparkContext.broadcast(centMap)
    val resid = e.join(assign, Seq("vec_id"))
      .as[(Long, Array[Float], Long)]
      .map { case (id, v, c) =>
        val ct = bcCent.value(c)
        (id, c, Array.tabulate(v.length)(i => v(i) - ct(i)))
      }
      .toDF("vec_id", "cluster", "residual")
      .localCheckpoint()

    val pq = ProductQuantizer.train(resid, "vec_id", "residual", Dim, M, Ks, iters = 2)
    val enc = ProductQuantizer.encode(resid, "vec_id", "residual", pq)
      .join(resid.select($"vec_id", $"cluster"), Seq("vec_id"))
      .localCheckpoint()

    val corpus = e.as[(Long, Array[Float])].collect()
    val queries = corpus.filter(_._1 < NQ)
    var hit = 0; var tot = 0
    queries.sortBy(_._1).foreach { case (_, qv) =>
      val cells = centMap.toSeq
        .map { case (c, ct) =>
          (c, ct.zip(qv).map { case (a, b) => val d = a.toDouble - b; d * d }.sum) }
        .sortBy { case (c, d) => (d, c) }.take(Probes).map(_._1)
      val cand = cells.flatMap { c =>
        val ct = centMap(c)
        val qResid = Array.tabulate(qv.length)(i => qv(i) - ct(i))
        ProductQuantizer
          .search(enc.where($"cluster" === c), "vec_id", qResid, pq, k = 30)
          .select($"vec_id").as[Long].collect()
      }.toSet
      // exact rerank of the merged shortlist, driver-side (tiny)
      val got = corpus.filter(p => cand.contains(p._1))
        .map { case (id, v) =>
          (id, v.zip(qv).map { case (a, b) => val d = a.toDouble - b; d * d }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(TopK).map(_._1).toSet
      val truth = corpus
        .map { case (id, v) =>
          (id, v.zip(qv).map { case (a, b) => val d = a.toDouble - b; d * d }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(TopK).map(_._1).toSet
      hit += got.intersect(truth).size; tot += TopK
    }
    val recall = hit.toDouble / tot
    info(f"IVF-PQ probe-$Probes + rerank recall@$TopK = $recall%.3f")
    // measured 0.65 at probe-3 (probe-2: 0.525 — cell coverage is the cap,
    // exactly like IvfRecallSpec's trained-IVF gate); re-measure before loosening
    assert(recall >= 0.60, f"IVF-PQ recall regressed: $recall%.3f")
  }
}
