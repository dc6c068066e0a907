package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions.{dot, l2norm}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Closes the IVF loop end-to-end with TRAINED centroids: q53's oracle
  * query stands in per-label centroids for the coarse quantizer (an
  * iterative float trainer has no practical SQL oracle), and
  * [[KMeans.lloyd]] is spec-proven as a trainer in isolation — this
  * spec composes them: train on the fixture embeddings, build the
  * inverted lists from the LEARNED clusters, probe-2 search, and
  * measure recall@10 against exact brute force. Everything in the
  * chain is deterministic (lloyd's seeding/ties, round(6) scores,
  * vec_id tie-breaks), so the measured recall is a constant of the
  * fixture and the assert pins it as a regression gate — if a trainer
  * or search change degrades clustering quality, recall drops and this
  * fails loudly. */
class IvfRecallSpec extends SparkSpec {

  private val K = 8
  private val Probes = 2
  private val TopK = 10
  private val NQ = 20

  test("lloyd-trained IVF with 2 probes recovers brute-force neighbors on the fixture") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir)
      .select($"vec_id", $"embedding", l2norm($"embedding").as("nrm"))
      .localCheckpoint()

    val assign = KMeans.lloyd(e, "vec_id", "embedding", k = K, iters = 5)
    val listed = e.join(assign, Seq("vec_id")) // (vec_id, embedding, nrm, cluster)

    // trained centroids = per-cluster mean, q53's posexplode->agg shape
    val cent = listed.select($"cluster", posexplode($"embedding"))
      .groupBy($"cluster", $"pos")
      .agg(round(avg($"col".cast("double")), 6).as("v"))
      .groupBy($"cluster")
      .agg(array_sort(collect_list(struct($"pos", $"v"))).as("pv"))
      .select($"cluster".as("c_id"),
        transform($"pv", x => x.getField("v")).as("c_emb"))

    val q = e.filter($"vec_id" < NQ)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))

    // probe the top-2 learned centroids per query
    val wc = Window.partitionBy($"q_id").orderBy(
      round(dot($"q_emb", $"c_emb") /
        ($"q_nrm" * sqrt(dot($"c_emb", $"c_emb"))), 6).desc, $"c_id")
    val probes = broadcast(q).crossJoin(broadcast(cent))
      .withColumn("crnk", row_number().over(wc))
      .filter($"crnk" <= Probes)
      .select($"q_id", $"q_emb", $"q_nrm", $"c_id")

    def topk(scored: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
      val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= TopK)
        .select($"q_id", $"n_id")
        .as[(Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    }

    val ivf = topk(probes
      .join(listed, $"cluster" === $"c_id" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("n_id"),
        round(dot($"q_emb", $"embedding") / ($"q_nrm" * $"nrm"), 6).as("cos")))

    val brute = topk(broadcast(q).join(e, $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("n_id"),
        round(dot($"q_emb", $"embedding") / ($"q_nrm" * $"nrm"), 6).as("cos")))

    assert(brute.keySet.size == NQ)
    val recalls = brute.map { case (qid, exact) =>
      val got = ivf.getOrElse(qid, Seq.empty).toSet
      exact.count(got.contains).toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    // measured: 0.535 mean 2-probe recall@10 on this fixture (synthetic
    // near-random embeddings — weak cluster structure; the 2/8-probe
    // random baseline is 0.25, so the trained quantizer doubles it).
    // Pinned just below the deterministic measurement as a quality
    // regression gate for trainer or search changes.
    assert(mean >= 0.50, f"mean recall@$TopK fell to $mean%.3f")
    // sanity: probing ALL lists must recover brute force exactly
    val full = topk(
      broadcast(q).crossJoin(cent.select($"c_id"))
        .select($"q_id", $"q_emb", $"q_nrm", $"c_id")
        .join(listed, $"cluster" === $"c_id" && $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("n_id"),
          round(dot($"q_emb", $"embedding") / ($"q_nrm" * $"nrm"), 6).as("cos")))
    assert(full == brute, "probing every list must equal brute force")
  }
}
