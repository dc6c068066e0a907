package graft

import org.apache.spark.sql.functions._

/** Provable invariants of the round-7 report queries — properties that
  * must hold on ANY corpus, asserted on the sf0.001 fixture:
  *
  *  - q215: a ground-truth member inside the probed cells necessarily
  *    ranks inside the IVF top-10 (GT members beat every non-GT
  *    candidate), so hits = |GT ∩ probed cells| — MONOTONE in probe
  *    depth, and full recall once every cell is probed.
  *  - q216: the greedy prefix can never allocate past its budget, and
  *    alloc_tokens must equal n_epochs × u_tokens exactly.
  *  - q218: each MaxSim term is a cosine in micro-units, so a score of
  *    8 slices is bounded by ±8·10⁶; ranks are dense 1..k per query.
  *  - q220: smoothed weights are a probability vector in ppm up to DIV
  *    truncation (≤ 1 ppm lost per source, plus ≤ 8·k ppm from the
  *    two-stage smoothing split).
  */
class RoundSevenInvariantSpec extends SparkSpec {

  test("q215: hits monotone in probe depth; probing every cell is full recall") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q215_probe_recall")(s, sfDir)
      .localCheckpoint()
    val byQ = res.orderBy($"q_id", $"p")
      .select($"q_id", $"p", $"hits", $"n_cand")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val hs = rows.sortBy(_._2).map(_._3)
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
        s"hits must be monotone in p for query $q: ${hs.toSeq}")
      val (_, p, h, nc) = rows.maxBy(_._2)
      assert(p == 8 && h == math.min(10L, nc),
        s"probing all cells must recover min(10, candidates) for $q")
    }
  }

  test("q216: allocation stays within budget and is integral epochs") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q216_epoch_alloc")(s, sfDir)
      .localCheckpoint()
    val bad = res.where($"alloc_tokens" =!= $"n_epochs" * $"u_tokens" ||
      $"n_epochs" < 1 || $"n_epochs" > 8)
    assert(bad.isEmpty, "alloc must be whole epochs of the source")
    val Seq(alloc, u) = res.agg(sum($"alloc_tokens"), sum($"u_tokens"))
      .as[(Long, Long)].collect().toSeq.flatMap(t => Seq(t._1, t._2))
    // budget = (5 * total) DIV 2 over ALL sources; allocated sources are
    // a subset, so their u-sum lower-bounds the true total
    assert(alloc <= 5L * u / 2L + u,
      s"allocated $alloc must stay within the 2.5-epoch budget of >= $u")
  }

  test("q218: MaxSim scores bounded by slice count; ranks dense per query") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q218_late_interaction")(s, sfDir)
      .localCheckpoint()
    assert(res.where($"score_u" > 8000000L || $"score_u" < -8000000L).isEmpty,
      "8 cosine terms in micro-units bound the score by +-8e6")
    val ranks = res.groupBy($"q_id")
      .agg(count(lit(1)).as("n"), min($"rnk").as("lo"), max($"rnk").as("hi"))
    assert(ranks.where($"lo" =!= 1L || $"hi" =!= $"n").isEmpty,
      "ranks must be dense 1..k per query")
  }

  test("q220: smoothed weights close to a ppm probability vector") {
    val s = spark
    import s.implicits._
    val res = SparkEntry.queries("q220_doremi_weights")(s, sfDir)
      .localCheckpoint()
    val k = res.count()
    assert(k > 0)
    val tot = res.agg(sum($"smoothed_ppm")).as[Long].head()
    // each source loses < 1 ppm to the weight DIV and < 1 ppm to each of
    // the two smoothing DIVs
    assert(tot <= 1000000L && tot >= 1000000L - 3 * k,
      s"smoothed ppm sum $tot must be 1e6 up to DIV truncation over $k rows")
  }
}
