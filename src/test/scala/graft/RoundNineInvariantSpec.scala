package graft

/** Provable invariants of the round-9 report queries — properties that
  * must hold on ANY corpus, asserted on the sf0.001 fixture:
  *
  *  - q247: the curve is a coherent confusion sweep — n_keep = tp+fp,
  *    tp+fp+fn+tn is the same eval-slice size at every τ, n_keep is
  *    NONINCREASING in τ (keep = logit ≥ τ), and the τ = 0 row equals
  *    q242's per-source confusion totals exactly (same trainer, same
  *    slice, q242's gate IS τ = 0).
  */
class RoundNineInvariantSpec extends SparkSpec {

  test("q247: partition/monotonicity invariants and the τ=0 row equals " +
    "q242's totals") {
    val s = spark
    import s.implicits._
    val rows = SparkEntry.queries("q247_gate_calibration")(s, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.length == 9, "one row per ladder threshold")
    val evalSizes = rows.map { case (_, nk, tp, fp, fn, tn) =>
      assert(nk == tp + fp, "n_keep must equal tp + fp")
      tp + fp + fn + tn
    }
    assert(evalSizes.distinct.length == 1,
      "every τ sees the same eval slice")
    assert(evalSizes.head > 0, "empty eval slice")
    rows.map(_._2).toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, "n_keep must be nonincreasing in τ")
    case _ => ()
    }
    val zero = rows.find(_._1 == 0L).get
    val q242 = SparkEntry.queries("q242_trained_eval")(s, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val (tp, fp, fn, tn) = (q242.map(_._4).sum, q242.map(_._5).sum,
      q242.map(_._6).sum, q242.map(_._7).sum)
    assert((zero._3, zero._4, zero._5, zero._6) == ((tp, fp, fn, tn)),
      "τ=0 must reproduce q242's confusion totals")
  }
}
