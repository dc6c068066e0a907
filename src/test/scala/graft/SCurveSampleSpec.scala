package graft

import graft.queries.DedupQueries

/** The 100 TB form of the q135 LSH s-curve diagnostic: `sampleFrac` < 1
  * runs the quadratic exact-Jaccard side (and the band join it is compared
  * against) on a seeded document sample. Pins that the frac=1.0 instance
  * IS q135 and that the sampled form stays on the same measurement
  * contract (schema, bucket domain, rate bounds). */
class SCurveSampleSpec extends SparkSpec {

  test("sampleFrac=1.0 is exactly q135 (same plan, same rows)") {
    val full = DedupQueries.sCurve(spark, sfDir, 1.0)
    val q135 = DedupQueries.queries("q135_lsh_scurve")(spark, sfDir)
    assert(!full.queryExecution.optimizedPlan.toString.contains("Sample"),
      "frac=1.0 must not inject a Sample node")
    assert(DedupQueries.sCurve(spark, sfDir, 0.5)
      .queryExecution.optimizedPlan.toString.contains("Sample"),
      "frac<1 must sample")
    assert(full.collect().toSeq == q135.collect().toSeq)
  }

  test("sampled form: same schema, subset population, rates stay in [0,1]") {
    val full = DedupQueries.sCurve(spark, sfDir, 1.0).collect()
    val half = DedupQueries.sCurve(spark, sfDir, 0.5)
    val rows = half.collect()
    assert(half.schema.fieldNames.toSeq ==
      Seq("bucket", "n_pairs", "n_cand", "cand_rate", "theory_rate"))
    assert(rows.nonEmpty, "a 50% sample of sf0.001 must still yield pairs")
    val fullPairs = full.map(_.getAs[Long]("n_pairs")).sum
    val halfPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(halfPairs < fullPairs,
      s"sampling must shrink the exact-side pair population ($halfPairs vs $fullPairs)")
    rows.foreach { r =>
      val rate = r.getAs[Double]("cand_rate")
      assert(rate >= 0.0 && rate <= 1.0, s"cand_rate out of range: $r")
      assert(r.getAs[Long]("n_cand") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("invalid fractions are rejected") {
    intercept[IllegalArgumentException](DedupQueries.sCurve(spark, sfDir, 0.0))
    intercept[IllegalArgumentException](DedupQueries.sCurve(spark, sfDir, 1.5))
  }
}
