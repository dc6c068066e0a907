package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** q08 is the one query with no DuckDB oracle (HLL sketches are
  * engine-specific by design) — pin its accuracy against the exact
  * distinct count instead: approx_count_distinct(rsd=0.01) must land
  * within 5× the requested relative error on every group (HLL's rsd is
  * a standard deviation, not a bound; 5σ at these cardinalities is a
  * safe, regression-catching envelope). */
class SketchAccuracySpec extends SparkSpec {

  private def pinAccuracy(dir: String): Unit = {
    import spark.implicits._
    val approx = SparkEntry.queries("q08_approx_uv")(spark, dir)
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("uv"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      val relErr = math.abs(ap - ex) / math.max(ex.toDouble, 1.0)
      assert(relErr <= 0.05, f"$dir $k: approx $ap vs exact $ex (relErr $relErr%.4f)")
    }
  }

  test("q08's HLL UV stays within 5% of the exact distinct count per group") {
    pinAccuracy(sfDir)
  }

  test("the 5% bound holds at the Verify scale factor (sf0.01)") {
    pinAccuracy("/root/testdata/sf0.01")
  }

  test("the 5% bound holds at the bench scale factor (sf0.1)") {
    // q08's only guarantee must track the scale the bench runs at: HLL
    // error drifts with register saturation, so a bound checked only on
    // toy cardinalities says nothing about the 10^5-user bench table
    pinAccuracy("/root/testdata/sf0.1")
  }

  test("approx_percentile stays within 1% rank error of exact at sf0.1") {
    // the other sketch a 100 TB engine leans on (KLL/GK-style quantiles:
    // percentile_approx's contract is RANK error <= 1/accuracy, not value
    // error). Verified the way the contract states it: the approximate
    // value's true CDF position must sit within eps of the target rank.
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val ps = Seq(0.5, 0.9, 0.99)
    val e = Tables.events(spark, dir).select($"event_type", $"value")
    e.persist()
    try {
      val approx = e.groupBy($"event_type")
        .agg(percentile_approx($"value",
          typedlit(ps), lit(10000)).as("ap"))
        .as[(String, Seq[Double])].collect().toMap
      val counts = e.groupBy($"event_type").count()
        .as[(String, Long)].collect().toMap
      approx.foreach { case (et, vals) =>
        ps.zip(vals).foreach { case (p, v) =>
          val below = e.filter($"event_type" === et && $"value" <= v).count()
          val rank = below.toDouble / counts(et)
          assert(math.abs(rank - p) <= 0.01,
            f"$et p$p: approx value $v sits at rank $rank%.4f")
        }
      }
    } finally e.unpersist()
  }

  test("count-min sketch overcounts within eps·N at sf0.1 and never undercounts") {
    // the heavy-hitter sketch (CMS): its contract is one-sided —
    // estimate >= true count, and estimate <= true + eps·N with
    // probability 1-delta. Pinned per user_id over the bench-scale
    // events table the way the contract states it, with a 3× envelope
    // on eps·N so only a real regression (seed handling, merge bug)
    // trips it, not sketch noise.
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val e = Tables.events(spark, dir).select($"user_id")
    val eps = 0.001
    val cms = e.stat.countMinSketch($"user_id", eps = eps, confidence = 0.99, seed = 42)
    val n = e.count()
    val exact = e.groupBy($"user_id").count().as[(Long, Long)].collect()
    exact.foreach { case (uid, cnt) =>
      val est = cms.estimateCount(uid)
      assert(est >= cnt, s"CMS undercounted user $uid: $est < $cnt")
      assert(est <= cnt + (3 * eps * n).toLong,
        s"CMS overcount beyond 3·eps·N for user $uid: $est vs $cnt (N=$n)")
    }
  }
}
