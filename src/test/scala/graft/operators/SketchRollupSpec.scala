package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The persisted-sketch-table contract: serving a coarse grain from
  * unioned fine-grain sketches must be indistinguishable from sketching
  * the raw table directly (same lgK) — that equality is what licenses
  * replacing the 100 TB raw re-scan with an O(cells) sketch-table read.
  * Plus the q08-style accuracy envelope and the partial-agg plan shape
  * (the exchange must carry KB register banks, not user ids). */
class SketchRollupSpec extends SparkSpec {

  private def events = Tables.events(spark, "/root/testdata/sf0.01")
    .withColumn("day", to_date(col("ts")))

  test("union of daily sketches == direct sketch, per group and globally") {
    import spark.implicits._
    val daily = SketchRollup.sketchTable(events, Seq("day", "event_type"), "user_id")
    val viaRollup = SketchRollup.rollupEstimate(daily, Seq("event_type"))
      .select($"event_type", $"uv").as[(String, Long)].collect().toMap
    val direct = SketchRollup.rollupEstimate(
      SketchRollup.sketchTable(events, Seq("event_type"), "user_id"), Seq("event_type"))
      .select($"event_type", $"uv").as[(String, Long)].collect().toMap
    assert(viaRollup == direct,
      s"sketch union must be lossless: rollup $viaRollup vs direct $direct")

    val globalRoll = SketchRollup.rollupEstimate(daily, Seq.empty)
      .select($"uv").as[Long].head()
    val globalDirect = SketchRollup.rollupEstimate(
      SketchRollup.sketchTable(events.withColumn("one", lit(1)), Seq("one"), "user_id"),
      Seq.empty).select($"uv").as[Long].head()
    assert(globalRoll == globalDirect)
  }

  test("rolled-up estimates stay within the 5% q08 envelope of exact UV") {
    import spark.implicits._
    val daily = SketchRollup.sketchTable(events, Seq("day", "event_type"), "user_id")
    val est = SketchRollup.rollupEstimate(daily, Seq("event_type"))
      .select($"event_type", $"uv").as[(String, Long)].collect().toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("uv"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val relErr = math.abs(est(k).toDouble - ex) / math.max(ex.toDouble, 1.0)
      assert(relErr <= 0.05, f"$k: estimate ${est(k)} vs exact $ex (relErr $relErr%.4f)")
    }
  }

  test("the sketch build partial-aggregates map-side (exchange carries registers, not ids)") {
    val plan = SketchRollup.sketchTable(events, Seq("event_type"), "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_hll_sketch_agg"),
      s"expected a partial_ hll_sketch_agg before the exchange:\n${plan.take(1200)}")
  }

  test("null ids and empty inputs degrade gracefully") {
    import spark.implicits._
    val withNulls = events.withColumn("user_id",
      when(pmod(col("user_id"), lit(5)) === 0, lit(null)).otherwise(col("user_id")))
    // nulls are skipped, not counted or crashed on
    val est = SketchRollup.rollupEstimate(
      SketchRollup.sketchTable(withNulls, Seq("event_type"), "user_id"),
      Seq("event_type")).select($"event_type", $"uv").as[(String, Long)].collect()
    assert(est.nonEmpty && est.forall(_._2 > 0))
    val empty = SketchRollup.rollupEstimate(
      SketchRollup.sketchTable(events.limit(0), Seq("event_type"), "user_id"),
      Seq("event_type"))
    assert(empty.count() == 0)
  }
}
