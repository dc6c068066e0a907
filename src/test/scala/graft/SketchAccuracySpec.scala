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
}
