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

  test("q08's HLL UV stays within 5% of the exact distinct count per group") {
    import spark.implicits._
    val approx = SparkEntry.queries("q08_approx_uv")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("uv"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      val relErr = math.abs(ap - ex) / math.max(ex.toDouble, 1.0)
      assert(relErr <= 0.05, f"$k: approx $ap vs exact $ex (relErr $relErr%.4f)")
    }
  }
}
