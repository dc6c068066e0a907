package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataAudit.observed: metrics must ride the production action (one
  * scan) and report exact aggregates for the rows that flowed. */
class ObservationAuditSpec extends SparkSpec {

  test("observed metrics ride the action and report exact values") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 7.0), (4L, 0.0)).toDF("id", "v")
    val (out, fetch) = DataAudit.observed(df, "audit_obs",
      "n" -> count(lit(1)),
      "n_neg" -> sum(when($"v" < 0, 1L).otherwise(0L)),
      "v_sum" -> round(sum($"v"), 2))
    // the production action: a write-shaped full materialization
    val n = out.count()
    val m = fetch()
    assert(n == 4)
    assert(m("n") == 4L, s"metrics: $m")
    assert(m("n_neg") == 1L, s"metrics: $m")
    assert(m("v_sum") == 11.0, s"metrics: $m")
  }
}
