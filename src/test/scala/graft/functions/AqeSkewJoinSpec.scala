package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join: the RUNTIME half of graft's skew story. SkewUtils
  * covers the places AQE can't act (bucketed scans, stream-static
  * joins); everywhere else graft relies on AQE splitting oversized
  * partitions at shuffle time — this spec proves that actually happens
  * on an adversarial key distribution (one key owning ~90% of rows),
  * by reading the `isSkew` markers off the executed adaptive plan. */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k))
    try {
      // force SMJ (no broadcast), and set the skew thresholds low enough
      // that the test-scale hot partition qualifies
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 50k rows, ~90% on key 0; dim side 200 distinct keys
      val fact = spark.range(0, 50000)
        .select((when(rand(7) < 0.9, 0L).otherwise(pmod($"id", lit(200)))).as("k"),
          $"id".as("v"))
      val dim = spark.range(0, 200).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, Seq("k")).agg(sum($"v" + $"w").as("s"))
      joined.collect() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot join partition skewed:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
