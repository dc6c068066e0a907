package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedRank must be value-identical to Spark's own global-window
  * rank functions — it exists only to change the PLAN (no single-task
  * window), never the answer. */
class DistributedRankSpec extends SparkSpec {

  // 1000 rows, keys deliberately scrambled (Knuth multiplicative hash) so
  // range partitions don't align with input order; key is unique.
  private lazy val df = {
    import spark.implicits._
    spark.range(0L, 1000L)
      .select((($"id" * 2654435761L) % 100000L).as("key"), $"id")
  }

  test("withRowNumber matches global-window row_number") {
    import spark.implicits._
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy($"key", $"id")).cast("long"))
    val actual = DistributedRank.withRowNumber(df, "rn", $"key", $"id")
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty)
  }

  test("ntile/percent_rank/cume_dist derivations match the builtins") {
    import spark.implicits._
    val w = Window.orderBy($"key", $"id")
    val expected = df.select($"key", $"id",
      ntile(7).over(w).as("t"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
    val actual = DistributedRank
      .withRowNumberAndTotal(df, "rn", "n", $"key", $"id")
      .select($"key", $"id",
        DistributedRank.ntileOf($"rn", $"n", 7).as("t"),
        DistributedRank.percentRankOf($"rn", $"n").as("pr"),
        DistributedRank.cumeDistOf($"rn", $"n").as("cd"))
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty)
  }

  test("withRunningTotal matches global-window prefix sum") {
    import spark.implicits._
    val vals = df.withColumn("v", ($"id" % 37L) + 1L)
    val expected = vals.withColumn("rt",
      sum($"v").over(Window.orderBy($"key", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val actual = DistributedRank.withRunningTotal(vals, "rt", $"v", $"key", $"id")
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty)
  }

  test("ntileOf handles total smaller than bucket count") {
    import spark.implicits._
    val tiny = spark.range(0L, 3L).select($"id".as("key"), $"id")
    val w = Window.orderBy($"key", $"id")
    val expected = tiny.select($"id", ntile(7).over(w).as("t"))
    val actual = DistributedRank
      .withRowNumberAndTotal(tiny, "rn", "n", $"key", $"id")
      .select($"id", DistributedRank.ntileOf($"rn", $"n", 7).as("t"))
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty)
  }
}
