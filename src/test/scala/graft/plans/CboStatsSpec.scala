package graft.plans

import graft.SparkSpec

/** Catalog statistics → cost-based optimization (SURVEY §4 "let
  * Catalyst optimize"): at 100 TB the difference between a broadcast
  * and a shuffle join — or a good and a bad join order — is whether the
  * optimizer KNOWS the post-filter cardinalities, and that knowledge is
  * `ANALYZE TABLE` statistics. This pins the seam the library relies
  * on: table-level rowCount lands in the catalog and propagates into
  * plan stats, and with CBO enabled the column histogram/NDV stats
  * shrink a Filter's estimated cardinality below the table's — the
  * input every downstream join-strategy and join-reorder decision
  * consumes. (The reference tunes nothing: Spark 1.6 had no CBO; every
  * join strategy there is hand-rolled repartition counts.) */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE statistics propagate rowCount; column stats + CBO " +
    "shrink filter estimates below the table cardinality") {
    val s = spark; import s.implicits._
    s.sql("DROP TABLE IF EXISTS stats_orders")
    graft.core.Tables.orders(s, sfDir).write.saveAsTable("stats_orders")
    val trueRows = s.table("stats_orders").count()
    s.sql("ANALYZE TABLE stats_orders COMPUTE STATISTICS")
    s.sql("ANALYZE TABLE stats_orders COMPUTE STATISTICS FOR COLUMNS " +
      "o_orderstatus, o_custkey")
    val prevCbo = s.conf.get("spark.sql.cbo.enabled", "false")
    s.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val t = s.table("stats_orders")
      val tableStats = t.queryExecution.optimizedPlan.stats
      assert(tableStats.rowCount.contains(BigInt(trueRows)),
        s"catalog rowCount must propagate: $tableStats vs $trueRows")
      // o_orderstatus has 3 distinct values ('O','F','P') — with NDV
      // stats the equality filter estimates ~rows/3, far below rows
      val filtered = t.where($"o_orderstatus" === "P")
      val fStats = filtered.queryExecution.optimizedPlan.stats
      assert(fStats.rowCount.isDefined, "CBO filter estimate present")
      assert(fStats.rowCount.get < tableStats.rowCount.get,
        s"filter estimate must shrink: $fStats vs $tableStats")
      assert(fStats.sizeInBytes < tableStats.sizeInBytes,
        "size estimate shrinks with the row estimate (the number the " +
          "broadcast-join threshold actually compares)")
    } finally {
      s.conf.set("spark.sql.cbo.enabled", prevCbo)
      s.sql("DROP TABLE IF EXISTS stats_orders")
    }
  }
}
