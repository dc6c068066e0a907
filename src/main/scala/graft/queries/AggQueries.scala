package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Aggregation operators — SURVEY §2.4 (A1–A18).
  *
  * Re-expresses the reference's HiveQL hash-aggregations (e.g. the play-
  * segment merge at `etl/RunLogParser.scala:401-411` and the user-tier
  * segmentation at `homed/repots/ChannelReport.scala:166-180`) over the
  * harness tables. All aggregates run as partial (map-side) + final hash
  * aggregation — no shuffle beyond the single group-by exchange.
  */
object AggQueries extends QueryPack {

  /** A1: sum/min/max hash-agg (segment merge, `etl/RunLogParser.scala:401-411`). */
  private val q01: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(min($"l_extendedprice"), 2).as("min_price"),
        round(max($"l_extendedprice"), 2).as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, Q] = Map(
    "q01_agg" -> q01
  )

  val oracle: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
