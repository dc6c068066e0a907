package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** CBO join-reorder END-TO-END (round 12, VERDICT r11 #2 — closes the
  * loop CboStatsSpec opened): ANALYZE'd catalog statistics over the
  * TPC-H fixture tables must actually CHANGE the join order of a
  * multi-join text when `spark.sql.cbo.{enabled,joinReorder.enabled}`
  * are on ([[graft.core.GraftSession.cboBuilder]]'s confs). The probe
  * text is the Q5 join family written in a deliberately bad textual
  * order — the fact table first, the selective region dim last — so
  * the non-CBO plan (which keeps connected textual order) and the
  * DP-reordered plan are distinguishable by leaf sequence. */
class CboReorderSpec extends SparkSpec {

  /** Leaf relation names in join-tree order (left-to-right depth-first
    * across the Join spine) — plan-toString is exprId-unstable across
    * invocations (CLAUDE rule), so compare STRUCTURE, not text. */
  private def joinLeaves(p: LogicalPlan): Seq[String] = p match {
    case j: Join => joinLeaves(j.left) ++ joinLeaves(j.right)
    case other =>
      val leaves = other.collectLeaves()
      if (leaves.size == 1)
        "stats_(\\w+)".r.findFirstMatchIn(leaves.head.toString)
          .map(_.group(1)).toSeq
      else other.children.flatMap(joinLeaves)
  }

  private def joinsOf(p: LogicalPlan): Seq[String] =
    p.collectFirst { case j: Join => joinLeaves(j) }.getOrElse(Nil)

  test("ANALYZE'd stats + cbo.joinReorder change the Q5-family join " +
    "order; without CBO the textual order survives") {
    val s = spark
    val tables = Seq("lineitem", "orders", "customer", "supplier",
      "nation", "region")
    tables.foreach(t => s.sql(s"DROP TABLE IF EXISTS stats_$t"))
    graft.core.Tables.lineitem(s, sfDir).write.saveAsTable("stats_lineitem")
    graft.core.Tables.orders(s, sfDir).write.saveAsTable("stats_orders")
    Seq("customer", "supplier", "nation", "region").foreach { t =>
      graft.core.Tables.load(s, sfDir, t).write.saveAsTable(s"stats_$t")
    }
    tables.foreach { t =>
      s.sql(s"ANALYZE TABLE stats_$t COMPUTE STATISTICS")
    }
    // column stats on every join key + the selective predicates — the
    // inputs the DP reorder's cardinality estimates consume
    s.sql("ANALYZE TABLE stats_lineitem COMPUTE STATISTICS FOR COLUMNS " +
      "l_orderkey, l_suppkey")
    s.sql("ANALYZE TABLE stats_orders COMPUTE STATISTICS FOR COLUMNS " +
      "o_orderkey, o_custkey, o_orderdate")
    s.sql("ANALYZE TABLE stats_customer COMPUTE STATISTICS FOR COLUMNS " +
      "c_custkey, c_nationkey")
    s.sql("ANALYZE TABLE stats_supplier COMPUTE STATISTICS FOR COLUMNS " +
      "s_suppkey, s_nationkey")
    s.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS FOR COLUMNS " +
      "n_nationkey, n_regionkey, n_name")
    s.sql("ANALYZE TABLE stats_region COMPUTE STATISTICS FOR COLUMNS " +
      "r_regionkey, r_name")
    // Q5's join family, textual order deliberately fact-first/dim-last
    val q5 =
      """SELECT n_name, count(*) AS n
        |FROM stats_lineitem
        |JOIN stats_orders ON l_orderkey = o_orderkey
        |JOIN stats_customer ON c_custkey = o_custkey
        |JOIN stats_supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN stats_nation ON s_nationkey = n_nationkey
        |JOIN stats_region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name""".stripMargin
    val prev = (s.conf.get("spark.sql.cbo.enabled", "false"),
      s.conf.get("spark.sql.cbo.joinReorder.enabled", "false"))
    def planWith(cbo: Boolean): LogicalPlan = {
      s.conf.set("spark.sql.cbo.enabled", cbo.toString)
      s.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      s.sql(q5).queryExecution.optimizedPlan
    }
    try {
      val off = joinsOf(planWith(cbo = false))
      val on = joinsOf(planWith(cbo = true))
      assert(off.size == 6 && on.size == 6,
        s"both plans join all six relations: off=$off on=$on")
      assert(off != on,
        s"stats-informed DP reorder must change the join order:\n" +
          s"  without CBO: ${off.mkString(" ⋈ ")}\n" +
          s"  with CBO:    ${on.mkString(" ⋈ ")}")
      // the point of the reorder: the fact table must stop leading —
      // with stats the cheapest trees start from the filtered dims
      assert(off.head == "lineitem", "textual order leads with the fact")
      assert(on.head != "lineitem",
        s"reordered plan still leads with the fact table: $on")
      // correctness is untouched by the reorder
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val offRows = s.sql(q5).collect().map(_.toSeq).toSet
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val onRows = s.sql(q5).collect().map(_.toSeq).toSet
      assert(offRows == onRows, "reorder must not change results")
    } finally {
      s.conf.set("spark.sql.cbo.enabled", prev._1)
      s.conf.set("spark.sql.cbo.joinReorder.enabled", prev._2)
      tables.foreach(t => s.sql(s"DROP TABLE IF EXISTS stats_$t"))
    }
  }
}
