package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** The ONE copy of the CBO join-reorder probe recipe (round-12 review:
  * PlanDump's appendix, CboReorderSpec and TpchQueries.ensureCboTables
  * each carried their own fixture builder + ANALYZE column map — three
  * copies that would silently diverge, and two of them missed the
  * orphan-warehouse-dir cleanup that wedges any second JVM with
  * LOCATION_ALREADY_EXISTS).
  *
  * What lives here: the per-table column-stats map (every join key and
  * selective predicate the DP reorder's estimates consume), the
  * save+ANALYZE step with its stale-location cleanup, the Q5 probe
  * text written in a deliberately bad fact-first order, and the
  * join-leaf extractor both evidence surfaces compare with
  * (plan toString embeds exprIds — structure, never text). */
object CboProbe {

  /** The six probe tables in save order (facts first). */
  val tables: Seq[String] =
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region")

  /** ANALYZE ... FOR COLUMNS inputs per table. */
  val columnStats: Map[String, String] = Map(
    "lineitem" -> "l_orderkey, l_suppkey",
    "orders" -> "o_orderkey, o_custkey, o_orderdate",
    "customer" -> "c_custkey, c_nationkey",
    "supplier" -> "s_suppkey, s_nationkey",
    "nation" -> "n_nationkey, n_regionkey, n_name",
    "region" -> "r_regionkey, r_name")

  private def sourceOf(s: SparkSession, sfDir: String, table: String) =
    table match {
      case "lineitem" => graft.core.Tables.lineitem(s, sfDir)
      case "orders" => graft.core.Tables.orders(s, sfDir)
      case t => graft.core.Tables.load(s, sfDir, t)
    }

  /** Save ONE ANALYZE'd managed copy. The in-memory catalog is
    * JVM-scoped but the warehouse DIRECTORY is not: saveAsTable on a
    * catalog-unknown name whose managed location survives from a
    * previous JVM throws LOCATION_ALREADY_EXISTS — so drop both the
    * (possibly known) table and the orphan directory first. */
  def saveAnalyzed(s: SparkSession, sfDir: String, table: String,
      name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(wh, name.toLowerCase), true)
    sourceOf(s, sfDir, table).write.mode("overwrite").saveAsTable(name)
    s.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
    s.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS " +
      s"FOR COLUMNS ${columnStats(table)}")
  }

  /** Build all six ANALYZE'd copies under `nameOf`. */
  def prepare(s: SparkSession, sfDir: String,
      nameOf: String => String): Unit =
    tables.foreach(t => saveAnalyzed(s, sfDir, t, nameOf(t)))

  /** Drop all six (tables only — locations go with managed drops). */
  def drop(s: SparkSession, nameOf: String => String): Unit =
    tables.foreach(t => s.sql(s"DROP TABLE IF EXISTS ${nameOf(t)}"))

  /** The Q5 join family, textual order deliberately fact-first /
    * selective-dim-last, so the non-CBO plan (connected textual order)
    * and the DP-reordered plan are distinguishable by leaf sequence. */
  def q5Text(nameOf: String => String): String =
    s"""SELECT n_name, count(*) AS n
       |FROM ${nameOf("lineitem")}
       |JOIN ${nameOf("orders")} ON l_orderkey = o_orderkey
       |JOIN ${nameOf("customer")} ON c_custkey = o_custkey
       |JOIN ${nameOf("supplier")} ON l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |JOIN ${nameOf("nation")} ON s_nationkey = n_nationkey
       |JOIN ${nameOf("region")} ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= DATE '1996-01-01'
       |  AND o_orderdate < DATE '1997-01-01'
       |GROUP BY n_name""".stripMargin

  /** Leaf relation names of the first Join spine, left-to-right —
    * `namePat` extracts the logical table name from a leaf's toString
    * (e.g. `"stats_(\\w+)".r`). */
  def joinOrder(p: LogicalPlan,
      namePat: scala.util.matching.Regex): Seq[String] = {
    def leaves(q: LogicalPlan): Seq[String] = q match {
      case j: Join => leaves(j.left) ++ leaves(j.right)
      case other =>
        val ls = other.collectLeaves()
        if (ls.size == 1)
          namePat.findFirstMatchIn(ls.head.toString).map(_.group(1)).toSeq
        else other.children.flatMap(leaves)
    }
    p.collectFirst { case j: Join => leaves(j) }.getOrElse(Nil)
  }
}
