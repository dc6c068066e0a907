package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into packs, one per SURVEY §2 operator family;
  * each pack keeps its Spark implementation and its DuckDB oracle SQL
  * side by side so the column-name / rounding / ordering contract
  * (QueryPack scaladoc) is auditable per query.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    AggQueries,
    JoinQueries,
    WindowQueries,
    SetSortQueries,
    FunctionQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    MultimodalQueries,
    EtlQueries,
    PipelineQueries,
    ReportQueries,
    ComposedReportQueries,
    BehaviorQueries,
    CorpusOpsQueries,
    SqlSurfaceQueries,
    LayoutQueries,
    ReportParityQueries,
    TpchQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    // a duplicate name across packs would silently shadow one
    // implementation (and could pair it with the other pack's oracle)
    require(all.map(_._1).distinct.size == all.size,
      "duplicate query names across packs: " +
        all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }.mkString(", "))
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
