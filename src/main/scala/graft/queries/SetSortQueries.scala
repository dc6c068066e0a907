package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Set operations & sorts — SURVEY §2.6 (O1–O5) and §2.7 (U1–U5).
  *
  * The reference combines log sources with `unionAll`
  * (`etl/UserAgregate.scala:94-99`), splits event families with `except`
  * (`etl/RunLogParser.scala:84`), and exports global ranks with
  * `sort().collect()` (`rank/reports/SetFavoriteRank.scala:72-73`).
  *
  * Scale notes: union is a zero-shuffle concatenation of partitions;
  * distinct/except/intersect each shuffle once on the full row. Global
  * top-k (q32) uses orderBy.limit which Spark executes as per-partition
  * top-k + single-reducer merge (TakeOrderedAndProject) — never a full sort.
  */
object SetSortQueries extends QueryPack {

  /** U1: unionAll of per-family slices (`etl/UserAgregate.scala:94-99`). */
  private val q28: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val a = e.filter($"event_type" === "purchase").select($"user_id", $"value")
    val b = e.filter($"event_type" === "click").select($"user_id", $"value")
    a.unionAll(b)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"user_id")
  }

  /** U3: UNION with dedup (`LiveChannelStatistics.scala:618-625`). */
  private val q29: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val a = e.filter($"event_type" === "purchase").select($"user_id")
    val b = e.filter($"event_type" === "click").select($"user_id")
    a.union(b).distinct().orderBy($"user_id")
  }

  /** U4: except — row-set difference (`etl/RunLogParser.scala:84`), at
    * (user, day) grain so the difference is non-empty in the fixtures. */
  private val q30: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"user_id", date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type")
    val clickers = e.filter($"event_type" === "click").select($"user_id", $"day")
    val buyers = e.filter($"event_type" === "purchase").select($"user_id", $"day")
    clickers.except(buyers).orderBy($"user_id", $"day")
  }

  /** U5: intersect (absent in the reference; completes the set-op family). */
  private val q31: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val clickers = e.filter($"event_type" === "click").select($"user_id")
    val buyers = e.filter($"event_type" === "purchase").select($"user_id")
    clickers.intersect(buyers).orderBy($"user_id")
  }

  /** O1/O2: global ORDER BY + LIMIT top-k (`rank/reports/SetFavoriteRank.scala:72-73`)
    * — plans as TakeOrderedAndProject, no global sort. */
  private val q32: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** O5: in-group ordered path (quickSort of per-user events,
    * `etl/NginxLogParseForLabel.scala:234-240`) — first 5 events as a
    * click-path string, via window filter + ordered array agg. */
  private val q33: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .groupBy($"user_id")
      .agg(
        concat_ws(">",
          transform(array_sort(collect_list(struct($"event_id", $"event_type"))),
            x => x.getField("event_type"))).as("path"))
      .orderBy($"user_id")
  }

  private val ZBITS = 10

  /** Z-order (Morton) interleave of two ZBITS-bit dims — pure shift/mask
    * arithmetic, codegen'd, identical in DuckDB. */
  private def zorder(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    (0 until ZBITS).flatMap(i => Seq(
      shiftleft(shiftright(x, i).bitwiseAND(1L), 2 * i),
      shiftleft(shiftright(y, i).bitwiseAND(1L), 2 * i + 1)))
      .reduce(_ bitwiseOR _)

  /** O4 at 100 TB: the multi-dimensional clustering key behind
    * sorted/clustered writes (`IoOps.writeClustered`). Sorting a fact
    * table by the Z-order interleave of two filter dims gives parquet
    * row-group min/max pruning on BOTH dims from ONE sort order — the
    * technique behind Delta OPTIMIZE ZORDER. The query computes the
    * 20-bit Morton key over (l_orderkey, l_partkey) low bits and censuses
    * its top-6-bit buckets: exact integer evidence the interleave is
    * correct and uniform. */
  private val q92: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(zorder($"l_orderkey" % 1024, $"l_partkey" % 1024).as("z"))
      .groupBy(shiftright($"z", 14).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min($"z").as("min_z"),
        max($"z").as("max_z"),
        countDistinct($"z").as("n_cells"))
      .orderBy($"bucket")
  }

  val queries: Map[String, Q] = Map(
    "q28_union_all" -> q28,
    "q29_union_distinct" -> q29,
    "q30_except" -> q30,
    "q31_intersect" -> q31,
    "q32_orderby_limit" -> q32,
    "q33_path_agg" -> q33,
    "q92_zorder_key" -> q92
  )

  val oracle: Map[String, String] = Map(
    "q28_union_all" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
        |FROM (SELECT user_id, value FROM events WHERE event_type = 'purchase'
        |      UNION ALL
        |      SELECT user_id, value FROM events WHERE event_type = 'click')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q29_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'click'
        |ORDER BY user_id""".stripMargin,
    "q30_except" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,
    "q31_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "q32_orderby_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q33_path_agg" ->
      """SELECT user_id, string_agg(event_type, '>' ORDER BY event_id) AS path
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |      FROM events)
        |WHERE rn <= 5
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q92_zorder_key" -> {
      val terms = (0 until ZBITS).flatMap(i => Seq(
        s"(((l_orderkey % 1024) >> $i) & 1) << ${2 * i}",
        s"(((l_partkey % 1024) >> $i) & 1) << ${2 * i + 1}"))
        .map(t => s"($t)").mkString(" | ")
      s"""SELECT bucket, count(*) AS n,
         |  CAST(min(z) AS BIGINT) AS min_z, CAST(max(z) AS BIGINT) AS max_z,
         |  count(DISTINCT z) AS n_cells
         |FROM (SELECT CAST(($terms) AS BIGINT) AS z,
         |        CAST(($terms) AS BIGINT) >> 14 AS bucket
         |      FROM lineitem)
         |GROUP BY bucket ORDER BY bucket""".stripMargin
    }
  )
}
