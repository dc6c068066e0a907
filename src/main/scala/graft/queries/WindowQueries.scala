package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Window operators — SURVEY §2.5 (W1–W9).
  *
  * The reference's sessionization/dedup core: `lead()` pairing
  * (`etl/LogParser.scala:288-344`, `etl/RunLogParser.scala:383-439`),
  * heartbeat windows (`etl/ReportLog.scala:199-279`), latest-record picks
  * (`homed/realtime/UserStatusByRunLog.scala:125-132`), top-N ranks
  * (`homed/repots/ChannelReport.scala:232-247`).
  *
  * Determinism (SURVEY H-3): every window orders by a unique monotone key
  * (`event_id`) so lead/row_number/rank picks are reproducible across
  * engines — the reference's unordered `first()`/ties are redefined.
  *
  * Scale notes: each window = one exchange on its partition keys; windows
  * sharing (user_id) partitioning reuse the same shuffle. Timestamps are
  * compared as exact epoch-microsecond longs, never floats.
  */
object WindowQueries extends QueryPack {

  /** W1: lead-pairing sessionization (`etl/RunLogParser.scala:419-439`):
    * event → next event per user; active time = sum of gaps < 30 min. */
  private val q20: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Tables.events(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("gap_us", lead($"us", 1).over(w) - $"us")
      .filter($"gap_us".isNotNull && $"gap_us" < lit(1800L * 1000000L))
      .groupBy($"user_id")
      .agg(sum($"gap_us").as("active_us"), count(lit(1)).as("n_gaps"))
      .orderBy($"user_id")
  }

  /** W2: lead with default (heartbeat close-out, `etl/ReportLog.scala:199-231`):
    * transition matrix event_type → next type, 'END' when no successor. */
  private val q21: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Tables.events(s, d)
      .withColumn("next_type", lead($"event_type", 1, "END").over(w))
      .groupBy($"event_type", $"next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"next_type")
  }

  /** W3: first_value session anchor (`etl/ReportLog.scala:208,255`). */
  private val q22: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Tables.events(s, d)
      .withColumn("anchor_us", first(expr("unix_micros(ts)")).over(w))
      .withColumn("anchor_type", first($"event_type").over(w))
      .select($"user_id", $"anchor_us", $"anchor_type").distinct()
      .orderBy($"user_id")
  }

  /** W4: max-over + equality filter for latest record
    * (`homed/realtime/UserStatusByRunLog.scala:125-132`). */
  private val q23: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    Tables.events(s, d)
      .withColumn("last_id", max($"event_id").over(w))
      .filter($"event_id" === $"last_id")
      .select($"user_id", $"event_type".as("last_type"), $"value".as("last_value"))
      .orderBy($"user_id")
  }

  /** W5: row_number latest-per-key (`etl/UserDeviceInfo.scala:63,123`) —
    * here: each user's highest-value event, event_id tiebreak. */
  private val q24: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("top_type"), $"value".as("top_value"))
      .orderBy($"user_id")
  }

  /** W6: dense_rank top-N per group (`homed/repots/ChannelReport.scala:232-247`):
    * top 3 users by spend within each event_type. */
  private val q25: Q = (s, d) => {
    import s.implicits._
    val perUser = Tables.events(s, d)
      .groupBy($"event_type", $"user_id")
      .agg(round(sum($"value"), 2).as("spend"))
    val w = Window.partitionBy($"event_type").orderBy($"spend".desc, $"user_id")
    perUser
      .withColumn("rnk", dense_rank().over(w))
      .filter($"rnk" <= 3)
      .select($"event_type", $"user_id", $"spend", $"rnk")
      .orderBy($"event_type", $"rnk", $"user_id")
  }

  /** W7: rank within group (`rank/reports/StarRank.scala` family) — raw
    * column ordering, no arithmetic, so ranks are engine-exact. */
  private val q26: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"n_name").orderBy($"s_acctbal".desc, $"s_suppkey")
    Tables.supplier(s, d)
      .join(Tables.nation(s, d), $"s_nationkey" === $"n_nationkey")
      .withColumn("rnk", rank().over(w))
      .select($"n_name", $"s_name", $"s_acctbal", $"rnk")
      .orderBy($"n_name", $"rnk", $"s_name")
  }

  /** W9: explicit frame — running cumulative spend per customer; sequential
    * per-partition sum is order-deterministic, so doubles match exactly. */
  private val q27: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey", $"o_orderkey", $"running_spend")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** W9: explicit frame spec (rowsBetween) — absent from the reference
    * but part of the engine surface: 7-row trailing moving average over
    * the daily event-count series. */
  private val q71: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"day").rowsBetween(-6, 0)
    daily
      .select(date_format($"day", "yyyy-MM-dd").as("day"), $"n",
        round(avg($"n").over(w), 4).as("ma7"))
      .orderBy($"day")
  }

  /** Rank-family completion: ntile deciles + percent_rank + cume_dist
    * over customer balances (identical definitions in DuckDB). The
    * un-partitioned `Window.orderBy` form would route all 15M×SF customers
    * through ONE task; instead [[graft.functions.DistributedRank]] does a
    * two-pass range-partitioned row_number and the three rank functions
    * derive arithmetically (the ordering key is unique). */
  private val q73: Q = (s, d) => {
    import s.implicits._
    val ranked = graft.functions.DistributedRank.withRowNumberAndTotal(
      Tables.customer(s, d).select($"c_custkey", $"c_acctbal"),
      "rn", "n_total", $"c_acctbal", $"c_custkey")
    ranked
      .select($"c_acctbal",
        // long to match DuckDB ntile()'s BIGINT — the r7 width-skew audit
        graft.functions.DistributedRank.ntileOf($"rn", $"n_total", 10)
          .cast("long").as("decile"),
        round(graft.functions.DistributedRank.percentRankOf($"rn", $"n_total"), 6).as("pr"),
        round(graft.functions.DistributedRank.cumeDistOf($"rn", $"n_total"), 6).as("cd"))
      .groupBy($"decile")
      .agg(
        count(lit(1)).as("n"),
        round(min($"c_acctbal"), 2).as("lo"),
        round(max($"c_acctbal"), 2).as("hi"),
        round(max($"pr"), 6).as("max_pr"),
        round(max($"cd"), 6).as("max_cd"))
      .orderBy($"decile")
  }

  val queries: Map[String, Q] = Map(
    "q71_moving_avg" -> q71,
    "q73_rank_family" -> q73,
    "q20_lead_session" -> q20,
    "q21_lead_default" -> q21,
    "q22_first_value" -> q22,
    "q23_max_over_filter" -> q23,
    "q24_rownum_latest" -> q24,
    "q25_denserank_topn" -> q25,
    "q26_rank" -> q26,
    "q27_running_sum" -> q27
  )

  val oracle: Map[String, String] = Map(
    "q73_rank_family" ->
      """WITH r AS (SELECT c_custkey, c_acctbal,
        |    ntile(10) OVER w AS decile,
        |    round(percent_rank() OVER w, 6) AS pr,
        |    round(cume_dist() OVER w, 6) AS cd
        |  FROM customer
        |  WINDOW w AS (ORDER BY c_acctbal, c_custkey))
        |SELECT decile, count(*) AS n,
        |  round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi,
        |  round(max(pr), 6) AS max_pr, round(max(cd), 6) AS max_cd
        |FROM r GROUP BY decile ORDER BY decile""".stripMargin,
    "q71_moving_avg" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, n,
        |  round(avg(n) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        |FROM daily ORDER BY day""".stripMargin,
    "q20_lead_session" ->
      """SELECT user_id, CAST(sum(gap_us) AS BIGINT) AS active_us, count(*) AS n_gaps
        |FROM (SELECT user_id,
        |        lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id)
        |          - epoch_us(ts) AS gap_us
        |      FROM events)
        |WHERE gap_us IS NOT NULL AND gap_us < 1800 * 1000000
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q21_lead_default" ->
      """SELECT event_type, next_type, count(*) AS n
        |FROM (SELECT event_type,
        |        coalesce(lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id), 'END') AS next_type
        |      FROM events)
        |GROUP BY event_type, next_type ORDER BY event_type, next_type""".stripMargin,
    "q22_first_value" ->
      """SELECT DISTINCT user_id,
        |  first_value(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS anchor_us,
        |  first_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS anchor_type
        |FROM events ORDER BY user_id""".stripMargin,
    "q23_max_over_filter" ->
      """SELECT user_id, event_type AS last_type, value AS last_value
        |FROM (SELECT *, max(event_id) OVER (PARTITION BY user_id) AS last_id FROM events)
        |WHERE event_id = last_id ORDER BY user_id""".stripMargin,
    "q24_rownum_latest" ->
      """SELECT user_id, event_type AS top_type, value AS top_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q25_denserank_topn" ->
      """SELECT event_type, user_id, spend, rnk FROM
        |  (SELECT event_type, user_id, spend,
        |     CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY spend DESC, user_id) AS INT) AS rnk
        |   FROM (SELECT event_type, user_id, round(sum(value), 2) AS spend
        |         FROM events GROUP BY event_type, user_id))
        |WHERE rnk <= 3 ORDER BY event_type, rnk, user_id""".stripMargin,
    "q26_rank" ->
      """SELECT n_name, s_name, s_acctbal,
        |  CAST(rank() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS rnk
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name, rnk, s_name""".stripMargin,
    "q27_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
