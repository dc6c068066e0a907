package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar-function operators — SURVEY §2.8 (string / date / math / map-array
  * / json / conditional / domain id-decoding).
  *
  * The reference used all of these inside HiveQL strings (citations per
  * query); here they are codegen'd Column expressions — every query below
  * stays inside WholeStageCodegen (no UDFs), so at 100 TB they run at scan
  * speed and all filters/projections push into the parquet reader.
  */
object FunctionQueries extends QueryPack {

  /** String functions (`homed/repots/DemandReport.scala:136` regexp_replace,
    * `ChannelReport.scala:223-227` concat, `etl/MysqlToHive.scala:42` substr).
    * First/last word extraction + case/length arithmetic per language. */
  private val q34: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        $"lang",
        regexp_extract(trim($"text"), "^(\\S+)", 1).as("first_word"),
        length(trim($"text")).cast("long").as("len"),
        upper(substring(trim($"text"), 1, 3)).as("pre3"))
      .groupBy($"lang", $"first_word")
      .agg(
        count(lit(1)).as("n"),
        sum($"len").as("total_len"),
        min($"pre3").as("min_pre3"))
      .filter($"n" >= 3)
      .orderBy($"lang", $"first_word")
  }

  /** Date/time functions (joda `utils/DateUtils.scala` 424 LoC replaced by
    * native exprs): trunc-to-week, month bucket, hour, datediff from epoch
    * day of the dataset. */
  private val q35: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(
        date_format(date_trunc("week", $"ts"), "yyyy-MM-dd").as("week_start"),
        date_format($"ts", "yyyy-MM").as("month"),
        hour($"ts").cast("int").as("hr"),
        datediff(to_date($"ts"), to_date(lit("2024-01-01"))).cast("long").as("day_no"),
        $"value")
      .groupBy($"week_start", $"month")
      .agg(
        count(lit(1)).as("n"),
        min($"hr").as("min_hr"),
        max($"hr").as("max_hr"),
        max($"day_no").as("max_day_no"),
        round(sum($"value"), 2).as("total_value"))
      .orderBy($"week_start", $"month")
  }

  /** Math functions (`LiveChannelStatistics.scala:195` round, `PlayCount.scala`
    * floor/ceil, abs + integer bucketing arithmetic). */
  private val q36: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(
        (floor($"l_quantity" / 10) * 10).cast("long").as("qty_bucket"),
        ceil($"l_extendedprice" / 1000).cast("long").as("price_k"),
        // integer basis-point deviation: discounts are 2-decimal, so the
        // per-group sum is exact and the single closing division is the
        // only float op — round(avg(double)) would flip on 1-ulp
        // engine-order differences (the q19 lesson)
        round(abs($"l_discount" - 0.05) * 100).cast("long").as("disc_dev_c"))
      .groupBy($"qty_bucket")
      .agg(
        count(lit(1)).as("n"),
        min($"price_k").as("min_price_k"),
        max($"price_k").as("max_price_k"),
        round(sum($"disc_dev_c") / (count(lit(1)) * 100.0), 4).as("avg_disc_dev"))
      .orderBy($"qty_bucket")
  }

  /** JSON access (`DemandPackage.scala:270-271` get_json_object; S2 JSON
    * source) — pull `k` out of the events.props JSON payload. */
  private val q37: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** Map build + access (`etl/LogParser.scala:96` str_to_map(concat_ws(...)),
    * `RunLogParser.scala:156-165` logMap['DeviceId']): round-trip columns
    * through a serialized k:v string and a MapType column. */
  private val q38: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(concat(
        lit("flag:"), $"l_returnflag",
        lit("|status:"), $"l_linestatus",
        lit("|qty:"), $"l_quantity".cast("int").cast("string")).as("kv"))
      .select(expr("str_to_map(kv, '\\\\|', ':')").as("m"))
      .select(
        element_at($"m", "flag").as("flag"),
        element_at($"m", "status").as("status"),
        element_at($"m", "qty").cast("long").as("qty"))
      .groupBy($"flag", $"status")
      .agg(count(lit(1)).as("n"), sum($"qty").as("sum_qty"))
      .orderBy($"flag", $"status")
  }

  /** sequence + explode (replaces `utils/LogUtils.scala:25-53` divideTime
    * loop): explode each order into its covered days (4-day horizon), count
    * open orders per day — the lateral-view pattern
    * (`DemandPackage.scala:270-283`) as a generator. */
  private val q39: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_totalprice",
        explode(sequence(to_date($"o_orderdate"),
          date_add(to_date($"o_orderdate"), 3))).as("day"))
      .groupBy(date_format($"day", "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("open_order_days"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"month")
  }

  /** Conditional projections (`realtime/ProgramDemand.scala:94-98` nvl/if,
    * `etl/LogParser.scala:97` CASE WHEN device normalization). */
  private val q40: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(
        when($"value" < 50, "low")
          .when($"value" < 200, "mid")
          .otherwise("high").as("tier"),
        when($"event_type".isin("click", "view"), "browse")
          .otherwise("action").as("family"),
        $"value")
      .groupBy($"tier", $"family")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"tier", $"family")
  }

  /** Domain id-range decoding (`utils/IDRangeUtils.scala:34-80`,
    * `etl/ReportLog.scala:424-445` device ranges; P11 between-filters):
    * numeric-range classifier as a when-chain, fully codegen'd. */
  private val q41: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        when($"o_orderkey" % 100 < 10, "system")
          .when($"o_orderkey" % 100 < 40, "retail")
          .when($"o_orderkey" % 100 < 80, "wholesale")
          .otherwise("partner").as("key_class"),
        $"o_custkey".between(100, 700).as("core_cust"),
        $"o_totalprice")
      .groupBy($"key_class", $"core_cust")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"key_class", $"core_cust")
  }

  /** Benford first-digit audit: the leading-digit distribution of
    * order totals against Benford's law (p(d) = log10(1 + 1/d)) with
    * per-digit χ² contributions — the classic anomaly screen for
    * fabricated/synthetic numeric columns (a flat or spiked leading
    * digit outs generated data; TPC-H prices are uniform-ish, and the
    * audit SHOWS that — the oracle proves the computation, not
    * conformance). Counts are exact integers; log10 enters once per
    * output row, so libm ulp noise sits 12 digits below the rounding.
    *
    * Scale shape: one narrow scan → 9-group hash agg; the total
    * arrives by broadcast 1-row crossJoin (lazy, no driver count). */
  private val q153: Q = (s, d) => {
    import s.implicits._
    val digits = Tables.orders(s, d)
      .select(substring(floor($"o_totalprice").cast("long").cast("string"),
        1, 1).as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum($"n_obs").as("n_tot"))
    digits.crossJoin(broadcast(tot))
      .withColumn("exp_n",
        $"n_tot" * log10(lit(1.0) + lit(1.0) / $"digit".cast("double")))
      .select($"digit", $"n_obs",
        round($"exp_n", 2).as("benford_n"),
        round(($"n_obs" - $"exp_n") * ($"n_obs" - $"exp_n") / $"exp_n", 4)
          .as("chi2_term"))
      .orderBy($"digit")
  }

  val queries: Map[String, Q] = Map(
    "q153_benford" -> q153,
    "q34_string_funcs" -> q34,
    "q35_date_funcs" -> q35,
    "q36_math_funcs" -> q36,
    "q37_json_access" -> q37,
    "q38_str_to_map" -> q38,
    "q39_sequence_explode" -> q39,
    "q40_conditional" -> q40,
    "q41_id_ranges" -> q41
  )

  val oracle: Map[String, String] = Map(
    "q153_benford" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |           AS VARCHAR), 1, 1) AS digit,
        |         count(*) AS n_obs
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(n_obs) AS n_tot FROM d)
        |SELECT digit, n_obs,
        |  round(n_tot * log10(1 + 1.0::DOUBLE / digit::DOUBLE), 2)
        |    AS benford_n,
        |  round((n_obs - n_tot * log10(1 + 1.0::DOUBLE / digit::DOUBLE))
        |    * (n_obs - n_tot * log10(1 + 1.0::DOUBLE / digit::DOUBLE))
        |    / (n_tot * log10(1 + 1.0::DOUBLE / digit::DOUBLE)), 4)
        |    AS chi2_term
        |FROM d CROSS JOIN t ORDER BY digit""".stripMargin,
    "q34_string_funcs" ->
      """SELECT lang, first_word, count(*) AS n,
        |  CAST(sum(len) AS BIGINT) AS total_len, min(pre3) AS min_pre3
        |FROM (SELECT lang,
        |        regexp_extract(trim(text), '^(\S+)', 1) AS first_word,
        |        length(trim(text)) AS len,
        |        upper(substr(trim(text), 1, 3)) AS pre3
        |      FROM documents)
        |GROUP BY lang, first_word HAVING count(*) >= 3
        |ORDER BY lang, first_word""".stripMargin,
    "q35_date_funcs" ->
      """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
        |  strftime(ts, '%Y-%m') AS month,
        |  count(*) AS n,
        |  CAST(min(hour(ts)) AS INT) AS min_hr,
        |  CAST(max(hour(ts)) AS INT) AS max_hr,
        |  CAST(max(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))) AS BIGINT) AS max_day_no,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY week_start, month""".stripMargin,
    "q36_math_funcs" ->
      """SELECT CAST(floor(l_quantity / 10) * 10 AS BIGINT) AS qty_bucket,
        |  count(*) AS n,
        |  CAST(min(ceil(l_extendedprice / 1000)) AS BIGINT) AS min_price_k,
        |  CAST(max(ceil(l_extendedprice / 1000)) AS BIGINT) AS max_price_k,
        |  round(CAST(sum(CAST(round(abs(l_discount - 0.05) * 100) AS BIGINT)) AS DOUBLE)
        |    / (count(*) * 100.0), 4) AS avg_disc_dev
        |FROM lineitem GROUP BY 1 ORDER BY qty_bucket""".stripMargin,
    "q37_json_access" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q38_str_to_map" ->
      """SELECT l_returnflag AS flag, l_linestatus AS status,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY flag, status""".stripMargin,
    "q39_sequence_explode" ->
      """SELECT strftime(day, '%Y-%m') AS month,
        |  count(*) AS open_order_days,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM (SELECT o_orderkey,
        |        unnest(generate_series(CAST(o_orderdate AS DATE),
        |                               CAST(o_orderdate AS DATE) + 3, INTERVAL 1 DAY)) AS day
        |      FROM orders)
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "q40_conditional" ->
      """SELECT CASE WHEN value < 50 THEN 'low'
        |            WHEN value < 200 THEN 'mid' ELSE 'high' END AS tier,
        |  CASE WHEN event_type IN ('click','view') THEN 'browse' ELSE 'action' END AS family,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY tier, family""".stripMargin,
    "q41_id_ranges" ->
      """SELECT CASE WHEN o_orderkey % 100 < 10 THEN 'system'
        |            WHEN o_orderkey % 100 < 40 THEN 'retail'
        |            WHEN o_orderkey % 100 < 80 THEN 'wholesale'
        |            ELSE 'partner' END AS key_class,
        |  o_custkey BETWEEN 100 AND 700 AS core_cust,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY key_class, core_cust""".stripMargin
  )
}
