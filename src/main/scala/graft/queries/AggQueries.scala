package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Aggregation operators — SURVEY §2.4 (A1–A18).
  *
  * Re-expresses the reference's HiveQL hash-aggregations (e.g. the play-
  * segment merge at `etl/RunLogParser.scala:401-411` and the user-tier
  * segmentation at `homed/repots/ChannelReport.scala:166-180`) over the
  * harness tables. All aggregates run as partial (map-side) + final hash
  * aggregation — one shuffle per group-by, no more.
  *
  * Scale notes (100 TB): every query here is a single-exchange hash
  * aggregate; the exact-distinct paths (q02, q07) are the only ones whose
  * per-group state grows with cardinality — q08 is the sketch-based
  * (HyperLogLog++) alternative the reference lacked (SURVEY H-4).
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

  /** A2/A4: exact UV+PV per group (`homed/repots/ChannelReport.scala:158-164`).
    * countDistinct = two-phase partial dedup then count; at 100 TB prefer q08. */
  private val q02: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("uv"),
        count(lit(1)).as("pv"),
        round(sum($"value"), 2).as("total_value"))
      .orderBy($"event_type")
  }

  /** A5/A14: two-level agg + conditional-sum tiers
    * (`homed/repots/ChannelReport.scala:166-180` browse/hobby/steady buckets). */
  private val q03: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      // round before the tier compare: a per-user sum landing exactly on
      // a boundary must not flip tiers on partial-agg summation order
      .agg(round(sum($"value"), 4).as("v"))
      .agg(
        sum(when($"v" < 100, 1L).otherwise(0L)).as("tier_light"),
        sum(when($"v" >= 100 && $"v" < 500, 1L).otherwise(0L)).as("tier_mid"),
        sum(when($"v" >= 500, 1L).otherwise(0L)).as("tier_heavy"),
        count(lit(1)).as("n_users"))
  }

  /** A6/A13: collect_set + sorted concat_ws (top-N source merge,
    * `etl/UserAgregate.scala:113-120`); dedup-in-agg replaces the
    * reference's post-agg `merge` UDF with native array ops. */
  private val q04: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"lang")
      .agg(
        concat_ws(",", array_sort(collect_set($"source"))).as("sources"),
        size(collect_set($"source")).cast("long").as("n_sources"))
      .orderBy($"lang")
  }

  /** A7 (H-3 determinised): representative-per-group via min_by — replaces
    * the reference's nondeterministic `first()` (`OnlineUsersAndTimeNew.scala:450-457`). */
  private val q05: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        min_by($"value", $"event_id").as("first_value"),
        min($"event_id").as("first_event"))
      .orderBy($"event_type")
  }

  /** A9/A10: keep-latest argmax per key (heartbeat dedup,
    * `homed/realtime/ChannelLive.scala:238-244`) via max_by on a unique
    * monotone key — no window, single agg exchange. */
  private val q06: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id")
      .agg(
        max_by($"event_type", $"event_id").as("last_type"),
        max($"event_id").as("last_event"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** A8: exact distinct user sets per group (`LiveChannelStatistics.scala:522-546`
    * `t_user_array_by_day`). The set is serialized to a sorted CSV string —
    * a scalar every harness can sort/hash (a raw ArrayType cell cannot be
    * hashed by pandas) — with the cardinality alongside.
    * At 100 TB this is the memory-risk operator — q08 is the sketch path. */
  private val q07: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        concat_ws(",", array_sort(collect_set($"user_id"))).as("users"),
        size(collect_set($"user_id")).cast("long").as("n_users"))
      .orderBy($"event_type")
  }

  /** A8 sketch path (SURVEY H-4): HyperLogLog++ UV — constant memory per
    * group at any scale. No DuckDB oracle (sketch internals differ);
    * driver records rows>0. */
  private val q08: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("approx_uv"))
      .orderBy($"event_type")
  }

  /** A18: weighted-score aggregation (star heat, `rank/reports/StarRankWeek.scala:84-135`).
    * Integer weights: fractional weights (e.g. 0.5) over 2-decimal money put
    * the score exactly on a .xx5 rounding boundary, where Spark (HALF_UP on
    * shortest-repr BigDecimal) and DuckDB (C round on scaled double) disagree. */
  private val q09: Q = (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val n = Tables.nation(s, d)
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        round(
          sum($"o_totalprice") * lit(2.0)
            + count(lit(1)) * lit(30.0)
            + countDistinct($"c_custkey") * lit(100.0), 2).as("heat"),
        count(lit(1)).as("n_orders"))
      .orderBy($"n_name")
  }

  /** A16: multi-grain via ROLLUP — replaces the reference's ~40 re-run-per-
    * grain jobs (`LiveChannelStatistics.scala:176-223`) with one pass. */
  private val q10: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("flag"),
        coalesce($"l_linestatus", lit("ALL")).as("status"),
        $"sum_qty", $"n")
      .orderBy($"flag", $"status")
  }

  /** A8 via a custom typed Aggregator (SURVEY H-4): exact distinct user
    * sets per event_type through [[graft.functions.StringSetUnion]] —
    * Catalyst partial aggregation with a HashSet buffer, the managed
    * replacement for the reference's RDD `reduceByKey(Set ++ Set)`
    * (`LiveChannelStatistics.scala:522-546`). Output = set size plus the
    * sorted set's endpoints, all DuckDB-checkable. */
  private val q61: Q = (s, d) => {
    import s.implicits._
    val setUnion = udaf(new graft.functions.StringSetUnion)
    Tables.events(s, d)
      .select($"event_type", $"user_id".cast("string").as("uid"))
      .groupBy($"event_type")
      .agg(setUnion($"uid").as("users"))
      .select($"event_type",
        size($"users").cast("long").as("n_users"),
        element_at($"users", 1).as("first_user"),
        element_at($"users", -1).as("last_user"))
      .orderBy($"event_type")
  }

  /** Exact percentiles (training-data quality-score distributions; the
    * sketch alternative at scale is approx_percentile). Spark's
    * `percentile` and DuckDB's `quantile_cont` share the linear-
    * interpolation definition, so values match exactly after round(4). */
  private val q69: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"))
      .orderBy($"event_type")
  }

  /** Mergeable quantile SKETCH — the percentile path that actually runs
    * at 100 TB, where q69's exact `percentile` would buffer every value
    * per group. `approx_percentile` is Spark's Greenwald–Khanna summary:
    * O(1/ε·log(εn)) state per group, map-side partial summaries merged
    * across executors — the same mergeable-sketch contract as the HLL
    * (q08) and Misra–Gries (q164) family members.
    *
    * Oracle strategy: at fixture scale, accuracy=10⁶ puts the sketch in
    * its EXACT regime (rank error ε·n = n/10⁶ < 1 ⇒ no sample is ever
    * compressed away, any merge order), where Spark's rank convention
    * ceil(q·n) is precisely DuckDB's `quantile_disc` — so the whole
    * distributed sketch plumbing hash-matches an exact oracle. The
    * fractions carry a +1e-7 epsilon (0.2500001, …) on BOTH sides:
    * discrete-quantile index conventions can only disagree where q·n is
    * an exact integer (the q189 r6 lesson — version-sensitive in the
    * driver's DuckDB), and the shifted fractions keep q·n off-integer
    * for every n < 10⁷ while picking the identical element everywhere
    * else. The sketch regime (accuracy=10⁴ at sf0.1) is pinned by
    * SketchAccuracySpec's rank-error gate instead — the only claim that
    * survives at scale. */
  private val q182: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        count($"value").as("n"),
        expr("approx_percentile(value, " +
          "array(0.2500001, 0.5000001, 0.7500001, 0.9500001), 1000000)")
          .as("qs"))
      .select($"event_type", $"n",
        round($"qs".getItem(0), 4).as("p25"),
        round($"qs".getItem(1), 4).as("p50"),
        round($"qs".getItem(2), 4).as("p75"),
        round($"qs".getItem(3), 4).as("p95"))
      .orderBy($"event_type")
  }

  /** A16 (cube variant): full cube over (returnflag, linestatus) with
    * grouping ids — the multi-grain generalization the reference ran as
    * separate jobs; NULL group cells are tagged so both engines agree. */
  private val q72: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"l_quantity"), 2).as("sum_qty"),
        grouping_id($"l_returnflag", $"l_linestatus").cast("long").as("gid"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"n", $"sum_qty", $"gid")
      .orderBy($"gid", $"rf", $"ls")
  }

  /** A16 (explicit GROUPING SETS): the exact grain list the reference
    * materializes as separate per-grain jobs/tables
    * (`common/Tables.scala:6-357` `_by_day/_by_week/…` registry), computed
    * in ONE pass via Spark 4's `Dataset.groupingSets` — unlike rollup/cube
    * the set list is arbitrary: here (rf,ls), (rf), (ls), () — and the
    * planner expands+re-aggregates without rescanning the fact. */
  private val q97: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"),
            Seq($"l_returnflag"),
            Seq($"l_linestatus"),
            Seq.empty),
        $"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"l_quantity"), 2).as("sum_qty"),
        grouping_id($"l_returnflag", $"l_linestatus").cast("long").as("gid"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"n", $"sum_qty", $"gid")
      .orderBy($"gid", $"rf", $"ls")
  }

  /** Pivot: event counts per day pivoted into one column per event type
    * (`groupBy().pivot()` with explicit values — the explicit list keeps
    * the schema static, which is what you want at scale: no extra pass
    * to discover pivot values). The reference hand-writes this as CASE
    * sums (A5); the oracle mirrors that form. */
  private val q74: Q = (s, d) => {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy(date_format(to_date($"ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy($"day")
  }

  /** Statistical aggregates: Pearson correlation, sample stddev and
    * variance per group — identical definitions in DuckDB (corr,
    * stddev_samp, var_samp), rounded for cross-engine float parity. */
  private val q75: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
        round(stddev_samp($"l_discount"), 6).as("sd_disc"),
        round(var_samp($"l_tax"), 6).as("var_tax"))
      .orderBy($"l_returnflag")
  }

  /** Skew-safe aggregation through the driver gate: the 5-value
    * event_type key is genuinely hot (each key ≫ one reducer's share),
    * so the plain one-exchange groupBy would funnel ~N/5 rows through
    * single tasks at scale. saltedSum splits each key 16 ways on a
    * user-id salt before combining (integral measure → exactly the
    * direct sum); saltedCountDistinct spreads on the (key, user) tuple
    * itself. The join after is 5 rows. Oracle = the plain GROUP BY —
    * passing means the salted decomposition is invisible in the result. */
  private val q88: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select($"event_type",
      floor($"value").cast("long").as("v"), $"user_id")
    val sums = graft.functions.SkewUtils
      .saltedSum(ev, Seq("event_type"), "v", saltSource = Seq("user_id"))
    val uv = graft.functions.SkewUtils
      .saltedCountDistinct(ev, Seq("event_type"), "user_id")
    sums.join(uv, Seq("event_type"))
      .select($"event_type", $"sum_v", $"n_distinct_user_id".as("n_users"))
      .orderBy($"event_type")
  }

  /** Grouped exact top-k via the typed heap Aggregator
    * ([[graft.functions.TopKAggregator]]): top-3 users per event_type by
    * exact spend cents. The window row_number form (the oracle) shuffles
    * every row; this reduces each task's slice of a group to ≤ 3 rows
    * map-side, so the exchange carries O(groups × k). Scores are integer
    * cents — deterministic order, no float tie ambiguity. */
  private val q132: Q = (s, d) => {
    import s.implicits._
    import graft.functions.{ScoredId, TopKAggregator}
    // a null user is not a rankable id and a null value is not spend —
    // mirrored in the oracle (NullInputSpec: unguarded, a null id breaks
    // the non-nullable ScoredId encoder)
    val per = Tables.events(s, d)
      .where($"user_id".isNotNull && $"value".isNotNull)
      .groupBy($"event_type", $"user_id")
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val topk = per
      .select($"event_type",
        struct($"user_id".as("id"), $"cents".as("score")).as("s"))
      .as[(String, ScoredId)]
      .groupByKey(_._1)
      .agg(new TopKAggregator(3).toColumn.name("top"))
    topk.flatMap { case (t, hits) =>
      hits.iterator.zipWithIndex.map { case (h, i) => (t, (i + 1).toLong, h.id, h.score) }
    }.toDF("event_type", "rnk", "user_id", "cents")
      .orderBy($"event_type", $"rnk")
  }

  /** One-scan table profile of `orders` (q205 —
    * [[graft.operators.TableProfiler]]): per-column null counts, exact
    * cardinalities and typed ranges from a single aggregate (Catalyst
    * Expand fuses the multi-countDistinct into one pass — the K-scans-
    * for-one economy of q180 applied to warehouse stats; at 100 TB the
    * exact distincts swap for approx_count_distinct, same plan). */
  private val q205: Q = (s, d) => {
    import s.implicits._
    graft.operators.TableProfiler.profile(Tables.orders(s, d))
  }

  val queries: Map[String, Q] = Map(
    "q205_table_profile" -> q205,
    "q132_topk_agg" -> q132,
    "q88_salted_agg" -> q88,
    "q61_set_union_agg" -> q61,
    "q69_percentiles" -> q69,
    "q182_quantile_sketch" -> q182,
    "q72_cube" -> q72,
    "q97_grouping_sets" -> q97,
    "q74_pivot" -> q74,
    "q75_stats" -> q75,
    "q01_agg" -> q01,
    "q02_count_distinct" -> q02,
    "q03_cond_sum_tiers" -> q03,
    "q04_collect_set" -> q04,
    "q05_min_by" -> q05,
    "q06_argmax_latest" -> q06,
    "q07_user_sets" -> q07,
    "q08_approx_uv" -> q08,
    "q09_weighted_score" -> q09,
    "q10_rollup" -> q10
  )

  val oracle: Map[String, String] = Map(
    "q205_table_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  round(CAST(min($c) AS DOUBLE), 4) AS min_num,
           |  round(CAST(max($c) AS DOUBLE), 4) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', count(*),
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  CAST(count(DISTINCT $c) AS BIGINT),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           |  min($c), max($c)
           |FROM orders""".stripMargin
      def ts(c: String) =
        s"""SELECT '$c', count(*),
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  CAST(count(DISTINCT $c) AS BIGINT),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           |  strftime(min($c), '%Y-%m-%d %H:%M:%S'),
           |  strftime(max($c), '%Y-%m-%d %H:%M:%S')
           |FROM orders""".stripMargin
      Seq(num("o_custkey"), ts("o_orderdate"), num("o_orderkey"),
        str("o_orderpriority"), str("o_orderstatus"), num("o_totalprice"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "q132_topk_agg" ->
      """WITH per AS (
        |  SELECT event_type, user_id,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY event_type, user_id),
        |r AS (
        |  SELECT event_type, user_id, cents,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY cents DESC, user_id) AS rnk
        |  FROM per)
        |SELECT event_type, rnk, user_id, cents FROM r
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,
    "q88_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q75_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_extendedprice, l_quantity), 6) AS corr_qty_price,
        |  round(stddev_samp(l_discount), 6) AS sd_disc,
        |  round(var_samp(l_tax), 6) AS var_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q74_pivot" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q72_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,
    "q97_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rf, ls""".stripMargin,
    "q182_quantile_sketch" ->
      """SELECT event_type, count(value) AS n,
        |  round(quantile_disc(value, 0.2500001), 4) AS p25,
        |  round(quantile_disc(value, 0.5000001), 4) AS p50,
        |  round(quantile_disc(value, 0.7500001), 4) AS p75,
        |  round(quantile_disc(value, 0.9500001), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q69_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.25), 4) AS p25,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q61_set_union_agg" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  min(CAST(user_id AS VARCHAR)) AS first_user,
        |  max(CAST(user_id AS VARCHAR)) AS last_user
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_count_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS uv,
        |  count(*) AS pv,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q03_cond_sum_tiers" ->
      """SELECT
        |  CAST(sum(CASE WHEN v < 100 THEN 1 ELSE 0 END) AS BIGINT) AS tier_light,
        |  CAST(sum(CASE WHEN v >= 100 AND v < 500 THEN 1 ELSE 0 END) AS BIGINT) AS tier_mid,
        |  CAST(sum(CASE WHEN v >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS tier_heavy,
        |  count(*) AS n_users
        |FROM (SELECT user_id, round(sum(value), 4) AS v FROM events
        |      WHERE event_type = 'purchase' GROUP BY user_id)""".stripMargin,
    "q04_collect_set" ->
      """SELECT lang,
        |  string_agg(source, ',' ORDER BY source) AS sources,
        |  count(*) AS n_sources
        |FROM (SELECT DISTINCT lang, source FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q05_min_by" ->
      """SELECT event_type,
        |  min_by(value, event_id) AS first_value,
        |  min(event_id) AS first_event
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q06_argmax_latest" ->
      """SELECT user_id,
        |  max_by(event_type, event_id) AS last_type,
        |  max(event_id) AS last_event,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q07_user_sets" ->
      """SELECT event_type,
        |  string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS users,
        |  count(*) AS n_users
        |FROM (SELECT DISTINCT event_type, user_id FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q09_weighted_score" ->
      """SELECT n_name,
        |  round(sum(o_totalprice) * 2.0 + count(*) * 30.0
        |        + count(DISTINCT c_custkey) * 100.0, 2) AS heat,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin
  )
}
