package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Join operators — SURVEY §2.3 (J1–J13).
  *
  * The reference's identity/enrichment joins (device↔CA↔DA at
  * `etl/CaGetDa.scala:15-21`, region enrichment at `etl/LogParser.scala:263-270`,
  * the EPG range join at `homed/repots/ChannelReport.scala:68-73`) re-expressed
  * as declarative Dataset joins so Catalyst picks broadcast vs shuffled-hash
  * vs sort-merge, with AQE re-planning skew at runtime.
  *
  * Scale notes: dimension sides (region/nation/customer at dim-scale) are
  * broadcast — verified in PlanAssertSpec by asserting on the physical plan.
  * The fact-fact joins shuffle on their equi keys only; the range join (q18)
  * keeps an equi key so it plans as a hash join with a post-filter, NOT a
  * broadcast-nested-loop — the difference between hours and seconds at 100 TB.
  */
object JoinQueries extends QueryPack {

  /** J1+J8: star join, dims broadcast (`etl/CaGetDa.scala:15-21` inner chain). */
  private val q11: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"r_name")
  }

  /** J2+P8: left outer + coalesce default on miss
    * (`etl/LogParser.scala:263-270` region default). */
  private val q12: Q = (s, d) => {
    import s.implicits._
    val perCust = Tables.orders(s, d)
      .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"), sum($"o_totalprice").as("spend"))
    Tables.customer(s, d)
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_mktsegment")
      .agg(
        sum(coalesce($"cnt", lit(0L))).as("orders"),
        round(sum(coalesce($"spend", lit(0.0))), 2).as("spend"),
        sum(when($"cnt".isNull, 1L).otherwise(0L)).as("inactive_customers"),
        count(lit(1)).as("customers"))
      .orderBy($"c_mktsegment")
  }

  /** J4: right outer (`homed/repots/LiveChannelStatistics.scala:149`). */
  private val q13: Q = (s, d) => {
    import s.implicits._
    Tables.supplier(s, d)
      .join(Tables.nation(s, d), $"s_nationkey" === $"n_nationkey", "right")
      .groupBy($"n_name")
      .agg(count($"s_suppkey").as("n_suppliers"))
      .orderBy($"n_name")
  }

  /** J5+R5: full outer + nvl-coalesced merge (realtime demand merge,
    * `realtime/ProgramDemand.scala:90-98`). */
  private val q14: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val purchases = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(count(lit(1)).as("p"))
    val clicks = e.filter($"event_type" === "click")
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
    purchases.join(clicks, Seq("user_id"), "full")
      .select(
        $"user_id",
        coalesce($"p", lit(0L)).as("purchases"),
        coalesce($"c", lit(0L)).as("clicks"),
        (coalesce($"p", lit(0L)) + coalesce($"c", lit(0L))).as("total"))
      .orderBy($"user_id")
  }

  /** J6: multi-key equi-join (5-col join at `LiveChannelStatistics.scala:394-397`). */
  private val q15: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"user_id", date_format($"ts", "yyyy-MM-dd").as("day"),
        // long to match DuckDB hour()'s BIGINT — the r7 width-skew audit
        hour($"ts").cast("long").as("hr"), $"event_type", $"value")
    val views = e.filter($"event_type" === "view")
      .groupBy($"user_id", $"day", $"hr").agg(count(lit(1)).as("views"))
    val clicks = e.filter($"event_type" === "click")
      .groupBy($"user_id", $"day", $"hr").agg(count(lit(1)).as("clicks"))
    views.join(clicks, Seq("user_id", "day", "hr"))
      .orderBy($"user_id", $"day", $"hr")
  }

  /** J10: left semi (homed-user filter, `etl/UserAgregate.scala:139` —
    * the reference faked it with inner+select; left_semi avoids the
    * duplicate-amplification and carries no right-side columns). */
  private val q16: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("active_customers"))
      .orderBy($"c_mktsegment")
  }

  /** J11: left anti (`etl/RunLogParser.scala:84` whole-row except → key anti).
    * Right side filtered to high-value orders so the anti set is non-empty
    * at every sf (every custkey has some order in the fixtures). */
  private val q17: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter($"o_totalprice" > 400000.0),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("no_big_order_customers"))
      .orderBy($"c_mktsegment")
  }

  /** J7: range join WITH an equi key (EPG attach,
    * `homed/repots/ChannelReport.scala:68-73`) — equi key keeps it a hash
    * join + filter instead of a BNLJ. */
  private val q18: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), round(sum($"l_quantity"), 2).as("qty"))
      .orderBy($"o_orderpriority")
  }

  /** J9: manual broadcast of a dim (replaces the reference's collect()+
    * HashMap-broadcast lookup, `homed/realtime/ChannelLive.scala:68-105` —
    * planner-visible broadcast join instead of a closure). */
  private val q19: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"),
        // exact integer cents, no closing division: round(avg(double))
        // flips on 1-ulp engine-order noise AND on .xx5 display-round
        // boundaries (both observed at sf0.001) — an integer sum has
        // neither failure mode, and the consumer divides if it wants
        sum(round($"c_acctbal" * 100).cast("long")).as("sum_bal_cents"))
      .orderBy($"n_name")
  }

  /** J13: as-of join — attach to every 'error' event the most recent
    * preceding 'click' of the same user. Composed from built-ins per the
    * preference order: union the tagged streams, propagate the last click
    * time with a running last_value window, filter to errors. One shuffle
    * on user_id, no range scan — the window formulation is the 100 TB
    * path (DuckDB states the oracle with its native ASOF JOIN). */
  private val q68: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .where($"event_type".isin("click", "error"))
      .select($"user_id", $"event_id", $"ts", $"event_type")
    // at equal ts, clicks must sort BEFORE errors so the running
    // last_value carries an equal-ts click — matching ASOF's e.ts >= c.ts
    // inclusive semantics regardless of event_id order
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", when($"event_type" === "click", 0).otherwise(1), $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrev = ev
      .withColumn("last_click_sec",
        last(when($"event_type" === "click", unix_timestamp($"ts")), ignoreNulls = true)
          .over(w))
      .where($"event_type" === "error" && $"last_click_sec".isNotNull)
      .select($"user_id",
        (unix_timestamp($"ts") - $"last_click_sec").as("lag_sec"))
    withPrev
      .groupBy(($"user_id" % 10).as("user_bucket"))
      .agg(
        count(lit(1)).as("n_matched"),
        sum($"lag_sec").as("total_lag_sec"),
        max($"lag_sec").as("max_lag_sec"))
      .orderBy($"user_bucket")
  }

  /** Skew-safe salted fact-dim join through the driver gate: lineitem
    * rows are salted on (orderkey, linenumber), part is replicated 8×,
    * and the join runs on (l_partkey, salt) — a hot part key fans out
    * over 8 reducers instead of one. The salt is internal and dropped,
    * so the oracle is the PLAIN join: passing means salting is invisible
    * in the result. Manual salting matters where AQE's skew split can't
    * act (bucketed scans, stream-static joins — see
    * [[graft.functions.SkewUtils.saltedJoin]]); quantity sums stay in
    * integer units so no float op survives. */
  private val q113: Q = (s, d) => {
    import s.implicits._
    val fact = Tables.lineitem(s, d)
      .select($"l_partkey", $"l_orderkey", $"l_linenumber",
        floor($"l_quantity").cast("long").as("qty"))
    val dim = Tables.part(s, d).select($"p_partkey".as("l_partkey"), $"p_brand")
    graft.functions.SkewUtils
      .saltedJoin(fact, dim, Seq("l_partkey"),
        spreadCols = Seq("l_orderkey", "l_linenumber"), buckets = 8)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"), sum($"qty").as("sum_qty"))
      .orderBy($"p_brand")
  }

  /** Bloom-pruned semi-join (explicit runtime filter): prune lineitem to
    * the orderkeys of urgent high-value orders. The dim key set at 100 TB
    * is too big for an exact broadcast set, so a constant-size bloom
    * sketch drops non-joining fact rows inside the scan stage before the
    * shuffle; the exact semi-join then strips the ~3% false positives.
    * Oracle is the plain semi-join — passing proves the bloom invisible
    * in the result, like q113 proves the salt invisible. */
  private val q128: Q = (s, d) => {
    import s.implicits._
    val dim = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 150000.0)
      .select($"o_orderkey")
    graft.operators.BloomJoin
      .prunedSemiJoin(Tables.lineitem(s, d), "l_orderkey", dim, "o_orderkey",
        estItems = 100000L)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(floor($"l_quantity")).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("revenue"))
      .orderBy($"l_returnflag")
  }

  /** Interval-OVERLAP self-join without an equi key — incident
    * clustering over error windows ([ts, ts+30 min)): which pairs of
    * error intervals overlap, per day. Spark has no native interval
    * join; the naive formulation (`a.st < b.en && b.st < a.en`) plans
    * as a BroadcastNestedLoop / cartesian — O(n²) comparisons, dead at
    * scale. The scalable shape is BUCKET DECOMPOSITION: explode each
    * interval into the fixed-width time buckets it touches (≤ 2 here,
    * since duration ≤ bucket width), equi-join on the bucket, and count
    * each pair exactly once by keeping only the bucket that contains
    * the overlap's start (`b = floor(greatest(st_a, st_b) / width)`) —
    * no distinct needed. One exchange on the bucket key; comparisons
    * bounded by per-bucket density², not corpus². The parameterized
    * operator is [[graft.operators.IntervalJoin.overlapJoin]]
    * (property-proven equal to the naive join at any width); the
    * DuckDB oracle here states the naive inequality join — passing
    * proves the decomposition exact on real data too.
    *
    * Scale note: bucket width should track the p99 interval duration;
    * long-tail intervals explode into more buckets (rows ∝ duration /
    * width) but never break once-per-pair counting, because the
    * overlap-start bucket is unique per pair. */
  private val q147: Q = (s, d) => {
    import s.implicits._
    val iv = Tables.events(s, d)
      .where($"event_type" === "error")
      .select($"event_id".as("id"), unix_timestamp($"ts").as("st"))
      .withColumn("en", $"st" + 1800L)
    graft.operators.IntervalJoin.overlapJoin(iv, iv, "st", "en", 3600L)
      .where($"l_id" < $"r_id")
      .select(
        from_unixtime(greatest($"l_st", $"r_st"), "yyyy-MM-dd").as("day"),
        (least($"l_en", $"r_en") - greatest($"l_st", $"r_st")).as("ov"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"ov").as("overlap_sec"),
        max($"ov").as("max_overlap"))
      .orderBy($"day")
  }

  /** The OPTIMIZER-RULE path of q147: a user keeps writing the naive
    * inequality-only overlap SQL (`a.st < b.en AND b.st < a.en` — the
    * HiveQL shape the reference's interval reports use, e.g. channel
    * play-window overlap in `homed/repots/ChannelReport.scala:68-73`)
    * and [[graft.plans.OverlapJoinRewrite]] — installed here exactly as
    * a cluster installs it through `GraftExtensions` — rewrites it to
    * the bucketed equi join q147 builds by hand. Same oracle semantics
    * as q147, so a green row proves the rewrite exact on real data; the
    * plan shape (Generate + hash/merge join, no BNLJ, no residual
    * Union: the `en = st + 1800` projection is constraint-proven
    * bounded) is asserted in OverlapJoinRewriteSpec.
    *
    * Runs in a `newSession()` so the rewrite-forcing confs (broadcast
    * threshold off, so the stats guard sees both sides big even at
    * sf0.001) can't leak into other queries' plans — the returned
    * DataFrame is lazy, so restoring confs before returning would undo
    * them before optimization ever ran.
    *
    * Pair dedup: `a.id != b.id` instead of q147's `a.id < b.id` — a
    * third long-typed strict `<` would be indistinguishable from the
    * interval inequalities to the rewriter (any crossing pair is
    * correct, but [id, en) "intervals" explode into huge bucket
    * ranges); each unordered pair then appears in both orders, so the
    * even sums halve exactly with integer DIV. */
  private val q161: Q = (s0, d) => {
    val s = s0.newSession()
    s.experimental.extraOptimizations = Seq(graft.plans.OverlapJoinRewrite())
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.graft.overlapJoin.bucketWidth", "3600")
    import s.implicits._
    Tables.events(s, d)
      .where($"event_type" === "error")
      .select($"event_id".as("id"), unix_timestamp($"ts").as("st"))
      .withColumn("en", $"st" + 1800L)
      .createOrReplaceTempView("ov_iv")
    s.sql("""
      SELECT from_unixtime(greatest(a.st, b.st), 'yyyy-MM-dd') AS day,
             CAST(count(*) DIV 2 AS BIGINT) AS n_pairs,
             CAST(sum(least(a.en, b.en) - greatest(a.st, b.st)) DIV 2 AS BIGINT)
               AS overlap_sec,
             max(least(a.en, b.en) - greatest(a.st, b.st)) AS max_overlap
      FROM ov_iv a JOIN ov_iv b
        ON a.st < b.en AND b.st < a.en AND a.id != b.id
      GROUP BY 1 ORDER BY day""")
  }

  val queries: Map[String, Q] = Map(
    "q147_overlap_join" -> q147,
    "q161_overlap_rewrite_sql" -> q161,
    "q68_asof_join" -> q68,
    "q113_salted_join" -> q113,
    "q128_bloom_semi_join" -> q128,
    "q11_star_join" -> q11,
    "q12_left_default" -> q12,
    "q13_right_join" -> q13,
    "q14_full_outer_merge" -> q14,
    "q15_multikey_join" -> q15,
    "q16_semi_join" -> q16,
    "q17_anti_join" -> q17,
    "q18_range_join" -> q18,
    "q19_broadcast_join" -> q19
  )

  val oracle: Map[String, String] = Map(
    "q147_overlap_join" ->
      """WITH iv AS (
        |  SELECT event_id AS id,
        |         floor(epoch(ts::TIMESTAMP))::BIGINT AS st,
        |         floor(epoch(ts::TIMESTAMP))::BIGINT + 1800 AS en
        |  FROM events WHERE event_type = 'error')
        |SELECT strftime(make_timestamp(greatest(a.st, b.st) * 1000000),
        |         '%Y-%m-%d') AS day,
        |  count(*) AS n_pairs,
        |  CAST(sum(least(a.en, b.en) - greatest(a.st, b.st)) AS BIGINT)
        |    AS overlap_sec,
        |  CAST(max(least(a.en, b.en) - greatest(a.st, b.st)) AS BIGINT)
        |    AS max_overlap
        |FROM iv a JOIN iv b
        |  ON a.id < b.id AND a.st < b.en AND b.st < a.en
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q161_overlap_rewrite_sql" ->
      """WITH iv AS (
        |  SELECT event_id AS id,
        |         floor(epoch(ts::TIMESTAMP))::BIGINT AS st,
        |         floor(epoch(ts::TIMESTAMP))::BIGINT + 1800 AS en
        |  FROM events WHERE event_type = 'error')
        |SELECT strftime(make_timestamp(greatest(a.st, b.st) * 1000000),
        |         '%Y-%m-%d') AS day,
        |  CAST(count(*) // 2 AS BIGINT) AS n_pairs,
        |  CAST(CAST(sum(least(a.en, b.en) - greatest(a.st, b.st)) AS BIGINT) // 2
        |    AS BIGINT) AS overlap_sec,
        |  CAST(max(least(a.en, b.en) - greatest(a.st, b.st)) AS BIGINT)
        |    AS max_overlap
        |FROM iv a JOIN iv b
        |  ON a.st < b.en AND b.st < a.en AND a.id != b.id
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q128_bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey
        |                AND o_orderpriority = '1-URGENT'
        |                AND o_totalprice > 150000.0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q113_salted_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q11_star_join" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q12_left_default" ->
      """SELECT c_mktsegment,
        |  CAST(sum(coalesce(cnt, 0)) AS BIGINT) AS orders,
        |  round(sum(coalesce(spend, 0.0)), 2) AS spend,
        |  CAST(sum(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS inactive_customers,
        |  count(*) AS customers
        |FROM customer LEFT JOIN
        |  (SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS spend
        |   FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_right_join" ->
      """SELECT n_name, count(s_suppkey) AS n_suppliers
        |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q14_full_outer_merge" ->
      """SELECT user_id,
        |  coalesce(p, 0) AS purchases,
        |  coalesce(c, 0) AS clicks,
        |  coalesce(p, 0) + coalesce(c, 0) AS total
        |FROM (SELECT user_id, count(*) AS p FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |FULL JOIN (SELECT user_id, count(*) AS c FROM events WHERE event_type = 'click' GROUP BY user_id)
        |USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q15_multikey_join" ->
      """SELECT user_id, day, hr, views, clicks FROM
        |  (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, hour(ts) AS hr, count(*) AS views
        |   FROM events WHERE event_type = 'view' GROUP BY 1, 2, 3)
        |JOIN
        |  (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, hour(ts) AS hr, count(*) AS clicks
        |   FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3)
        |USING (user_id, day, hr)
        |ORDER BY user_id, day, hr""".stripMargin,
    "q16_semi_join" ->
      """SELECT c_mktsegment, count(*) AS active_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q17_anti_join" ->
      """SELECT c_mktsegment, count(*) AS no_big_order_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q18_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q19_broadcast_join" ->
      """SELECT n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q68_asof_join" ->
      """WITH clicks AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |errors AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'error'),
        |m AS (SELECT e.user_id,
        |    epoch_ms(e.ts) // 1000 - epoch_ms(c.ts) // 1000 AS lag_sec
        |  FROM errors e ASOF JOIN clicks c
        |    ON e.user_id = c.user_id AND e.ts >= c.ts)
        |SELECT user_id % 10 AS user_bucket, count(*) AS n_matched,
        |  CAST(sum(lag_sec) AS BIGINT) AS total_lag_sec,
        |  CAST(max(lag_sec) AS BIGINT) AS max_lag_sec
        |FROM m GROUP BY 1 ORDER BY user_bucket""".stripMargin
  )
}
