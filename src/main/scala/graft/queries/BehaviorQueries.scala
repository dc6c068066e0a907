package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** User-behavior analytics — the reference's online-user / success-rate /
  * active-user report families, re-expressed as three classic distributed
  * shapes: a concurrency (sweep-line) curve, an ordered conversion funnel,
  * and cohort retention.
  *
  * Reference analogues:
  *   - concurrent online users over time: `homed/realtime/OnlineUsers.scala:61-64`
  *     (count per region/terminal each batch) and
  *     `homed/repots/OnlineRate.scala` / `ChannelUserOnlineAnalytics.scala`
  *     (online counts vs totals per time slot);
  *   - ordered conversion: `homed/general/RecommendSuccessRate.scala:40-53`
  *     (recommend exposure → demand-play match rate);
  *   - daily active/new user censuses: `homed/repots/ActiveAnalysis.scala:55-62`,
  *     `NewAnalysis.scala` (first-seen vs returning users per day).
  *
  * Scale notes (100 TB):
  *   - q98's sweep line collapses deltas per (day, event_type, ts) BEFORE
  *     the running sum, so the window input is one row per distinct
  *     timestamp — the prefix sum itself partitions by (day, stream) and a
  *     day×stream slice is bounded; for an unbounded single stream the
  *     q94 distributed two-pass prefix sum is the drop-in replacement.
  *   - q101 is three hash-agg passes over the fact (one per funnel step),
  *     each shuffling on user_id — no window over the raw events, no
  *     per-user state larger than one timestamp per step.
  *   - q102 shuffles the (user, day) activity grid once on user_id; the
  *     cohort matrix output is O(days × horizon).
  */
object BehaviorQueries extends QueryPack {

  /** Peak concurrent sessions per (day, stream, hour) via a sweep line:
    * per-user daily intervals → ±1 deltas → collapse per timestamp →
    * running sum → max per hour. The reference approximates this with
    * per-batch snapshot counts (`OnlineUsers.scala:61-64`); the sweep line
    * is the exact batch formulation. */
  private val q98: Q = (s, d) => {
    import s.implicits._
    val iv = Tables.events(s, d)
      .groupBy(
        $"user_id",
        date_format($"ts", "yyyy-MM-dd").as("day"),
        $"event_type")
      .agg(min($"ts").as("st"), max($"ts").as("en"))
    val deltas = iv.select(
      $"day", $"event_type",
      explode(array(
        struct($"st".as("t"), lit(1).as("dlt")),
        struct($"en".as("t"), lit(-1).as("dlt")))).as("x"))
      .select($"day", $"event_type", $"x.t".as("t"), $"x.dlt".as("dlt"))
    // collapse ties first: the running sum then has a unique ORDER BY key
    // per partition, so its value is deterministic in both engines
    val collapsed = deltas.groupBy($"day", $"event_type", $"t")
      .agg(sum($"dlt").as("dl"))
    val w = Window.partitionBy($"day", $"event_type").orderBy($"t")
    collapsed
      .withColumn("conc", sum($"dl").over(w))
      .groupBy($"day", $"event_type", hour($"t").cast("bigint").as("hr"))
      .agg(max($"conc").cast("bigint").as("peak"))
      .orderBy($"day", $"event_type", $"hr")
  }

  /** Ordered conversion funnel view → click → purchase: step N's timestamp
    * must be >= step N-1's. Three aggregation passes (min-ts per user per
    * step), each a plain hash agg — the scalable form of the reference's
    * exposure→play match (`RecommendSuccessRate.scala:40-53`). Cohorted by
    * the day of the first view. */
  private val q101: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = e.filter($"event_type" === "click")
      .join(v, Seq("user_id"))
      .filter($"ts" >= $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, Seq("user_id"))
      .filter($"ts" >= $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .groupBy(date_format($"t1", "yyyy-MM-dd").as("cohort_day"))
      .agg(
        count(lit(1)).as("n_view"),
        count($"t2").as("n_click"),
        count($"t3").as("n_purchase"))
      .orderBy($"cohort_day")
  }

  /** Cohort retention: users grouped by first-active day; n active again
    * k days later (k <= 14). The distributed form of the reference's
    * active/new-user split (`ActiveAnalysis.scala:55-62`): one shuffle on
    * user_id, output O(cohorts × horizon). */
  private val q102: Q = (s, d) => {
    import s.implicits._
    val act = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("dy"))
      .distinct()
    val first = act.groupBy($"user_id").agg(min($"dy").as("d0"))
    act.join(first, Seq("user_id"))
      .select($"d0", datediff($"dy", $"d0").cast("bigint").as("k"))
      .filter($"k" <= 14)
      .groupBy(date_format($"d0", "yyyy-MM-dd").as("cohort_day"), $"k")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_day", $"k")
  }

  /** Event-transition matrix (Markov bigram census): per user, order
    * events by time and count (from → to) transitions — the reference's
    * per-session "path" analyses (`queries/SetSortQueries` q33 path agg)
    * generalized to the full transition matrix. One window shuffle on
    * user_id, output O(|types|²); the event_id tie-break makes the
    * sequence — and therefore every count — engine-deterministic. */
  private val q115: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .where($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"from_type", $"to_type")
  }

  /** Conversion-latency distribution: exact percentiles of the
    * first-view → first-qualifying-purchase lag (q101's funnel edge,
    * measured instead of counted). Lag is integer seconds floored on
    * both engines (epoch_us // 1e6 mirrors unix_timestamp's floor —
    * a double epoch() cast would ROUND in DuckDB and disagree). */
  private val q116: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val lag = e.filter($"event_type" === "purchase")
      .join(v, Seq("user_id"))
      .filter($"ts" >= $"t1")
      .groupBy($"user_id", $"t1").agg(min($"ts").as("t3"))
      .select((unix_timestamp($"t3") - unix_timestamp($"t1")).as("lag_sec"))
    lag.agg(
        count(lit(1)).as("n_converted"),
        round(expr("percentile(lag_sec, 0.5)"), 4).as("p50_sec"),
        round(expr("percentile(lag_sec, 0.9)"), 4).as("p90_sec"),
        max($"lag_sec").as("max_sec"))
  }

  /** Recency-weighted engagement: half-life decay scoring (weight
    * halves every 7 days of age), the feature-store staple for "recent
    * activity counts more". Age is measured in whole days from the
    * corpus max date — obtained as a broadcast 1-row crossJoin so the
    * plan stays lazy (no driver-side collect) — and the weight is
    * 1/2^(age/7 weeks): an EXACT power of two, so dividing by it only
    * shifts the float exponent and the decayed sum carries no more
    * rounding noise than the raw sum (libm pow on (2.0, small int) is
    * exact in both engines; a continuous e^-λt form would hand the
    * hash gate cross-libm 1-ulp noise instead).
    *
    * Scale shape: one narrow scan, one map-side-combinable hash agg on
    * (tier, type) — output O(10 × types). */
  private val q149: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
      .select(($"user_id" % 10).as("tier"), $"event_type", $"value",
        to_date($"ts").as("dy"))
    val ref = e.agg(max($"dy").as("d1"))
    e.crossJoin(broadcast(ref))
      .withColumn("age", datediff($"d1", $"dy"))
      // exact-cents trick: every term is cents / 2^k — a multiple of
      // 2⁻⁴ cents, so the sum is EXACT (no rounding at any add, in
      // any order) and the single closing round() sits on an exact
      // .5-or-better boundary both engines agree on. No closing /100:
      // a raw double sum here landed on a .xx5 boundary where Spark
      // rounds the SHORTEST DECIMAL repr and DuckDB the binary value
      .withColumn("cents", round($"value" * 100).cast("long"))
      .groupBy($"tier", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"cents").as("raw_cents"),
        round(sum($"cents" / pow(lit(2.0), floor($"age" / 7))))
          .cast("long").as("decayed_cents"))
      .orderBy($"tier", $"event_type")
  }

  /** Rolling robust anomaly detection: flag days whose revenue falls
    * outside median ± 1.5·IQR of the TRAILING week (frame −7..−1, so a
    * spike never masks itself) — the Tukey-fence monitor a pipeline
    * owner runs on daily ingest volumes, per series. Robust stats over
    * the window frame, not mean/stddev: one bad day moves a z-score
    * fence but not the median fence.
    *
    * Determinism: daily sums are integer cents; `percentile` over a
    * ≤7-int frame interpolates onto quarters (exact dyadic), so
    * median/IQR/the ×1.5 fence are all EXACT doubles both engines
    * agree on — the strict > can never flip. Warm-up days (<5 trailing
    * observations) are suppressed, not flagged on thin frames.
    *
    * Scale shape: one hash agg to days (output O(series×days)), then
    * per-series ordered windows — parallel across series, 7-row
    * frames. */
  private val q154: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy($"event_type", to_date($"ts").as("dy"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"dy")
      .rowsBetween(-7, -1)
    daily
      .withColumn("n_prev", count($"cents").over(w))
      .withColumn("med", percentile($"cents", lit(0.5)).over(w))
      .withColumn("q1", percentile($"cents", lit(0.25)).over(w))
      .withColumn("q3", percentile($"cents", lit(0.75)).over(w))
      .where($"n_prev" >= 5)
      .select($"event_type", date_format($"dy", "yyyy-MM-dd").as("day"),
        $"cents",
        round($"med", 1).as("med_c"),
        round($"q3" - $"q1", 2).as("iqr_c"),
        (abs($"cents" - $"med") > ($"q3" - $"q1") * 1.5).cast("int")
          .as("anomaly"))
      .orderBy($"event_type", $"day")
  }

  /** Attribution-window funnel: per day, how many purchases had a view
    * by the same user within the trailing 24 h — last-touch attribution
    * with a timeout, the constraint q68's open-ended as-of join and
    * q116's unbounded lag both lack. Carry-forward form: one exchange
    * on user_id, the last view time rides a running window (views sort
    * BEFORE purchases on timestamp ties so a same-instant view
    * attributes — matching the oracle's `vt <= pt`), and the 24 h test
    * is integer seconds.
    *
    * Scale shape: one user-keyed window pass over two event types,
    * then a map-side-combinable day rollup — output O(days). */
  private val q160: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
      .where($"event_type".isin("view", "purchase"))
      .select($"user_id", $"ts", $"event_id",
        ($"event_type" === "view").cast("int").as("is_view"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"is_view".desc, $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("lv",
        last(when($"is_view" === 1, $"ts"), ignoreNulls = true).over(w))
      .where($"is_view" === 0)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"),
        when($"lv".isNotNull &&
          unix_timestamp($"ts") - unix_timestamp($"lv") <= 86400L, 1L)
          .otherwise(0L).as("attributed"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"attributed").as("n_attributed"),
        round(avg($"attributed".cast("double")), 4).as("attribution_rate"))
      .orderBy($"day")
  }

  /** Item–item co-occurrence similarity ("users who touched A also
    * touched B") from the event stream — the behavioral complement of
    * q51's embedding kNN, and the classic skew trap: a power-law user
    * who touched 10⁵ items would alone emit 10¹⁰ pairs through a naive
    * per-user self-join. The standard mitigation is applied explicitly:
    * per-user items are CAPPED at the top-C by interaction count
    * (cnt desc, item asc — deterministic), so pair generation is
    * bounded at C(C−1)/2 per user no matter how heavy the user, and
    * the pair count shuffle is on the uniform (item_a, item_b) key.
    * Similarity is squared cosine over binary presence vectors, in
    * exact integer ppm (n_both² · 10⁶ DIV na·nb) so no float crosses
    * the oracle hash.
    *
    * Scale shape: one (user,item) hash agg; one per-user window over
    * ≤ distinct-items rows; the capped self-join fans out ≤ C²/2 rows
    * per user then collapses on (item_a, item_b); n_both ≥ 2 prunes the
    * long co-incidence tail before the dimension-table joins. */
  private val q176: Q = (s, d) => {
    import s.implicits._
    val C = 20
    val ui = Tables.events(s, d)
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("item"))
      .where($"item".isNotNull)
      .groupBy($"user_id", $"item").agg(count(lit(1)).as("cnt"))
    val wCap = Window.partitionBy($"user_id").orderBy($"cnt".desc, $"item")
    val capped = ui.withColumn("rn", row_number().over(wCap)).where($"rn" <= C)
      .select($"user_id", $"item")
    val ni = capped.groupBy($"item").agg(count(lit(1)).as("n_users"))
    val pairs = capped.as("a").join(capped.as("b"), Seq("user_id"))
      .where($"a.item" < $"b.item")
      .groupBy($"a.item".as("item_a"), $"b.item".as("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .where($"n_both" >= 2)
    pairs
      .join(ni.select($"item".as("item_a"), $"n_users".as("na")), Seq("item_a"))
      .join(ni.select($"item".as("item_b"), $"n_users".as("nb")), Seq("item_b"))
      .select($"item_a", $"item_b", $"n_both", $"na", $"nb",
        expr("(n_both * n_both * 1000000) DIV (na * nb)").as("cos2_ppm"))
      .orderBy($"item_a", $"item_b")
  }

  val queries: Map[String, Q] = Map(
    "q176_cooccur" -> q176,
    "q160_attribution" -> q160,
    "q154_rolling_anomaly" -> q154,
    "q149_decay_score" -> q149,
    "q98_concurrency" -> q98,
    "q101_funnel" -> q101,
    "q102_retention" -> q102,
    "q115_transitions" -> q115,
    "q116_conversion_lag" -> q116
  )

  val oracle: Map[String, String] = Map(
    "q176_cooccur" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(props->>'$.k' AS BIGINT) AS item FROM events),
        |ui AS (
        |  SELECT user_id, item, count(*) AS cnt FROM ev
        |  WHERE item IS NOT NULL GROUP BY 1, 2),
        |capped AS (
        |  SELECT user_id, item FROM (
        |    SELECT user_id, item,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY cnt DESC, item) AS rn
        |    FROM ui) WHERE rn <= 20),
        |ni AS (SELECT item, count(*) AS n_users FROM capped GROUP BY item),
        |p AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_both
        |  FROM capped a JOIN capped b
        |    ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, CAST(n_both AS BIGINT) AS n_both,
        |       CAST(na.n_users AS BIGINT) AS na,
        |       CAST(nb.n_users AS BIGINT) AS nb,
        |       CAST(n_both * n_both * 1000000 // (na.n_users * nb.n_users)
        |         AS BIGINT) AS cos2_ppm
        |FROM p JOIN ni na ON p.item_a = na.item
        |       JOIN ni nb ON p.item_b = nb.item
        |ORDER BY item_a, item_b""".stripMargin,
    "q160_attribution" ->
      """WITH v AS (
        |  SELECT user_id, ts::TIMESTAMP AS vt FROM events
        |  WHERE event_type = 'view'),
        |p AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS pt FROM events
        |  WHERE event_type = 'purchase'),
        |a AS (
        |  SELECT p.event_id, p.pt, max(v.vt) AS lv
        |  FROM p LEFT JOIN v
        |    ON v.user_id = p.user_id AND v.vt <= p.pt
        |  GROUP BY p.event_id, p.pt)
        |SELECT strftime(pt, '%Y-%m-%d') AS day, count(*) AS n_purchases,
        |  CAST(sum(CASE WHEN lv IS NOT NULL
        |    AND floor(epoch(pt))::BIGINT - floor(epoch(lv))::BIGINT <= 86400
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
        |  round(avg(CASE WHEN lv IS NOT NULL
        |    AND floor(epoch(pt))::BIGINT - floor(epoch(lv))::BIGINT <= 86400
        |    THEN 1.0::DOUBLE ELSE 0 END), 4) AS attribution_rate
        |FROM a GROUP BY 1 ORDER BY day""".stripMargin,
    "q154_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS dy,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, dy, cents,
        |    count(cents) OVER fr AS n_prev,
        |    quantile_cont(cents, 0.5) OVER fr AS med,
        |    quantile_cont(cents, 0.25) OVER fr AS q1,
        |    quantile_cont(cents, 0.75) OVER fr AS q3
        |  FROM daily
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY dy
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, strftime(dy, '%Y-%m-%d') AS day, cents,
        |  round(med, 1) AS med_c,
        |  round(q3 - q1, 2) AS iqr_c,
        |  CAST(abs(cents - med) > (q3 - q1) * 1.5 AS INT) AS anomaly
        |FROM r WHERE n_prev >= 5
        |ORDER BY event_type, day""".stripMargin,
    "q149_decay_score" ->
      """WITH mx AS (SELECT max(ts::TIMESTAMP::DATE) AS d1 FROM events),
        |e AS (
        |  SELECT user_id % 10 AS tier, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         datediff('day', ts::TIMESTAMP::DATE, d1) AS age
        |  FROM events CROSS JOIN mx)
        |SELECT tier, event_type, count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS raw_cents,
        |  CAST(round(sum(cents / power(2, age // 7))) AS BIGINT)
        |    AS decayed_cents
        |FROM e GROUP BY tier, event_type
        |ORDER BY tier, event_type""".stripMargin,
    "q115_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS to_type
        |  FROM events)
        |SELECT event_type AS from_type, to_type, count(*) AS n
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    "q116_conversion_lag" ->
      """WITH v AS (
        |  SELECT user_id, min(ts::TIMESTAMP) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, v.t1, min(e.ts::TIMESTAMP) AS t3
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= v.t1
        |  GROUP BY e.user_id, v.t1),
        |lag_ AS (
        |  SELECT epoch_us(t3) // 1000000 - epoch_us(t1) // 1000000 AS lag_sec
        |  FROM p)
        |SELECT count(*) AS n_converted,
        |       round(quantile_cont(lag_sec, 0.5), 4) AS p50_sec,
        |       round(quantile_cont(lag_sec, 0.9), 4) AS p90_sec,
        |       CAST(max(lag_sec) AS BIGINT) AS max_sec
        |FROM lag_""".stripMargin,
    "q98_concurrency" ->
      """WITH iv AS (
        |  SELECT user_id, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day, event_type,
        |         min(ts::TIMESTAMP) AS st, max(ts::TIMESTAMP) AS en
        |  FROM events GROUP BY 1, 2, 3),
        |dl AS (
        |  SELECT day, event_type, st AS t, 1 AS dlt FROM iv
        |  UNION ALL
        |  SELECT day, event_type, en AS t, -1 AS dlt FROM iv),
        |cl AS (
        |  SELECT day, event_type, t, sum(dlt) AS dl FROM dl GROUP BY 1, 2, 3),
        |rs AS (
        |  SELECT day, event_type, t,
        |         sum(dl) OVER (PARTITION BY day, event_type ORDER BY t) AS conc
        |  FROM cl)
        |SELECT day, event_type, hour(t) AS hr, CAST(max(conc) AS BIGINT) AS peak
        |FROM rs GROUP BY day, event_type, hr
        |ORDER BY day, event_type, hr""".stripMargin,
    "q101_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts::TIMESTAMP) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP >= v.t1
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= c.t2
        |  GROUP BY e.user_id)
        |SELECT strftime(v.t1, '%Y-%m-%d') AS cohort_day,
        |       count(*) AS n_view,
        |       count(c.t2) AS n_click,
        |       count(p.t3) AS n_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,
    "q102_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS dy FROM events),
        |f AS (
        |  SELECT user_id, min(dy) AS d0 FROM act GROUP BY user_id)
        |SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
        |       CAST(date_diff('day', f.d0, act.dy) AS BIGINT) AS k,
        |       count(*) AS n_users
        |FROM act JOIN f ON act.user_id = f.user_id
        |WHERE date_diff('day', f.d0, act.dy) <= 14
        |GROUP BY cohort_day, k ORDER BY cohort_day, k""".stripMargin
  )
}
