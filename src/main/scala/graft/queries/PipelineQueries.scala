package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.LogParsers

/** Composed-pipeline operators: the SURVEY §7.2 flagship vertical slice
  * (parse → sessionize → enrich → half-hour explode → aggregate) plus the
  * remaining §2.2/§2.4 inventory rows — nginx parsing (P3), time clamping
  * (P7), and the post-agg string-set merge (A13).
  */
object PipelineQueries extends QueryPack {

  /** P3: nginx JSON round-trip. events → JSON lines (timestamp, request
    * URL with querystring, body) → [[LogParsers.parseNginx]] (from_json +
    * parse_url + str_to_map, all codegen'd) → census per URL path. */
  private val q62: Q = (s, d) => {
    import s.implicits._
    val lines = Tables.events(s, d).select(to_json(struct(
      date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("timestamp"),
      concat(lit("/api/"), $"event_type", lit("?user="), $"user_id",
        // coalesce: a props row without 'k' must not null the request
        lit("&k="), coalesce(get_json_object($"props", "$.k"), lit("0")))
        .as("request"),
      $"props".as("body"))).as("line")).as[String]
    LogParsers.parseNginx(lines)
      .groupBy($"key_word")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(element_at($"params", "user")).as("n_users"),
        sum(element_at($"params", "k").cast("long")).as("sum_k"),
        min($"report_time").as("min_t"))
      .orderBy($"key_word")
  }

  /** P7: clamp event times into a target window (2024-01-10 .. 2024-01-20)
    * and census the clamping — the reference's out-of-range repair, minus
    * its year-boundary bug (H-5). */
  private val q63: Q = (s, d) => {
    import s.implicits._
    val lo = to_timestamp(lit("2024-01-10 00:00:00"))
    val hi = to_timestamp(lit("2024-01-20 00:00:00"))
    Tables.events(s, d)
      .select($"event_type", $"ts",
        LogParsers.clampToWindow($"ts", lo, hi).as("cts"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(($"cts" =!= $"ts").cast("long")).as("n_clamped"),
        min(date_format($"cts", "yyyy-MM-dd HH:mm:ss")).as("min_t"),
        max(date_format($"cts", "yyyy-MM-dd HH:mm:ss")).as("max_t"))
      .orderBy($"event_type")
  }

  /** A13: post-agg string-set merge (`etl/UserAgregate.scala:146-165`):
    * per-day "a|b|c" source strings re-merged across days with dedup —
    * the reference's `merge` UDF replaced by
    * array_distinct(flatten(...)), no UDF. */
  private val q64: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(concat_ws("|", array_sort(collect_set($"event_type"))).as("src"))
    daily
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_days"),
        concat_ws("|", array_sort(array_distinct(
          flatten(collect_list(split($"src", "\\|")))))).as("merged"))
      .groupBy($"merged")
      .agg(count(lit(1)).as("n_users"), sum($"n_days").as("total_days"))
      .orderBy($"merged")
  }

  /** SURVEY §7.2 flagship: half-hour live-channel report, end to end.
    * Raw run-log LINES (synthesized from events in the reference format)
    * → P1 typed parse → W1 lead-sessionization per (user, channel URI) →
    * J2 broadcast left-join to the region dim with default-on-miss →
    * half-hour explosion (sequence + explode, the reference's divideTime
    * loops) → hash-agg per (region, channel, half-hour slot).
    *
    * Scale: parse is narrow; sessionization shuffles once on (user, uri);
    * the region dim broadcasts; the explosion multiplies rows ~2× (play
    * intervals are minutes); the final agg is one exchange on a bounded
    * key space (regions × channels × 48 slots/day). */
  private val q65: Q = (s, d) => {
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    // synthesize: click = play start; purchase/error = stop events;
    // view/signup = unrelated traffic the parser must route past
    val kw = when($"event_type" === "click", "VideoPlayStartSuccess")
      .when($"event_type".isin("purchase", "error"), "VideoPlayFinish")
      .otherwise("Search")
    val lines = Tables.events(s, d).select(
      LogParsers.buildRunLogLine($"event_id", $"ts", kw, $"user_id", Seq(
        "DeviceId" -> (lit(1000000000L) + $"user_id"),
        "URI" -> concat(lit("/ch/"), $"user_id" % 5),
        "EventId" -> $"event_id")).as("line")).as[String]
    val parsed = LogParsers.parseRunLog(lines).toDF()
      // route only the play family into sessionization; behavior lines
      // (Search, ...) flow to the behavior table in the real pipeline
      .where($"keyWord".isin("VideoPlayStartSuccess", "VideoPlayFinish"))
      .select($"userId", element_at($"logMap", "URI").as("uri"),
        element_at($"logMap", "EventId").cast("long").as("event_id"),
        to_timestamp($"reportTime").as("ts"),
        ($"keyWord" === "VideoPlayStartSuccess").as("is_start"))
    val sessions = LogParsers.sessionize(parsed, Seq("userId", "uri"), "event_id")
      .select($"userId", $"uri",
        unix_timestamp($"ts").as("t0"), unix_timestamp($"end_ts").as("t1"))
      .where($"t1" > $"t0")
    val region = broadcast(Tables.region(s, d)
      .select($"r_regionkey".cast("long").as("rk"), $"r_name"))
    val sliced = sessions
      .join(region, ($"userId".cast("long") % 5) === $"rk", "left")
      .select($"userId", $"uri",
        coalesce($"r_name", lit("UNKNOWN")).as("region"), $"t0", $"t1",
        explode(sequence(floor($"t0" / 1800), floor($"t1" / 1800))).as("slot"))
      .select($"userId", $"uri", $"region", $"slot",
        (least($"t1", ($"slot" + 1) * 1800) -
          greatest($"t0", $"slot" * 1800)).as("overlap"))
      .where($"overlap" > 0)
    sliced
      .groupBy($"region", $"uri", $"slot".cast("long").as("slot"))
      .agg(
        sum($"overlap").as("play_time_sec"),
        countDistinct($"userId").as("n_users"),
        count(lit(1)).as("n_sessions"))
      .orderBy($"region", $"uri", $"slot")
  }

  val queries: Map[String, Q] = Map(
    "q62_nginx_parse" -> q62,
    "q63_time_clamp" -> q63,
    "q64_source_merge" -> q64,
    "q65_halfhour_report" -> q65
  )

  val oracle: Map[String, String] = Map(
    "q62_nginx_parse" ->
      """SELECT '/api/' || event_type AS key_word,
        |  count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(coalesce(props->>'$.k', '0') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS min_t
        |FROM events GROUP BY 1 ORDER BY key_word""".stripMargin,
    "q63_time_clamp" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN cts <> ts THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
        |  min(strftime(cts, '%Y-%m-%d %H:%M:%S')) AS min_t,
        |  max(strftime(cts, '%Y-%m-%d %H:%M:%S')) AS max_t
        |FROM (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    least(greatest(CAST(ts AS TIMESTAMP), TIMESTAMP '2024-01-10 00:00:00'),
        |      TIMESTAMP '2024-01-20 00:00:00') AS cts
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q64_source_merge" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    array_to_string(list_sort(list_distinct(list(event_type))), '|') AS src
        |  FROM events GROUP BY 1, 2),
        |merged AS (
        |  SELECT user_id, count(*) AS n_days,
        |    array_to_string(list_sort(list_distinct(
        |      flatten(list(regexp_split_to_array(src, '\|'))))), '|') AS merged
        |  FROM daily GROUP BY user_id)
        |SELECT merged, count(*) AS n_users,
        |  CAST(sum(n_days) AS BIGINT) AS total_days
        |FROM merged GROUP BY merged ORDER BY merged""".stripMargin,
    "q65_halfhour_report" ->
      """WITH ev AS (SELECT user_id, event_id,
        |    epoch_ms(ts) // 1000 AS tsec,
        |    (event_type = 'click') AS is_start,
        |    event_type IN ('click', 'purchase', 'error') AS kept
        |  FROM events),
        |l AS (SELECT user_id, tsec, is_start,
        |    lead(tsec) OVER w AS t1,
        |    lead(is_start) OVER w AS next_start
        |  FROM ev WHERE kept
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
        |sess AS (SELECT user_id, tsec AS t0, t1 FROM l
        |  WHERE is_start AND t1 IS NOT NULL AND NOT next_start AND t1 > tsec),
        |sliced AS (SELECT user_id, t0, t1, s.slot,
        |    least(t1, (s.slot + 1) * 1800) - greatest(t0, s.slot * 1800) AS overlap
        |  FROM sess, LATERAL (SELECT unnest(generate_series(t0 // 1800, t1 // 1800)) AS slot) s
        |  WHERE least(t1, (s.slot + 1) * 1800) - greatest(t0, s.slot * 1800) > 0)
        |SELECT coalesce(r.r_name, 'UNKNOWN') AS region,
        |  '/ch/' || (user_id % 5) AS uri,
        |  CAST(slot AS BIGINT) AS slot,
        |  CAST(sum(overlap) AS BIGINT) AS play_time_sec,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_sessions
        |FROM sliced LEFT JOIN region r ON user_id % 5 = r.r_regionkey
        |GROUP BY 1, 2, 3 ORDER BY region, uri, slot""".stripMargin
  )
}
