package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.LogParsers

/** ETL-parser operators (SURVEY §2.2 P1/P2, §2.5 W1, §2.10 R7): raw log
  * LINES are synthesized from the `events` table in the reference's
  * formats (FIXTURES.md §1), round-tripped through the REAL typed parsers
  * in [[graft.etl.LogParsers]], then aggregated. Because the line
  * construction is invertible, DuckDB states the expected result directly
  * over `events` — the parse chain itself is what's under test.
  *
  * Scale: parsing is a narrow flatMap at scan parallelism; the only
  * shuffles are the final low-cardinality aggregates and the per-user
  * repartition of sessionization (keyed on user_id — millions of
  * distinct values at production scale, no hot key).
  */
object EtlQueries extends QueryPack {

  /** event_type → run-log keyword (the reference's play/behavior families,
    * `etl/LogConstant.scala:11-50`). */
  private def kwExpr = {
    import org.apache.spark.sql.Column
    val m: Seq[(String, String)] = Seq(
      "click" -> "VideoPlayStartSuccess", "view" -> "StatisticsVideoPlaySuccess",
      "purchase" -> "VideoPlayFinish", "signup" -> "LoginSuccess",
      "error" -> "VideoPlayBreak")
    // total: an unmapped event_type must NOT null the line (concat
    // null-propagates and the row would silently vanish on one side only)
    m.foldLeft(lit("UnknownEvent"): Column) { case (acc, (k, v)) =>
      when(col("event_type") === k, lit(v)).otherwise(acc)
    }
  }

  private val kwCase =
    """CASE event_type
      |  WHEN 'click' THEN 'VideoPlayStartSuccess'
      |  WHEN 'view' THEN 'StatisticsVideoPlaySuccess'
      |  WHEN 'purchase' THEN 'VideoPlayFinish'
      |  WHEN 'signup' THEN 'LoginSuccess'
      |  WHEN 'error' THEN 'VideoPlayBreak'
      |  ELSE 'UnknownEvent' END""".stripMargin

  /** Run-log round-trip: events → formatted "[pid]time - KeyWord - K:V,…"
    * lines → [[LogParsers.parseRunLog]] → per-keyword census. */
  private val q57: Q = (s, d) => {
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val lines = Tables.events(s, d).select(
      LogParsers.buildRunLogLine($"event_id", $"ts", kwExpr, $"user_id", Seq(
        "DeviceId" -> (lit(1000000000L) + $"user_id"),
        "ProgramID" -> $"event_id",
        "PlayS" -> floor($"value" * 100).cast("long"))).as("line"))
      .as[String]
    LogParsers.parseRunLog(lines).toDF()
      .groupBy($"keyWord".as("key_word"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"userId").as("n_users"),
        min($"reportTime").as("min_t"),
        sum(element_at($"logMap", "PlayS").cast("long")).as("sum_plays"))
      .orderBy($"key_word")
  }

  /** Arate round-trip: events → "<?><[svc,ms,user,region,device]><|>…"
    * lines → [[LogParsers.parseArate]] (device-type derived from the
    * device-id range, `etl/ReportLog.scala:424-445`) → census per
    * (service, device_type). */
  private val q58: Q = (s, d) => {
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val svc = when($"event_type" === "click", "0101")
      .when($"event_type" === "view", "0104")
      .when($"event_type" === "purchase", "0301")
      .when($"event_type" === "signup", "0701")
      .otherwise("0103")
    val devId = lit(1000000000L) + ($"user_id" * 23456789L) % 3000000000L
    val lines = Tables.events(s, d).select(concat(
      lit("<?><["), svc, lit(","), unix_millis($"ts"), lit(","),
      $"user_id", lit(","), $"user_id" % 10, lit(","), devId,
      lit("]><|><(T,"), $"event_type",
      lit(")><&><(ID,"), $"event_id",
      // coalesce: a props row without 'k' must not null the whole line
      lit(")><&><(K,"), coalesce(get_json_object($"props", "$.k"), lit("0")),
      lit(")>"))
      .as("line")).as[String]
    LogParsers.parseArate(lines).toDF()
      .groupBy($"service", $"deviceType".as("device_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"userId").as("n_users"),
        sum(element_at($"ext", "K").cast("long")).as("sum_k"),
        min(element_at($"ext", "ID").cast("long")).as("min_id"))
      .orderBy($"service", $"device_type")
  }

  /** Lead-pairing sessionization (W1/H-1) on the events stream: 'click'
    * rows are starts; each start pairs with the NEXT event of the same
    * user; start→start pairs are dropped. */
  private val q59: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select($"user_id", $"ts", $"event_id",
      ($"event_type" === "click").as("is_start"))
    LogParsers.sessionize(ev, Seq("user_id"), "event_id")
      .groupBy(($"user_id" % 10).as("user_bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum($"duration_sec").as("total_sec"),
        max($"duration_sec").as("max_sec"))
      .orderBy($"user_bucket")
  }

  /** Heartbeat sessions (R7/H-2): every event is a beat; gap > 3600 s
    * starts a new session; online time = beats × 60 s. Runs the typed
    * flatMapGroups state machine. */
  private val q60: Q = (s, d) => {
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    // a beat without a user or a time is not a beat — mirrored in the
    // oracle (NullInputSpec: unguarded, a null user_id breaks the
    // non-nullable Tuple2 encoder)
    val beats = Tables.events(s, d)
      .where($"user_id".isNotNull && $"ts".isNotNull)
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)]
    LogParsers.heartbeatSessions(beats, maxGapSec = 3600L, intervalSec = 60L)
      .toDF()
      .groupBy(($"userId" % 10).as("user_bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum($"nBeats").cast("long").as("total_beats"),
        sum($"onlineSec").as("total_online_sec"),
        max($"nBeats").cast("long").as("max_beats"))
      .orderBy($"user_bucket")
  }

  /** H-7 identity resolution, redefined deterministically: events report
    * either a CA card id (1.4-1.6B range) or a DA account id (50-70M
    * range, `etl/ReportLog.scala:123-125`); CA-keyed rows resolve to DA
    * through the device_account mapping; rows already DA-keyed pass
    * through; unresolvable CAs keep a sentinel. The reference's
    * order-dependent `max(DA)` pick (`etl/CaGetDa.scala:33-38`) becomes
    * min(DA) so the result is reproducible (H-3).
    *
    * No broadcast HINT on the mapping: device_account is the full
    * subscriber base — it grows with the deployment, not with a query
    * (the q171 lesson: never force-broadcast a frame whose size tracks
    * corpus/population growth). The equi join shuffles co-partitioned on
    * the card id; size-based planning still broadcasts it while it fits. */
  private val q70: Q = (s, d) => {
    import s.implicits._
    // synthesize the two id spaces from events: even event_id rows report
    // the CA card, odd rows report the DA directly
    val reported = Tables.events(s, d).select($"event_id", $"user_id",
      when($"event_id" % 2 === 0, lit(1400000000L) + $"user_id" * 3)
        .otherwise(lit(50000000L) + $"user_id").as("reported_id"))
    // device_account dim: CA -> DA, with a deliberate duplicate CA row
    // (two DAs per card) that min(DA) must resolve deterministically;
    // cards of users ≥ 120 are absent -> unresolvable
    val deviceAccount = Tables.events(s, d)
      .select(($"user_id" % 120).as("uid")).distinct()
      .select((lit(1400000000L) + $"uid" * 3).as("ca_id"),
        (lit(50000000L) + $"uid").as("da"))
      .union(Tables.events(s, d)
        .select(($"user_id" % 40).as("uid")).distinct()
        .select((lit(1400000000L) + $"uid" * 3).as("ca_id"),
          (lit(50000001L) + $"uid").as("da")))
    val mapping = deviceAccount.groupBy($"ca_id").agg(min($"da").as("da"))
    val resolved = reported
      .join(mapping, $"reported_id" === $"ca_id", "left")
      .select($"event_id",
        when($"reported_id" >= 50000000L && $"reported_id" < 70000000L,
          $"reported_id")
          .otherwise(coalesce($"da", lit(-1L))).as("da"))
    resolved
      .groupBy(($"da" % 7).as("da_bucket"))
      .agg(count(lit(1)).as("n"), countDistinct($"da").as("n_das"))
      .orderBy($"da_bucket")
  }

  /** CDC changelog → snapshot compaction (the Debezium/`MERGE INTO`
    * apply step; the reference's keyed upsert K2 is the two-row special
    * case): the events stream is read as a per-key changelog — every
    * row an upsert carrying the new value, 'error' rows as DELETE
    * tombstones, sequence = (event time, event_id) so late/duplicate
    * delivery can never reorder a key's history. The snapshot keeps,
    * per key, the LATEST operation; a key whose latest op is a
    * tombstone is ABSENT from the snapshot (its lineage is visible only
    * through the per-key op counts). This is the batch twin of
    * [[graft.sources.UpsertStore]]'s merge-by-key and the compaction a
    * CDC-fed lakehouse table runs over every changelog partition.
    *
    * Scale shape: ONE hash agg — `max_by(payload, seq)` is a
    * declarative aggregate, so Catalyst runs it partially map-side
    * (each task reduces its slice to one candidate row per key before
    * the exchange); no window, no self-join, no sort of the full log.
    * Values close as integer cents via floor(value*100) (the q57
    * closure — exact on the fixture's 2-decimal doubles). */
  /** Web-page text extraction round trip (the P-family's web-corpus
    * analog — CCNet/RefinedWeb/Dolma all begin at raw HTML): each
    * document is wrapped in a deterministic page (head/title, style and
    * script blocks — the script deliberately contains a bare `<` —
    * comments, nav boilerplate, entity-bearing footer), then
    * [[graft.etl.WebExtract.extractText]] strips it back to visible
    * text as ONE codegen'd expression chain riding the scan. The census
    * reports per language: docs, extracted token and char mass, and the
    * exact markup overhead the extraction removed. The oracle runs the
    * SAME pattern list ([[graft.etl.WebExtract.extractSqlDuck]] — one
    * pattern table, two engine spellings; DuckDB needs the explicit 'g'
    * flag). Scale: a per-row map on the ingest scan, no shuffle before
    * the O(langs) census. */
  private val q257: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .where($"doc_id".isNotNull && $"text".isNotNull &&
        $"lang".isNotNull && $"source".isNotNull)
    val html = concat(
      lit("<html><!-- doc:"), $"doc_id".cast("string"),
      lit(" --><head><title>"), $"source",
      lit("</title><style>p { margin: 0 }</style>" +
        "<script type=\"text/javascript\">var lang = \""), $"lang",
      lit("\"; if (1 < 2) { track(); }</script></head><body><h1>"),
      $"source",
      lit("</h1><nav><a href=\"/home\">home</a> " +
        "<a href=\"/about\">about</a></nav><p>"), $"text",
      lit("</p><footer>contact &amp; legal &#39;2024&#39;" +
        "</footer></body></html>"))
    docs.select($"lang", html.as("html"))
      .withColumn("extracted", graft.etl.WebExtract.extractText($"html"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"extracted", " "))).as("sum_ext_tokens"),
        sum(length($"extracted")).as("sum_ext_chars"),
        sum(length($"html") - length($"extracted"))
          .as("markup_overhead_chars"))
      .orderBy($"lang")
  }

  private val q227: Q = (s, d) => {
    import s.implicits._
    val log = Tables.events(s, d)
      .where($"user_id".isNotNull && $"ts".isNotNull)
      .select($"user_id", $"event_id",
        unix_micros($"ts").as("seq_us"),
        ($"event_type" === "error").as("is_del"),
        floor($"value" * 100).cast("long").as("cents"))
    log.groupBy($"user_id")
      .agg(count(lit(1)).as("n_ops"),
        sum(when($"is_del", 1L).otherwise(0L)).as("n_deletes"),
        max_by(struct($"is_del", $"cents"),
          struct($"seq_us", $"event_id")).as("last"))
      .where(!$"last.is_del")
      .select($"user_id", $"n_ops", $"n_deletes",
        $"last.cents".as("last_cents"))
      .orderBy($"user_id")
  }

  val queries: Map[String, Q] = Map(
    "q227_cdc_apply" -> q227,
    "q257_web_extract" -> q257,
    "q70_identity_resolution" -> q70,
    "q57_runlog_parse" -> q57,
    "q58_arate_parse" -> q58,
    "q59_lead_sessionize" -> q59,
    "q60_heartbeat_sessions" -> q60
  )

  val oracle: Map[String, String] = Map(
    "q257_web_extract" ->
      s"""WITH d AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |    AND lang IS NOT NULL AND source IS NOT NULL),
        |h AS (SELECT lang,
        |  '<html><!-- doc:' || CAST(doc_id AS VARCHAR) || ' --><head><title>' || source ||
        |  '</title><style>p { margin: 0 }</style><script type="text/javascript">var lang = "' || lang ||
        |  '"; if (1 < 2) { track(); }</script></head><body><h1>' || source ||
        |  '</h1><nav><a href="/home">home</a> <a href="/about">about</a></nav><p>' || text ||
        |  '</p><footer>contact &amp; legal &#39;2024&#39;</footer></body></html>' AS html
        | FROM d),
        |x AS (SELECT lang, html,
        |  ${graft.etl.WebExtract.extractSqlDuck("html")} AS extracted FROM h)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(extracted, ' '))) AS BIGINT)
        |    AS sum_ext_tokens,
        |  CAST(sum(len(extracted)) AS BIGINT) AS sum_ext_chars,
        |  CAST(sum(len(html) - len(extracted)) AS BIGINT)
        |    AS markup_overhead_chars
        |FROM x GROUP BY lang ORDER BY lang""".stripMargin,
    "q227_cdc_apply" ->
      """WITH log AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS seq_us,
        |    (event_type = 'error') AS is_del,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |latest AS (
        |  SELECT user_id, is_del, cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY seq_us DESC, event_id DESC) AS rn
        |  FROM log),
        |ops AS (
        |  SELECT user_id, count(*) AS n_ops,
        |    CAST(sum(CASE WHEN is_del THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_deletes
        |  FROM log GROUP BY user_id)
        |SELECT o.user_id, o.n_ops, o.n_deletes, l.cents AS last_cents
        |FROM ops o JOIN latest l ON o.user_id = l.user_id AND l.rn = 1
        |WHERE NOT l.is_del
        |ORDER BY o.user_id""".stripMargin,
    "q70_identity_resolution" ->
      """WITH reported AS (SELECT event_id, user_id,
        |    CASE WHEN event_id % 2 = 0 THEN 1400000000 + user_id * 3
        |         ELSE 50000000 + user_id END AS reported_id
        |  FROM events),
        |da1 AS (SELECT DISTINCT user_id % 120 AS uid FROM events),
        |da2 AS (SELECT DISTINCT user_id % 40 AS uid FROM events),
        |device_account AS (
        |  SELECT 1400000000 + uid * 3 AS ca_id, 50000000 + uid AS da FROM da1
        |  UNION ALL
        |  SELECT 1400000000 + uid * 3 AS ca_id, 50000001 + uid AS da FROM da2),
        |mapping AS (SELECT ca_id, min(da) AS da FROM device_account GROUP BY ca_id),
        |resolved AS (SELECT r.event_id,
        |    CASE WHEN r.reported_id >= 50000000 AND r.reported_id < 70000000
        |         THEN r.reported_id ELSE coalesce(m.da, -1) END AS da
        |  FROM reported r LEFT JOIN mapping m ON r.reported_id = m.ca_id)
        |SELECT da % 7 AS da_bucket, count(*) AS n,
        |  count(DISTINCT da) AS n_das
        |FROM resolved GROUP BY 1 ORDER BY da_bucket""".stripMargin,
    "q57_runlog_parse" ->
      s"""SELECT $kwCase AS key_word, count(*) AS n,
         |  count(DISTINCT user_id) AS n_users,
         |  min(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS min_t,
         |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_plays
         |FROM events GROUP BY 1 ORDER BY key_word""".stripMargin,
    "q58_arate_parse" ->
      """WITH x AS (SELECT
        |    CASE event_type WHEN 'click' THEN '0101' WHEN 'view' THEN '0104'
        |      WHEN 'purchase' THEN '0301' WHEN 'signup' THEN '0701'
        |      ELSE '0103' END AS service,
        |    1000000000 + (user_id * 23456789) % 3000000000 AS dev_id,
        |    user_id, event_id,
        |    CAST(coalesce(props->>'$.k', '0') AS BIGINT) AS k
        |  FROM events)
        |SELECT service,
        |  CASE
        |    WHEN dev_id >= 1000000000 AND dev_id < 1200000000 THEN 'stb'
        |    WHEN dev_id >= 1400000000 AND dev_id < 1600000000 THEN 'ca'
        |    WHEN dev_id >= 1800000000 AND dev_id < 1900000000 THEN 'pad'
        |    WHEN dev_id >= 2000000000 AND dev_id < 3000000000 THEN 'mobile'
        |    WHEN dev_id >= 3000000000 AND dev_id < 4000000000 THEN 'pc'
        |    ELSE 'other' END AS device_type,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(event_id) AS BIGINT) AS min_id
        |FROM x GROUP BY 1, 2 ORDER BY service, device_type""".stripMargin,
    "q59_lead_sessionize" ->
      """WITH l AS (SELECT user_id,
        |    (event_type = 'click') AS is_start,
        |    epoch_ms(ts) // 1000 AS tsec,
        |    lead(epoch_ms(ts) // 1000) OVER w AS next_tsec,
        |    lead(event_type = 'click') OVER w AS next_start
        |  FROM events
        |  -- CAST to micros: Spark's window orders the micro-truncated ts
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |SELECT user_id % 10 AS user_bucket,
        |  count(*) AS n_sessions,
        |  CAST(sum(next_tsec - tsec) AS BIGINT) AS total_sec,
        |  CAST(max(next_tsec - tsec) AS BIGINT) AS max_sec
        |FROM l WHERE is_start AND next_tsec IS NOT NULL AND NOT next_start
        |GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "q60_heartbeat_sessions" ->
      """WITH l AS (SELECT user_id, ts, epoch_ms(ts) AS ems,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN prev IS NULL OR ems - prev > 3600 * 1000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM l),
        |s AS (SELECT user_id,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |g AS (SELECT user_id, sid, count(*) AS nb FROM s GROUP BY 1, 2)
        |SELECT user_id % 10 AS user_bucket,
        |  count(*) AS n_sessions,
        |  CAST(sum(nb) AS BIGINT) AS total_beats,
        |  CAST(sum(nb * 60) AS BIGINT) AS total_online_sec,
        |  CAST(max(nb) AS BIGINT) AS max_beats
        |FROM g GROUP BY 1 ORDER BY user_bucket""".stripMargin
  )
}
