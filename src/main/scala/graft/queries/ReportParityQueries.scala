package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.LogParsers

/** The reference report mains that had no named twin before round 11
  * (VERDICT r10 "Next round #1" — the REPORTMAP.md gap fill): each query
  * here is an end-to-end composition of already-proven operators in the
  * exact shape of one reference main, oracle-checked.
  *
  *  - q264 ← `homed/repots/MultiScreen.scala:38-66` — cross-device
  *    multiscreen-action attribution: parse action lines, enrich with
  *    device→terminal and user→region dims derived from the same day's
  *    play facts, census per (user, region, terminal, program, hour,
  *    half-hour range).
  *  - q265 ← `homed/repots/BindAnalysis.scala:26-63` — daily new
  *    card-bind cohort: BindSuccess lines (bind_type=3) joined with the
  *    same log's LoginSuccess device→app-version frame, the account dim
  *    and a per-user first-login min.
  *  - q266 ← `homed/repots/NewAnalysis.scala:31-165` — daily new-user
  *    cohort census across three login families with per-family filters,
  *    an account-dim reg-source decode, and first-seen semantics.
  *  - q267 ← `homed/general/RecommendSuccessRate.scala:41-54` — the one
  *    RDD `leftOuterJoin` site in the reference (SURVEY §2 J12), closed
  *    with its DataFrame twin INCLUDING the unmatched-side semantics:
  *    `getOrElse("")` + `contains` makes a dim miss count as success.
  *  - q268 ← `homed/repots/CpSpAnalysis.scala:117-180` — content-provider
  *    rollup: demand plays enriched with the real region hierarchy and
  *    the provider dim, grouped WITH an 'ALL'-provider rollup tier (the
  *    reference runs two group-bys and unions; one grouping-sets pass
  *    computes both from a single shuffle) plus the play-time user-type
  *    tiering.
  *
  * Synthetic enrichments follow the house conventions (q57/q58/q78):
  * device band `1e9 + (user_id % 3) * 4e8` → terminal, region =
  * `user_id % 10`, content dim = `part`, account dim = `customer`,
  * hierarchy = `customer → nation → region`. All invertible, so DuckDB
  * states the expected result directly over the base tables.
  *
  * Scale: every dim join is broadcast-able EXCEPT customer (population-
  * tracking — no forced hint, AQE decides); parses are narrow maps at
  * scan parallelism; each census is one exchange on bounded keys; the
  * grouping-sets rollup re-aggregates partials without a fact rescan.
  */
object ReportParityQueries extends QueryPack {

  private def terminalCol =
    LogParsers.deviceTypeCol(lit(1000000000L) + (col("user_id") % 3) * 400000000L)

  private val terminalSql =
    "CASE user_id % 3 WHEN 0 THEN 'stb' WHEN 1 THEN 'ca' ELSE 'pad' END"

  /** MultiScreen (`MultiScreen.scala:38-66`): synthesize the
    * ActMultiScreen CSV lines, re-parse them with native split/filter
    * exactly as the reference does (ActionType 10151/10102 only, 6
    * fields, ProgramId=0 dropped), join the device→terminal and
    * user→region dims derived from the same events, aggregate at the
    * reference's user grain, then census to (region, terminal, hour,
    * timerange) for a bounded deterministic output. */
  private val q264: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val at = when($"event_type" === "click", "10151")
      .when($"event_type" === "view", "10102").otherwise("10999")
    val lines = ev.select(concat(
      lit("["), $"event_id", lit("]"),
      date_format($"ts", "yyyy-MM-dd HH:mm:ss"),
      lit(" - ActMultiScreen ActionType="), at,
      lit(",SrcUserId="), $"user_id",
      lit(",SrcDeviceId="), lit(1000000000L) + ($"user_id" % 3) * 400000000L,
      lit(",DstUserId="), $"user_id",
      lit(",DstDeviceId="), lit(2000000000L) + $"user_id",
      lit(",ProgramId="), $"event_id" % 200).as("line"))
    // the reference's split-on-comma parse, as native expressions
    val arr = split($"line", ",")
    val x0 = element_at(arr, 1)
    val parsed = lines
      .where(x0.contains("ActMultiScreen") &&
        (x0.contains("ActionType=10151") || x0.contains("ActionType=10102")) &&
        size(arr) === 6 && element_at(arr, 6) =!= "ProgramId=0")
      .select(
        regexp_extract(x0, "\\]\\d{4}-\\d{2}-\\d{2} (\\d{2}):(\\d{2})", 1)
          .as("f_hour"),
        when(regexp_extract(x0,
            "\\]\\d{4}-\\d{2}-\\d{2} (\\d{2}):(\\d{2})", 2).cast("int") > 30,
          "60").otherwise("30").as("f_timerange"),
        element_at(split(element_at(arr, 2), "="), 2).cast("long")
          .as("f_user_id"),
        element_at(split(element_at(arr, 3), "="), 2).cast("long")
          .as("f_device_id"),
        element_at(split(element_at(arr, 6), "="), 2).cast("long")
          .as("f_program_id"))
    // dims derived from the same day's facts (the reference groups
    // orc_video_play by deviceId,deviceType / userId,regionId)
    val devDim = ev.select(
      (lit(1000000000L) + ($"user_id" % 3) * 400000000L).as("f_device_id"),
      terminalCol.as("f_terminal")).distinct()
    val regDim = ev.select($"user_id".as("f_user_id"),
      ($"user_id" % 10).as("f_region_id")).distinct()
    val userGrain = parsed
      .join(devDim, Seq("f_device_id"))
      .join(regDim, Seq("f_user_id"))
      .groupBy($"f_user_id", $"f_region_id", $"f_terminal", $"f_program_id",
        $"f_hour", $"f_timerange")
      .agg(count(lit(1)).as("f_screen"))
    userGrain
      .groupBy($"f_region_id", $"f_terminal", $"f_hour", $"f_timerange")
      .agg(count(lit(1)).as("n_groups"),
        countDistinct($"f_user_id").as("n_users"),
        countDistinct($"f_program_id").as("n_programs"),
        sum($"f_screen").as("screen_total"))
      .orderBy($"f_region_id", $"f_terminal", $"f_hour", $"f_timerange")
  }

  /** BindAnalysis (`BindAnalysis.scala:26-63`): BindSuccess lines with
    * bind_type=3 ⋈ the log's own LoginSuccess (device, app_version)
    * distinct frame ⋈ account dim ⋈ per-user min first-login — the
    * reference's exact four-frame join, censused per (bind date,
    * market segment, app version). */
  private val q265: Q = (s, d) => {
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val ev = Tables.events(s, d)
    val dev = lit(1000000000L) + $"user_id"
    val bindLines = ev.where($"event_type" === "signup").select(
      LogParsers.buildRunLogLine($"event_id", $"ts", lit("BindSuccess"),
        $"user_id", Seq(
          "DeviceId" -> dev,
          "BindType" -> ($"user_id" % 4),
          "CardId" -> (lit(6000000L) + $"user_id"))).as("line"))
    val loginLines = ev.where($"event_type" === "click").select(
      LogParsers.buildRunLogLine($"event_id", $"ts", lit("LoginSuccess"),
        $"user_id", Seq(
          "DeviceId" -> dev,
          "AppVersion" -> concat(lit("v"), $"event_id" % 5))).as("line"))
    val logs = LogParsers.parseRunLog(
      bindLines.unionAll(loginLines).as[String]).toDF()
    val binds = logs.where($"keyWord" === "BindSuccess" &&
        element_at($"logMap", "BindType") === "3")
      .select(substring($"reportTime", 1, 10).as("f_date"),
        $"userId".cast("long").as("f_userid"),
        element_at($"logMap", "DeviceId").cast("long").as("f_deviceid"),
        element_at($"logMap", "CardId").as("f_cardid"))
    val logins = logs.where($"keyWord" === "LoginSuccess" &&
        element_at($"logMap", "AppVersion") =!= "")
      .select(element_at($"logMap", "DeviceId").cast("long").as("f_deviceid"),
        element_at($"logMap", "AppVersion").as("f_app_version"))
      .distinct()
    val account = Tables.customer(s, d)
      .select($"c_custkey".as("f_userid"), $"c_mktsegment".as("f_reg_source"))
    val firstLogin = ev.groupBy($"user_id".as("f_userid"))
      .agg(min(unix_timestamp($"ts")).as("f_first_login"))
    binds
      .join(logins, Seq("f_deviceid"))
      .join(account, Seq("f_userid"))   // population-tracking: no hint
      .join(firstLogin, Seq("f_userid"))
      .groupBy($"f_date", $"f_reg_source", $"f_app_version")
      .agg(count(lit(1)).as("n_binds"),
        countDistinct($"f_userid").as("n_users"),
        min($"f_first_login").as("first_login_min"))
      .orderBy($"f_date", $"f_reg_source", $"f_app_version")
  }

  /** NewAnalysis (`NewAnalysis.scala:31-165`): three login families
    * parsed from the same log with per-family filters (LoginSuccess
    * drops device_type 2), per-family distinct, account-dim reg-source
    * decode (the reference's CASE label), and FIRST-SEEN cohort
    * semantics — a user is new on exactly the day of their first event. */
  private val q266: Q = (s, d) => {
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val ev = Tables.events(s, d)
    def fam(et: String, kw: String) =
      ev.where($"event_type" === et).select(
        LogParsers.buildRunLogLine($"event_id", $"ts", lit(kw), $"user_id",
          Seq("DeviceType" -> ($"user_id" % 3),
            "DeviceID" -> (lit(1000000000L) + $"user_id"))).as("line"))
    val logs = LogParsers.parseRunLog(
      fam("click", "LoginSuccess")
        .unionAll(fam("view", "ThirdLoginSuccess"))
        .unionAll(fam("signup", "MobileLoginSuccess")).as[String]).toDF()
    val perFam = logs
      .where($"keyWord" =!= "LoginSuccess" ||
        element_at($"logMap", "DeviceType") =!= "2")
      .select($"keyWord".as("f_family"),
        substring($"reportTime", 1, 10).as("f_date"),
        $"userId".cast("long").as("f_userid"))
      .distinct()
    val regDecode = Tables.customer(s, d).select(
      $"c_custkey".as("f_userid"),
      when($"c_custkey" % 6 === 0, "boss")
        .when($"c_custkey" % 6 === 1, "home")
        .when($"c_custkey" % 6 === 2, "mobile")
        .when($"c_custkey" % 6 === 3, "wechat")
        .when($"c_custkey" % 6 === 4, "qq")
        .otherwise("guest").as("f_reg_source"))
    val firstSeen = ev.groupBy($"user_id".as("f_userid"))
      .agg(min(date_format($"ts", "yyyy-MM-dd")).as("f_first_date"))
    perFam
      .join(regDecode, Seq("f_userid"))
      .join(firstSeen, Seq("f_userid"))
      .where($"f_date" === $"f_first_date")
      .groupBy($"f_date", $"f_family", $"f_reg_source")
      .agg(countDistinct($"f_userid").as("n_new_users"))
      .orderBy($"f_date", $"f_family", $"f_reg_source")
  }

  /** RecommendSuccessRate (`RecommendSuccessRate.scala:41-54`): the J12
    * closure. Recommend records left-join the video→series dim; a record
    * succeeds when its payload CONTAINS the series string — and, exactly
    * like the reference's `getOrElse("") → contains`, a record whose
    * video has NO dim row counts as success (empty-substring contains).
    * One global (total, success, rate) row. */
  private val q267: Q = (s, d) => {
    import s.implicits._
    val rec = Tables.events(s, d).where($"event_type" === "purchase")
      .select(($"event_id" % 250).as("video_id"),
        concat(lit("s"), $"event_id" % 41, lit(";s"), $"event_id" % 7)
          .as("payload"))
    // the dim is naturally bounded (distinct video_id from video_info);
    // ids 200..249 have no row — the leftOuterJoin's None path
    val dim = broadcast(Tables.part(s, d).where($"p_partkey" < 200)
      .select($"p_partkey".as("video_id"),
        concat(lit("s"), $"p_partkey" % 41).as("series")))
    rec.join(dim, Seq("video_id"), "left")
      .select(when($"series".isNull, lit(true))
        .otherwise(contains($"payload", $"series")).as("ok"))
      .agg(count(lit(1)).as("n_rec"),
        sum(when($"ok", 1L).otherwise(0L)).as("n_success"))
      .select($"n_rec", $"n_success",
        expr("(1000 * n_success) div n_rec").as("success_permille"))
  }

  /** CpSpAnalysis (`CpSpAnalysis.scala:117-180`): provider rollup over
    * demand plays with the REAL region hierarchy (customer→nation→region)
    * and the provider dim ('unknown' on a dim miss), at both the
    * per-provider and 'ALL' tiers in ONE grouping-sets pass (the
    * reference unions two group-bys — same result, two fact scans), with
    * the reference's play-time user-type tiering. */
  private val q268: Q = (s, d) => {
    import s.implicits._
    val plays = Tables.events(s, d)
      .where($"event_type".isin("click", "view"))
      .select($"user_id", ($"event_id" % 250).as("video_id"),
        floor($"value" * 100).cast("long").as("play_time"))
    val cpDim = broadcast(Tables.part(s, d).where($"p_partkey" < 200)
      .select($"p_partkey".as("video_id"), $"p_brand".as("cp_raw")))
    val cust = Tables.customer(s, d)
      .select($"c_custkey".as("user_id"), $"c_nationkey")
    val natDim = broadcast(Tables.nation(s, d)
      .select($"n_nationkey", $"n_name", $"n_regionkey"))
    val regDim = broadcast(Tables.region(s, d)
      .select($"r_regionkey", $"r_name"))
    plays
      .join(cpDim, Seq("video_id"), "left")
      .join(cust, Seq("user_id"))       // population-tracking: no hint
      .join(natDim, $"c_nationkey" === $"n_nationkey")
      .join(regDim, $"n_regionkey" === $"r_regionkey")
      .select($"r_name".as("region_name"), $"n_name".as("nation_name"),
        terminalCol.as("terminal"),
        coalesce($"cp_raw", lit("unknown")).as("cp_sp"),
        $"user_id", $"play_time")
      .groupingSets(
        Seq(Seq($"region_name", $"nation_name", $"terminal", $"cp_sp"),
            Seq($"region_name", $"nation_name", $"terminal")),
        $"region_name", $"nation_name", $"terminal", $"cp_sp")
      .agg(sum($"play_time").as("play_time_sec"),
        count(lit(1)).as("n_plays"),
        countDistinct($"user_id").as("n_users"),
        grouping_id($"region_name", $"nation_name", $"terminal", $"cp_sp")
          .cast("long").as("gid"))
      .select($"region_name", $"nation_name", $"terminal",
        coalesce($"cp_sp", lit("ALL")).as("cp_sp"),
        $"play_time_sec", $"n_plays", $"n_users",
        when($"play_time_sec" <= 600L, 1L)
          .when($"play_time_sec" <= 3600L, 2L).otherwise(3L).as("user_type"),
        $"gid")
      .orderBy($"gid", $"region_name", $"nation_name", $"terminal", $"cp_sp")
  }

  /** Monitor report row, driver-visible (round 11, VERDICT r10 #7 —
    * `homed/monitor/MonitorApp.scala:16-48` re-queries report tables
    * for a completeness report; the rebuild's ops seam is
    * [[graft.Monitor.artifactReport]]): the documents table's
    * column-grain completeness profile plus the shared suffix-index
    * health row, both read from the live artifacts, so a profiler or
    * meta regression lands in CORRECTNESS instead of only MonitorSpec.
    * The suffix metric is the doc count (negative iff scrubbed — no
    * query scrubs the SHARED artifact, so the oracle states the clean
    * value). */
  private val q293: Q = (s, d) => {
    import s.implicits._
    val sufDocs = Tables.documents(s, d)
      .where($"text".isNotNull && $"doc_id".isNotNull &&
        length(trim($"text")) > 0)
      .select($"doc_id", $"text")
    val sharedSuf = tmpArtifactDir("graft_suffix_index", d)
    graft.operators.SuffixIndex.ensure(sharedSuf, sufDocs,
      sufDocs.select($"doc_id",
        posexplode(graft.functions.TextFunctions.tokens($"text")))
        .toDF("doc_id", "pos", "tok"))
    graft.Monitor.artifactReport(s,
      warehouse = Seq("documents" -> Tables.documents(s, d)),
      suffixIndex = Some(sharedSuf))
      .orderBy($"family")
  }

  def queries: Map[String, Q] = Map(
    "q293_monitor_report" -> q293,
    "q264_multiscreen" -> q264,
    "q265_bind_cohort" -> q265,
    "q266_new_open_cohort" -> q266,
    "q267_recommend_success" -> q267,
    "q268_cpsp_rollup" -> q268
  )

  def oracle: Map[String, String] = Map(
    "q293_monitor_report" ->
      """WITH prof AS (
        |  SELECT 'profile:documents.doc_id' AS family, count(*) AS n,
        |    CAST((1000000 * count(doc_id)) // greatest(count(*), 1) AS DOUBLE) AS metric
        |  FROM documents
        |  UNION ALL
        |  SELECT 'profile:documents.text', count(*),
        |    CAST((1000000 * count(text)) // greatest(count(*), 1) AS DOUBLE)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'profile:documents.lang', count(*),
        |    CAST((1000000 * count(lang)) // greatest(count(*), 1) AS DOUBLE)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'profile:documents.source', count(*),
        |    CAST((1000000 * count(source)) // greatest(count(*), 1) AS DOUBLE)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'profile:documents.n_chars', count(*),
        |    CAST((1000000 * count(n_chars)) // greatest(count(*), 1) AS DOUBLE)
        |  FROM documents),
        |suf AS (
        |  SELECT 'suffix_index' AS family,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n,
        |    CAST(count(*) AS DOUBLE) AS metric
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |    AND length(trim(text)) > 0)
        |SELECT family, n, metric FROM (
        |  SELECT * FROM prof UNION ALL SELECT * FROM suf) u
        |ORDER BY family""".stripMargin,
    "q264_multiscreen" ->
      s"""WITH info AS (
         |  SELECT user_id, user_id % 10 AS f_region_id,
         |    $terminalSql AS f_terminal,
         |    event_id % 200 AS f_program_id,
         |    strftime(ts, '%H') AS f_hour,
         |    CASE WHEN CAST(strftime(ts, '%M') AS INT) > 30
         |      THEN '60' ELSE '30' END AS f_timerange
         |  FROM events
         |  WHERE event_type IN ('click', 'view') AND event_id % 200 <> 0),
         |g AS (SELECT user_id, f_region_id, f_terminal, f_program_id,
         |    f_hour, f_timerange, count(*) AS f_screen
         |  FROM info GROUP BY ALL)
         |SELECT f_region_id, f_terminal, f_hour, f_timerange,
         |  count(*) AS n_groups,
         |  count(DISTINCT user_id) AS n_users,
         |  count(DISTINCT f_program_id) AS n_programs,
         |  CAST(sum(f_screen) AS BIGINT) AS screen_total
         |FROM g GROUP BY ALL
         |ORDER BY f_region_id, f_terminal, f_hour, f_timerange""".stripMargin,
    "q265_bind_cohort" ->
      """WITH binds AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS f_date, user_id AS f_userid,
        |    1000000000 + user_id AS f_deviceid
        |  FROM events WHERE event_type = 'signup' AND user_id % 4 = 3),
        |logins AS (
        |  SELECT DISTINCT 1000000000 + user_id AS f_deviceid,
        |    'v' || CAST(event_id % 5 AS VARCHAR) AS f_app_version
        |  FROM events WHERE event_type = 'click'),
        |account AS (SELECT c_custkey AS f_userid,
        |    c_mktsegment AS f_reg_source FROM customer),
        |fl AS (SELECT user_id AS f_userid,
        |    min(epoch_ms(ts) // 1000) AS f_first_login
        |  FROM events GROUP BY 1)
        |SELECT f_date, f_reg_source, f_app_version,
        |  count(*) AS n_binds,
        |  count(DISTINCT b.f_userid) AS n_users,
        |  CAST(min(f_first_login) AS BIGINT) AS first_login_min
        |FROM binds b
        |JOIN logins USING (f_deviceid)
        |JOIN account USING (f_userid)
        |JOIN fl USING (f_userid)
        |GROUP BY ALL
        |ORDER BY f_date, f_reg_source, f_app_version""".stripMargin,
    "q266_new_open_cohort" ->
      """WITH fams AS (
        |  SELECT DISTINCT
        |    CASE event_type WHEN 'click' THEN 'LoginSuccess'
        |      WHEN 'view' THEN 'ThirdLoginSuccess'
        |      ELSE 'MobileLoginSuccess' END AS f_family,
        |    strftime(ts, '%Y-%m-%d') AS f_date, user_id AS f_userid
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'signup')
        |    AND NOT (event_type = 'click' AND user_id % 3 = 2)),
        |reg AS (SELECT c_custkey AS f_userid,
        |    CASE c_custkey % 6 WHEN 0 THEN 'boss' WHEN 1 THEN 'home'
        |      WHEN 2 THEN 'mobile' WHEN 3 THEN 'wechat' WHEN 4 THEN 'qq'
        |      ELSE 'guest' END AS f_reg_source FROM customer),
        |fs AS (SELECT user_id AS f_userid,
        |    min(strftime(ts, '%Y-%m-%d')) AS f_first_date
        |  FROM events GROUP BY 1)
        |SELECT f_date, f_family, f_reg_source,
        |  count(DISTINCT f_userid) AS n_new_users
        |FROM fams JOIN reg USING (f_userid) JOIN fs USING (f_userid)
        |WHERE f_date = f_first_date
        |GROUP BY ALL ORDER BY f_date, f_family, f_reg_source""".stripMargin,
    "q267_recommend_success" ->
      """WITH rec AS (
        |  SELECT event_id % 250 AS video_id,
        |    's' || CAST(event_id % 41 AS VARCHAR) || ';s' ||
        |      CAST(event_id % 7 AS VARCHAR) AS payload
        |  FROM events WHERE event_type = 'purchase'),
        |dim AS (SELECT p_partkey AS video_id,
        |    's' || CAST(p_partkey % 41 AS VARCHAR) AS series
        |  FROM part WHERE p_partkey < 200),
        |j AS (SELECT CASE WHEN series IS NULL THEN TRUE
        |    ELSE contains(payload, series) END AS ok
        |  FROM rec LEFT JOIN dim USING (video_id))
        |SELECT count(*) AS n_rec,
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
        |  CAST((1000 * sum(CASE WHEN ok THEN 1 ELSE 0 END)) // count(*)
        |    AS BIGINT) AS success_permille
        |FROM j""".stripMargin,
    "q268_cpsp_rollup" ->
      s"""WITH plays AS (
         |  SELECT user_id, event_id % 250 AS video_id,
         |    CAST(floor(value * 100) AS BIGINT) AS play_time,
         |    $terminalSql AS terminal
         |  FROM events WHERE event_type IN ('click', 'view')),
         |cp AS (SELECT p_partkey AS video_id, p_brand AS cp_raw
         |  FROM part WHERE p_partkey < 200),
         |base AS (
         |  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         |    p.terminal, coalesce(c.cp_raw, 'unknown') AS cp_sp,
         |    p.user_id, p.play_time
         |  FROM plays p
         |  LEFT JOIN cp c USING (video_id)
         |  JOIN customer cu ON cu.c_custkey = p.user_id
         |  JOIN nation n ON n.n_nationkey = cu.c_nationkey
         |  JOIN region r ON r.r_regionkey = n.n_regionkey)
         |SELECT region_name, nation_name, terminal,
         |  coalesce(cp_sp, 'ALL') AS cp_sp,
         |  CAST(sum(play_time) AS BIGINT) AS play_time_sec,
         |  count(*) AS n_plays, count(DISTINCT user_id) AS n_users,
         |  CAST(CASE WHEN sum(play_time) <= 600 THEN 1
         |    WHEN sum(play_time) <= 3600 THEN 2 ELSE 3 END AS BIGINT)
         |    AS user_type,
         |  CAST(grouping(cp_sp) AS BIGINT) AS gid
         |FROM base
         |GROUP BY GROUPING SETS
         |  ((region_name, nation_name, terminal, cp_sp),
         |   (region_name, nation_name, terminal))
         |ORDER BY gid, region_name, nation_name, terminal, cp_sp""".stripMargin
  )
}
