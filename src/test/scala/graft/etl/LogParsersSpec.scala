package graft.etl

import graft.SparkSpec
import java.sql.Timestamp

class LogParsersSpec extends SparkSpec {
  import LogParsers._

  // FIXTURES.md §1.1 golden line
  private val runLine =
    "[23036]2018-03-26 10:38:36:472 - StatisticsVideoPlaySuccess - " +
      "DA:50312573, DeviceId:1005360181, DeviceType:stb, ProgramMethod:vod, " +
      "ProgramID:100060109, PlayS:2609, PlayToken:31617GLIWMHBYJF10, " +
      "ProtocolType:http, URI:/playurl?x:y=1"

  test("run-log golden line parses") {
    val r = parseRunLogLine(runLine).get
    assert(r.keyWord == "StatisticsVideoPlaySuccess")
    assert(r.userId == "50312573")
    assert(r.reportTime == "2018-03-26 10:38:36")
    assert(r.logMap("DeviceId") == "1005360181")
    assert(r.logMap("PlayS") == "2609")
    // value split on FIRST ':' only — URIs keep their colons
    assert(r.logMap("URI") == "/playurl?x:y=1")
  }

  test("run-log drops blacklisted families and DA-less lines") {
    assert(parseRunLogLine(
      "[1]2018-03-26 10:38:36:000 - BINARYCSomething - DA:1, X:2").isEmpty)
    assert(parseRunLogLine(
      "[1]2018-03-26 10:38:36:000 - VideoPlayFinish - X:2").isEmpty)
    assert(parseRunLogLine("garbage").isEmpty)
    assert(parseRunLogLine("").isEmpty)
  }

  test("strToMap: trim, first-separator split, empty-key drop") {
    assert(strToMap("a:1, b:2:3,  c : x ", ",", ":") ==
      Map("a" -> "1", "b" -> "2:3", "c" -> "x"))
    assert(strToMap("", ",", ":") == Map.empty)
    assert(strToMap(":novalue,ok:1", ",", ":") == Map("ok" -> "1"))
  }

  // FIXTURES.md §1.2 golden line
  private val arateLine =
    "<?><[0101,1537951414577,50310979,0,1005358791]><|><(T,live)><&>" +
      "<(P,http)><&><(ID,4200851466)><&><(CL,100)><&><(NA,name with, comma)>"

  test("arate golden line parses") {
    val r = parseArateLine(arateLine).get
    assert(r.service == "0101")
    assert(r.epochMillis == 1537951414577L)
    assert(r.userId == "50310979")
    assert(r.region == "0")
    assert(r.deviceId == 1005358791L)
    assert(r.deviceType == "stb")
    assert(r.ext("ID") == "4200851466")
    // value split on FIRST ',' — values keep later commas
    assert(r.ext("NA") == "name with, comma")
  }

  test("device-id ranges map to terminal types") {
    assert(deviceTypeFromId(1005360181L) == "stb")
    assert(deviceTypeFromId(1500000000L) == "ca")
    assert(deviceTypeFromId(1850000000L) == "pad")
    assert(deviceTypeFromId(2500000000L) == "mobile")
    assert(deviceTypeFromId(3500000000L) == "pc")
    assert(deviceTypeFromId(999L) == "other")
    assert(deviceTypeFromId(1200000000L) == "other") // gap between stb/ca
  }

  test("token decode round-trips hex fields") {
    // user=0x00bffff5, device=0x3bef3ab3, type=0x02, region=0x00006f
    val t = parseToken("00bffff53bef3ab302" + "00006f")
    assert(t.contains(TokenInfo(0x00bffff5L, 0x3bef3ab3L, 2, 0x6fL)))
    assert(parseToken("xyz").isEmpty)
    assert(parseToken(null).isEmpty)
  }

  test("parseNginx extracts path, query map, and body from JSON lines") {
    import spark.implicits._
    val lines = Seq(
      """{"timestamp":"2024-01-15 10:00:00","request":"/api/click?user=8&k=69","body":"{\"k\": 69}"}""",
      """{"timestamp":"2024-01-15 10:01:00","request":"/login","body":"{}"}""",
      "not json at all").toDS()
    val out = LogParsers.parseNginx(lines)
      .selectExpr("report_time", "key_word", "params['user']", "params['k']")
      .collect()
    val byKw = out.filter(_.getString(1) != null).map(r =>
      r.getString(1) -> (r.getString(2), r.getString(3))).toMap
    assert(byKw("/api/click") == ("8", "69"))
    assert(byKw.contains("/login"))
    // malformed JSON yields nulls, never a throw
    assert(out.length == 3)
  }

  test("heartbeatSessions splits on gaps and sums beats") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // user 1: beats at 0,60,120 | gap | 7200,7260 → two sessions (3+2)
    // user 2: single beat → one session of 1
    val beats = Seq(
      (1L, ts(0)), (1L, ts(60)), (1L, ts(120)), (1L, ts(7200)), (1L, ts(7260)),
      (2L, ts(42))).toDS()
    val out = LogParsers.heartbeatSessions(beats, maxGapSec = 3600, intervalSec = 60)
      .collect().sortBy(h => (h.userId, h.sessionIdx))
    assert(out.map(h => (h.userId, h.nBeats, h.onlineSec)).toSeq ==
      Seq((1L, 3, 180L), (1L, 2, 120L), (2L, 1, 60L)))
    assert(out.head.firstBeat == ts(0) && out.head.lastBeat == ts(120))
  }

  test("sessionize pairs starts with next event, drops start->start") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // u1: start@0 → end@100 (pair, 100s); start@200 → start@300 (dropped);
    //     start@300 → end@450 (pair, 150s); trailing start@500 (no next)
    val df = Seq(
      (1L, ts(0), 1L, true), (1L, ts(100), 2L, false),
      (1L, ts(200), 3L, true), (1L, ts(300), 4L, true),
      (1L, ts(450), 5L, false), (1L, ts(500), 6L, true))
      .toDF("user_id", "ts", "event_id", "is_start")
    val out = LogParsers.sessionize(df, Seq("user_id"), "event_id")
      .select("user_id", "duration_sec").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 100L), (1L, 150L)))
  }
}
