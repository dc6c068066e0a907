package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (FIXTURES.md §1): parsers are total and invert the
  * line-builders for arbitrary well-formed inputs. Uses raw ScalaCheck
  * (the scalatestplus bridge is not in the offline cache). */
class ParserPropertySpec extends AnyFunSuite {

  private def check[A](g: Gen[A])(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  private val key = for {
    c <- Gen.alphaChar
    s <- Gen.listOfN(4, Gen.alphaChar)
  } yield (c :: s).mkString
  private val value = Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
  private val kvMap = Gen.choose(0, 8)
    .flatMap(n => Gen.mapOfN(n, Gen.zip(key, value)))

  test("strToMap inverts pair building for arbitrary k/v sets") {
    check(kvMap) { m =>
      val line = m.map { case (k, v) => s"$k:$v" }.mkString(", ")
      LogParsers.strToMap(line, ",", ":") == m
    }
  }

  test("parseRunLogLine inverts the line builder") {
    val gen = for {
      id <- Gen.choose(0L, 1000000L)
      user <- Gen.choose(1L, 99999999L)
      plays <- Gen.choose(0L, 100000L)
    } yield (id, user, plays)
    check(gen) { case (id, user, plays) =>
      val line = s"[$id]2024-01-15 10:30:00:123 - VideoPlayFinish - " +
        s"DA:$user, PlayS:$plays, URI:/x?a:b"
      val r = LogParsers.parseRunLogLine(line).get
      r.userId == user.toString &&
        r.reportTime == "2024-01-15 10:30:00" &&
        r.logMap("PlayS") == plays.toString &&
        r.logMap("URI") == "/x?a:b"
    }
  }

  test("parseArateLine inverts the line builder for any device id") {
    check(Gen.zip(Gen.choose(0L, 5000000000L), Gen.choose(0L, 99999999L))) {
      case (dev, user) =>
        val line = s"<?><[0101,1537951414577,$user,3,$dev]><|><(T,live)>"
        val r = LogParsers.parseArateLine(line).get
        r.deviceId == dev &&
          r.deviceType == LogParsers.deviceTypeFromId(dev) &&
          r.userId == user.toString
    }
  }

  test("parsers never throw on arbitrary garbage") {
    check(Gen.asciiPrintableStr) { s =>
      LogParsers.parseRunLogLine(s)
      LogParsers.parseArateLine(s)
      LogParsers.parseToken(s)
      LogParsers.strToMap(s, ",", ":")
      true
    }
  }

  test("heartbeat gap rule: session count = gaps over threshold + 1") {
    check(Gen.nonEmptyListOf(Gen.choose(0L, 100000L))) { raw =>
      val ts = raw.distinct.sorted
      val gaps = ts.zip(ts.drop(1)).count { case (a, b) => b - a > 600 }
      val sessions = ts.foldLeft(List.empty[List[Long]]) {
        case (Nil, t) => List(List(t))
        case (h :: rest, t) if t - h.head <= 600 => (t :: h) :: rest
        case (acc, t) => List(t) :: acc
      }
      sessions.length == gaps + 1
    }
  }
}
