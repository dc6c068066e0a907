package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Detector-by-detector hit counts, exact redacted strings, independence
  * of detection from redaction order, idempotence, and NULL safety. */
class PiiScrubSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "contact john.doe+x@mail.example.org please"),
      (2L, "server at 10.0.0.1 and 192.168.1.255."),
      (3L, "call 415-555-1234 or 020 7946 0958 now"),
      (4L, "account 1234567 then order 99999"),
      (5L, "mail a123456@b.com today"),
      (6L, null.asInstanceOf[String])
    ).toDF("id", "t")
  }

  test("hit counts per detector (independent, on the original text)") {
    val s = spark
    import s.implicits._
    val cols = PiiScrub.detectors.map { case (n, p, _) =>
      sum(PiiScrub.hitCount($"t", p)).as(n)
    }
    val r = fixture.agg(cols.head, cols.tail: _*).head()
    assert(r.getLong(0) == 2, "emails: rows 1 and 5")
    assert(r.getLong(1) == 2, "ips: two in row 2")
    assert(r.getLong(2) == 2, "phones: two in row 3")
    // row 4: 1234567; row 5: 123456 inside the email counts too
    assert(r.getLong(3) == 2, "id runs >= 6 digits")
  }

  test("sequential scrub redacts typed-first and exactly") {
    val s = spark
    import s.implicits._
    val got = fixture.where($"t".isNotNull)
      .select($"id", PiiScrub.scrub($"t").as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "contact <EMAIL> please")
    assert(got(2L) == "server at <IP> and <IP>.")
    assert(got(3L) == "call <PHONE> or <PHONE> now")
    assert(got(4L) == "account <ID> then order 99999")
    // email eats its digits BEFORE the id pass: no <ID> inside
    assert(got(5L) == "mail <EMAIL> today")
  }

  test("scrub is idempotent and NULL-safe") {
    val s = spark
    import s.implicits._
    val once = fixture.select($"id", PiiScrub.scrub($"t").as("c"))
    val twice = once.select($"id", PiiScrub.scrub($"c").as("c"))
    assert(once.orderBy($"id").collect().toSeq ==
      twice.orderBy($"id").collect().toSeq)
    assert(once.where($"id" === 6L).head().isNullAt(1))
    val nullHits = PiiScrub.detectors.map { case (_, p, _) =>
      fixture.where($"id" === 6L)
        .select(PiiScrub.hitCount($"t", p)).head().getLong(0)
    }
    assert(nullHits.forall(_ == 0L))
  }

  test("fixture surface: every customer name carries exactly one id run") {
    val s = spark
    import s.implicits._
    val idPat = PiiScrub.detectors.find(_._1 == "id_number").get._2
    val r = graft.core.Tables.customer(s, sfDir)
      .agg(count(lit(1)).as("n"),
        sum(PiiScrub.hitCount($"c_name", idPat)).as("h")).head()
    assert(r.getLong(0) == r.getLong(1),
      s"one Customer#NNNNNNNNN id run per row: ${r.getLong(0)} rows, ${r.getLong(1)} hits")
  }
}
