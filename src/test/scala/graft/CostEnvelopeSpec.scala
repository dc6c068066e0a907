package graft

import graft.core.JobTimer

/** Cost envelopes for the two inherently-expensive queries (VERDICT r3
  * item 9): q96's 8-gram census and q83's backfill I/O are allowed to be
  * the slow tail, but a silent super-linear regression (an accidental
  * cartesian, a lost pushdown, a global window) must fail a spec, not
  * drift into the bench. Bounds are measured through [[JobTimer]] — the
  * ops-side listener the envelope exists for — as min-of-2 at the Verify
  * scale factor, with a deliberately generous ceiling: SCALE.md's 1×
  * entries put both well under 3 s here, and a genuine plan regression
  * jumps 10-100×, so a loose bound catches every real blowup while a
  * shared-box CPU spike (±25% per the bench notes) cannot flake it. */
class CostEnvelopeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Min-of-2 wall seconds for one query, as JobTimer records it. */
  private def timedSec(name: String): Double = {
    val t = JobTimer.install(spark)
    try {
      val runs = (1 to 2).map { _ =>
        val before = t.entries.size
        SparkEntry.queries(name)(spark, dir).count()
        // listener delivery is async — wait for the action to land
        var tries = 0
        while (t.entries.size == before && tries < 100) {
          Thread.sleep(100); tries += 1
        }
        val recorded = t.entries.drop(before)
        assert(recorded.nonEmpty, s"JobTimer recorded no action for $name")
        recorded.map(_.millis).max / 1000.0
      }
      runs.min
    } finally JobTimer.uninstall(spark, t)
  }

  test("q96 8-gram census stays inside its cost envelope (no silent blowup)") {
    val sec = timedSec("q96_ngram_hotspots")
    assert(sec <= 30.0, f"q96 took $sec%.1f s at sf0.01 — envelope is 30 s")
  }

  test("q83 backfill I/O stays inside its cost envelope") {
    val sec = timedSec("q83_backfill_patch")
    assert(sec <= 30.0, f"q83 took $sec%.1f s at sf0.01 — envelope is 30 s")
  }
}
