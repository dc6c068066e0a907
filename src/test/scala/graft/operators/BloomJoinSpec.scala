package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** BloomJoin: the explicit runtime-filter semi-join (q128's operator).
  * Proves (1) the composition is exact vs a plain semi-join, (2) the
  * bloom prefilter actually prunes (passes fewer rows than the scan,
  * at least as many as the exact match set — false positives only,
  * never false negatives), (3) the probe is the codegen'd
  * `might_contain` sitting in a Filter, not a join. */
class BloomJoinSpec extends SparkSpec {

  private lazy val dim = Tables.orders(spark, sfDir)
    .filter(col("o_totalprice") > 200000.0).select("o_orderkey")
  private lazy val fact = Tables.lineitem(spark, sfDir)

  test("prunedSemiJoin equals exact left_semi join") {
    val got = BloomJoin.prunedSemiJoin(fact, "l_orderkey", dim, "o_orderkey", 10000L)
      .select("l_orderkey", "l_linenumber")
    val want = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("bloom prefilter: no false negatives, prunes the non-matching bulk") {
    val sketch = BloomJoin.buildSketch(dim, "o_orderkey", 10000L)
    val total = fact.count()
    val bloomPass = fact.filter(BloomJoin.mightContain(sketch, fact("l_orderkey"))).count()
    val exact = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"), "left_semi").count()
    assert(bloomPass >= exact, "bloom dropped a true match (false negative)")
    assert(bloomPass < total, "bloom pruned nothing")
    // sized for ~3% fpp at estItems >> |dim|: false-positive volume must
    // stay a small fraction of the non-matching rows
    assert(bloomPass - exact <= (total - exact) / 10,
      s"fp volume too high: pass=$bloomPass exact=$exact total=$total")
  }

  test("probe is a codegen'd filter expression, not a join") {
    val sketch = BloomJoin.buildSketch(dim, "o_orderkey", 10000L)
    val plan = fact.filter(BloomJoin.mightContain(sketch, fact("l_orderkey")))
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("might_contain"), s"probe missing from plan:\n$s")
    assert(!s.toLowerCase.contains("join"), "probe planned as a join")
    // stays inside whole-stage codegen (BloomFilterMightContain.doGenCode):
    // the `*(n)` prefix on the Filter is the codegen-stage marker
    assert(s.contains("*(1) Filter might_contain"), "probe fell out of codegen")
  }
}
