package graft.streaming

import graft.SparkSpec
import graft.functions.{MgSummary, MisraGriesAggregator}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous heavy hitters: the Misra–Gries aggregator under
  * Structured Streaming complete mode. The engine keeps the ≤ k-entry
  * summary per group as streaming state and MERGES each micro-batch's
  * partial summary into it — the mergeable-summaries guarantee is
  * exactly what makes this sound: after any number of micro-batches the
  * state is a valid MG summary of the full stream (keys ⊇ every item
  * above n/(k+1), n exact, state O(groups × k) instead of O(distinct
  * items) — the property that lets a heavy-hitter dashboard run forever
  * over an unbounded token stream). The summary's candidate keys feed
  * the same exact pass-2 recount as batch q164. */
class StreamingHeavyHittersSpec extends SparkSpec {

  test("micro-batched MG summary keeps the superset guarantee over the union") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 3
    // two groups, zipf-ish: "hot" dominates g1, "warm" is borderline in g2
    val batches = Seq(
      Seq.fill(30)(("g1", "hot")) ++ Seq(("g1", "x1"), ("g1", "x2"), ("g2", "warm")),
      Seq.fill(25)(("g1", "hot")) ++ (1 to 20).map(i => ("g2", s"n$i")) ++
        Seq.fill(12)(("g2", "warm")),
      (1 to 15).map(i => ("g1", s"m$i")) ++ Seq.fill(8)(("g2", "warm")))

    val agg = new MisraGriesAggregator(k)
    val in = MemoryStream[(String, String)]
    val q = in.toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("summary"))
      .toDF("g", "summary")
      .writeStream.format("memory").queryName("mg_out")
      .outputMode("complete").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("mg_out")
        .as[(String, MgSummary)].collect().toMap
      val all = batches.flatten
      for ((g, sm) <- got) {
        val mine = all.filter(_._1 == g).map(_._2)
        assert(sm.n == mine.size, s"group $g: n must be exact")
        assert(sm.items.size <= k, s"group $g: state bound violated")
        val counts = mine.groupBy(identity).view.mapValues(_.size.toLong)
        counts.filter { case (_, c) => c * (k + 1) > mine.size }.foreach {
          case (item, c) =>
            assert(sm.items.contains(item),
              s"group $g: heavy item '$item' ($c of ${mine.size}) evicted: ${sm.items}")
        }
      }
      // the streaming candidates close the loop: an exact recount over
      // the replayed data restricted to them reproduces the true heavies
      val cands = got.flatMap { case (g, sm) => sm.items.keys.map(g -> _) }.toSet
      val exact = all.filter(cands.contains)
        .groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case ((g, _), c) => c * (k + 1) > all.count(_._1 == g) }
        .keys.toSet
      val want = all.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case ((g, _), c) => c * (k + 1) > all.count(_._1 == g) }
        .keys.toSet
      assert(exact == want, "pass-2 over streaming candidates must be exact")
    } finally q.stop()
  }
}
