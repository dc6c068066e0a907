package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ConcurrencyMachineSpec extends SparkSpec {

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      body
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("ordered replay reproduces the batch q98 hourly peaks") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the q98 delta derivation: per (user, day, type) interval -> ±1
    val iv = Tables.events(spark, sfDir)
      .groupBy($"user_id", date_format($"ts", "yyyy-MM-dd").as("day"),
        $"event_type")
      .agg(min(unix_timestamp($"ts")).as("st"), max(unix_timestamp($"ts")).as("en"))
    val deltas = iv.select(
        concat_ws("|", $"day", $"event_type").as("key"),
        explode(array(
          struct($"st".as("t"), lit(1L).as("d")),
          struct($"en".as("t"), lit(-1L).as("d")))).as("x"))
      .select($"key", $"x.t".as("t"), $"x.d".as("d"))
      .as[(String, Long, Long)].collect()
      .map { case (k, t, d) => ConcDelta(k, t, d) }
      .sortBy(_.tSec)
    // split at a timestamp boundary: cutting inside an equal-timestamp
    // group would apply the collapse rule to two partial sums
    val mid = deltas.length / 2
    val cut = (mid until deltas.length)
      .find(i => deltas(i).tSec != deltas(i - 1).tSec)
      .getOrElse(deltas.length)
    val (b1, b2) = deltas.splitAt(cut)

    val peaks = withRocksDb {
      val in = MemoryStream[ConcDelta]
      val q = ConcurrencyMachine.hourlyPeaks(in.toDS())
        .writeStream.format("memory").queryName("conc_t")
        .outputMode("append").start()
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      q.stop()
      spark.table("conc_t").as[ConcPeak].collect().toSeq
    }
    val streaming = peaks.groupBy(p => (p.key, p.hr))
      .map { case ((k, h), ps) => (k, h, ps.map(_.peak).max) }.toSet

    // batch q98 reports (day, hour-of-day); the machine reports the
    // globally-unique epoch hour — align by day·24h + hr (UTC session tz)
    val batch = graft.queries.BehaviorQueries
      .queries("q98_concurrency")(spark, sfDir)
      .select(concat_ws("|", $"day", $"event_type"),
        ((unix_timestamp(to_timestamp($"day")) + $"hr" * 3600L) / 3600L)
          .cast("long"),
        $"peak")
      .as[(String, Long, Long)].collect().toSet
    assert(streaming == batch)
  }

  test("simultaneous deltas collapse before the sweep (tie rule)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val peaks = withRocksDb {
      val in = MemoryStream[ConcDelta]
      val q = ConcurrencyMachine.hourlyPeaks(in.toDS())
        .writeStream.format("memory").queryName("conc_tie_t")
        .outputMode("append").start()
      // +1 and -1 at the same instant: net 0 from conc 1 — peak must be
      // 1 (collapsed), not 2 (if +1 were applied before -1 separately)
      in.addData(
        ConcDelta("k", 10L, 1L),
        ConcDelta("k", 20L, 1L), ConcDelta("k", 20L, -1L),
        ConcDelta("k", 30L, -1L))
      q.processAllAvailable()
      q.stop()
      spark.table("conc_tie_t").as[ConcPeak].collect().toSeq
    }
    assert(peaks == Seq(ConcPeak("k", 0L, 1L)))
  }
}
