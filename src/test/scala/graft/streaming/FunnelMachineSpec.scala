package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class FunnelMachineSpec extends SparkSpec {

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

  test("ordered replay of the fixture matches the batch q101 step times") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
      .where($"event_type".isin("view", "click", "purchase"))
      .select($"user_id",
        // any deterministic ts→long mapping works: the same values feed
        // both the machine and the batch truth below
        ($"ts".cast("double") * 1000).cast("long").as("ts_ms"),
        $"event_type")
      .as[(Long, Long, String)].collect()
      .map { case (u, t, k) => FunnelEvent(u, t, k) }
      .sortBy(_.tsMs)
    // two event-time-ordered batches
    val (b1, b2) = ev.splitAt(ev.length / 2)

    val steps = withRocksDb {
      val in = MemoryStream[FunnelEvent]
      val q = FunnelMachine.funnelSteps(in.toDS())
        .writeStream.format("memory").queryName("funnel_t")
        .outputMode("append").start()
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      q.stop()
      spark.table("funnel_t").as[FunnelStep].collect().toSeq
    }
    // batch truth: q101's per-user CTE chain on the same rows
    val e = ev.toSeq.toDF("userId", "tsMs", "eventType")
    val v = e.filter($"eventType" === "view")
      .groupBy($"userId").agg(min($"tsMs").as("t1"))
    val c = e.filter($"eventType" === "click").join(v, "userId")
      .filter($"tsMs" >= $"t1")
      .groupBy($"userId").agg(min($"tsMs").as("t2"))
    val p = e.filter($"eventType" === "purchase").join(c, "userId")
      .filter($"tsMs" >= $"t2")
      .groupBy($"userId").agg(min($"tsMs").as("t3"))
    val truth =
      v.select($"userId", lit(1).as("step"), $"t1".as("tsMs")).union(
        c.select($"userId", lit(2), $"t2")).union(
        p.select($"userId", lit(3), $"t3"))
        .as[FunnelStep].collect().toSeq
    assert(steps.sortBy(s => (s.userId, s.step)) ==
      truth.sortBy(s => (s.userId, s.step)))
  }

  test("each step fires once; out-of-order stragglers are ignored") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = withRocksDb {
      val in = MemoryStream[FunnelEvent]
      val q = FunnelMachine.funnelSteps(in.toDS())
        .writeStream.format("memory").queryName("funnel_oo_t")
        .outputMode("append").start()
      in.addData(
        FunnelEvent(1L, 100L, "view"),
        FunnelEvent(1L, 200L, "click"))
      q.processAllAvailable()
      in.addData(
        FunnelEvent(1L, 150L, "purchase"), // before t2 — must NOT fire
        FunnelEvent(1L, 300L, "purchase"), // fires
        FunnelEvent(1L, 400L, "purchase"), // step done — ignored
        FunnelEvent(1L, 50L, "view"))      // straggler view — ignored
      q.processAllAvailable()
      q.stop()
      spark.table("funnel_oo_t").as[FunnelStep].collect().toSeq
        .sortBy(_.step)
    }
    assert(steps == Seq(
      FunnelStep(1L, 1, 100L), FunnelStep(1L, 2, 200L), FunnelStep(1L, 3, 300L)))
  }
}
