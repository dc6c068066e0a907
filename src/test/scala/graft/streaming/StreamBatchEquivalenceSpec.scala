package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** SURVEY §5 test strategy: replay the events fixture through the
  * streaming operators and check the result equals the same computation
  * run as a batch query — the invariant that makes foreachBatch-style
  * reports trustworthy. */
class StreamBatchEquivalenceSpec extends SparkSpec {

  test("nodeTimeCounts over replayed fixture equals batch windowed agg") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = graft.core.Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"user_id", $"value")
      .as[(Timestamp, String, Long, Double)]
      .collect()

    val in = MemoryStream[(Timestamp, String, Long, Double)]
    val df = in.toDF().toDF("ts", "event_type", "user_id", "value")
    val q = StreamingOps.nodeTimeCounts(df, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("equiv_t")
      .outputMode("append").start()
    // replay in three chunks (micro-batches), then push the watermark past
    // the fixture's horizon so every window closes
    events.grouped(math.max(1, events.length / 3)).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    in.addData((Timestamp.valueOf("2030-01-01 00:00:00"), "flush", -1L, 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("equiv_t")
      .where($"event_type" =!= "flush")
      .select($"node_time", $"event_type", $"n_events", round($"sum_value", 4).as("sv"))
      .as[(Timestamp, String, Long, Double)].collect().toSet

    val batch = graft.core.Tables.events(spark, sfDir)
      .groupBy(window($"ts", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sv"))
      .select($"window.start", $"event_type", $"n_events", $"sv")
      .as[(Timestamp, String, Long, Double)].collect().toSet

    assert(streamed == batch)
  }

  test("onlineStatus over replayed fixture matches batch heartbeat replay") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    // click = start, error = finish, others = heartbeat
    val events = graft.core.Tables.events(spark, sfDir)
      .orderBy($"ts").limit(300)
      .collect().map { r =>
        val kind = r.getAs[String]("event_type") match {
          case "click" => "start"
          case "error" => "finish"
          case _       => "heartbeat"
        }
        PlayEvent(r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"), kind, "svc")
      }

    val in = MemoryStream[PlayEvent]
    val q = StreamingOps.onlineStatus(in.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("equiv_online")
      .outputMode("append").start()
    events.grouped(100).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("equiv_online").as[StatusChange].collect()

    // single-threaded reference replay of the same transition rules
    val byUser = events.groupBy(_.userId)
    val expected = byUser.toSeq.flatMap { case (uid, evs) =>
      var online = false
      var playCount = 0L
      evs.sortBy(_.ts.getTime).flatMap { e =>
        e.kind match {
          case "start" =>
            online = true; playCount += 1
            Some((uid, true, playCount))
          case "heartbeat" if !online =>
            online = true
            Some((uid, true, playCount))
          case "finish" if online =>
            online = false
            Some((uid, false, playCount))
          case _ => None
        }
      }
    }.groupBy(identity).view.mapValues(_.size).toMap

    val got = streamed.map(c => (c.userId, c.online, c.playCount)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expected)
  }
}
