package graft.streaming

import graft.SparkSpec
import graft.operators.SketchRollup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The realtime UV architecture end to end: raw micro-batches →
  * per-batch HLL sketch → union-UPSERT into a persisted parquet sketch
  * table (foreachBatch) → reports served from the table by sketch
  * rollup. The load-bearing assertion is cross-batch dedup: the same
  * user appearing in every micro-batch counts ONCE, because the state
  * merged per cell is a register bank, not a counter — the property
  * that lets the table replace a raw re-scan for distinct-user metrics
  * at any history length. */
class StreamingSketchTableSpec extends SparkSpec {

  test("foreachBatch sketch upsert: overlapping users across batches count once") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    // users 0-49 appear in EVERY batch (the overlap a counter would
    // double count); each batch adds a disjoint 20-user tail
    val batches = (0 until 3).map { b =>
      val overlap = (0L until 50L).map(u => ("play", u))
      val tail = (0L until 20L).map(u => ("play", 1000L + b * 20 + u))
      val other = (0L until 10L).map(u => ("pause", u % 7))
      overlap ++ tail ++ other
    }

    val store = java.nio.file.Files.createTempDirectory("graft_sketch_store")
      .toString + "/uv_sketch.parquet"
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("event_type", "user_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cur = SketchRollup.sketchTable(batch, Seq("event_type"), "user_id")
        val merged =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(store))) {
            val m = SketchRollup.mergeSketchTables(cur,
              batch.sparkSession.read.parquet(store), Seq("event_type"))
            // materialize BEFORE overwriting the table being read
            m.cache(); m.count(); m
          } else cur
        merged.write.mode("overwrite").parquet(store)
        merged.unpersist()
        ()
      }
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val served = SketchRollup.rollupEstimate(
      spark.read.parquet(store), Seq("event_type"))
      .select($"event_type", $"uv").as[(String, Long)].collect().toMap

    val all = batches.flatten.toDF("event_type", "user_id")
    val direct = SketchRollup.rollupEstimate(
      SketchRollup.sketchTable(all, Seq("event_type"), "user_id"),
      Seq("event_type"))
      .select($"event_type", $"uv").as[(String, Long)].collect().toMap
    assert(served == direct,
      s"served-from-table $served must equal direct-over-history $direct")

    // at these cardinalities the HLL sparse mode is exact: pin true counts
    assert(served("play") == 50 + 3 * 20, s"play UV: ${served("play")}")
    assert(served("pause") == 7, s"pause UV: ${served("pause")}")
  }
}
