package graft.streaming

import graft.SparkSpec
import graft.functions.{ScoredId, TopKAggregator}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The typed heap top-k aggregator under Structured Streaming: in
  * complete mode the engine keeps the ≤k buffer per group as streaming
  * state and merges each micro-batch into it — the same bounded-state
  * property that makes the operator scale in batch makes its streaming
  * state O(groups × k) instead of O(rows). Replay the input in three
  * uneven micro-batches and require the final answer to equal the
  * one-shot batch aggregation over the union. */
class StreamingTopKSpec extends SparkSpec {

  test("micro-batched heap top-k converges to the batch answer") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq(("a", 1L, 10L), ("a", 2L, 30L), ("b", 7L, 5L)),
      Seq(("a", 3L, 20L), ("b", 8L, 50L)),
      Seq(("a", 4L, 40L), ("a", 5L, 25L), ("b", 9L, 50L), ("b", 10L, 1L)))

    def shaped(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", struct($"id", $"score").as("s")).as[(String, ScoredId)]
        .groupByKey(_._1)
        .agg(new TopKAggregator(2).toColumn.name("top"))

    val in = MemoryStream[(String, Long, Long)]
    val q = shaped(in.toDF().toDF("g", "id", "score"))
      .toDF("g", "top")
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("topk_out")
        .select($"g", $"top").as[(String, Seq[ScoredId])].collect().toMap
      val want = shaped(batches.flatten.toDF("g", "id", "score"))
        .collect().toMap
      assert(streamed == want,
        s"streamed $streamed vs batch $want")
      // the tie at score=50 in group b must resolve by id both ways
      assert(streamed("b").head == ScoredId(8L, 50L))
    } finally q.stop()
  }
}
