package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StreamingSpanScrub: incremental first-occurrence span survival.
  * (1) spans seen in an earlier batch vanish from later batches;
  * (2) the micro-batched composition equals one big batch (doc order =
  * arrival order); (3) a retried batch returns identical output and
  * leaves no duplicate index rows — the q134 contract, streamed. */
class StreamingSpanScrubSpec extends SparkSpec {

  private def mkDocs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val boiler = (1 to 16).map(i => s"bp$i").mkString(" ")
  private def body(tag: String) = (1 to 16).map(i => s"$tag$i").mkString(" ")

  test("spans seen in an earlier batch vanish; own content survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sscrub").toString
    val b0 = StreamingSpanScrub.scrubAndIndex(
      mkDocs(0L -> s"$boiler ${body("a")}"), dir, 0L)
      .as[(Long, Long, Long, String)].collect()
    assert(b0.head == ((0L, 2L, 2L, s"$boiler ${body("a")}")))
    val b1 = StreamingSpanScrub.scrubAndIndex(
      mkDocs(1L -> s"$boiler ${body("b")}"), dir, 1L)
      .as[(Long, Long, Long, String)].collect()
    // boilerplate span was indexed by batch 0 → only the fresh body stays
    assert(b1.head == ((1L, 2L, 1L, body("b"))))
  }

  test("micro-batched scrub equals one big batch when arrival order = doc order") {
    import spark.implicits._
    val docs = Seq(
      0L -> s"$boiler ${body("a")}",
      1L -> s"${body("a")} ${body("c")}",
      2L -> s"$boiler ${body("c")} ${body("d")}",
      3L -> body("d"))
    val dirS = java.nio.file.Files.createTempDirectory("graft_ss_s").toString
    val streamed = docs.zipWithIndex.flatMap { case (row, i) =>
      StreamingSpanScrub.scrubAndIndex(mkDocs(row), dirS, i.toLong)
        .as[(Long, Long, Long, String)].collect()
    }.map { case (d, n, k, t) => d -> ((n, k, t)) }.toMap
    val dirB = java.nio.file.Files.createTempDirectory("graft_ss_b").toString
    val oneShot = StreamingSpanScrub.scrubAndIndex(mkDocs(docs: _*), dirB, 0L)
      .as[(Long, Long, Long, String)].collect()
      .map { case (d, n, k, t) => d -> ((n, k, t)) }.toMap
    assert(streamed == oneShot)
    // and the cross-doc dedup actually happened: doc 3 is fully scrubbed
    assert(streamed(3L) == ((1L, 0L, "")))
  }

  test("a retried batch returns identical output and no duplicate index rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_r").toString
    StreamingSpanScrub.scrubAndIndex(mkDocs(0L -> s"$boiler ${body("a")}"), dir, 0L).count()
    val first = StreamingSpanScrub.scrubAndIndex(
      mkDocs(1L -> s"$boiler ${body("b")}"), dir, 1L)
      .as[(Long, Long, Long, String)].collect().toSet
    val idxAfterFirst = spark.read.parquet(s"$dir/spans").count()
    // simulate the at-least-once retry: same batch, same batchId
    val retry = StreamingSpanScrub.scrubAndIndex(
      mkDocs(1L -> s"$boiler ${body("b")}"), dir, 1L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(retry == first, "retry changed the scrub verdicts")
    assert(spark.read.parquet(s"$dir/spans").count() == idxAfterFirst,
      "retry duplicated index rows")
  }
}
