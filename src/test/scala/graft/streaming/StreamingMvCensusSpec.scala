package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The persisted-state census must equal the batch q230 MV census
  * exactly, under uneven batch splits AND an at-least-once retry of an
  * already-landed batch (the dynamic-partition-overwrite idempotence
  * contract). */
class StreamingMvCensusSpec extends SparkSpec {

  test("3-batch ingest + a retried batch reproduce the q230 census") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mv_census").toString
    val docPath = s"$dir/doc"; val vocabPath = s"$dir/vocab"
    try {
      val docs = Tables.documents(s, sfDir)
        .where($"doc_id".isNotNull && $"text".isNotNull)
        .localCheckpoint()
      // uneven deterministic split: md5 bucket of the doc id
      val bucket = abs(graft.functions.DedupFunctions.hash32(
        concat(lit("mv:"), $"doc_id".cast("string")))) % 5
      val sink = StreamingMvCensus.sink(docPath, vocabPath)
      sink(docs.where(bucket === 0), 0L)
      sink(docs.where(bucket.isin(1, 2)), 1L)
      sink(docs.where(bucket.isin(3, 4)), 2L)
      // at-least-once retry: batch 1 lands again, must not double-count
      sink(docs.where(bucket.isin(1, 2)), 1L)
      val got = StreamingMvCensus.census(s, docPath, vocabPath)
      val exp = graft.SparkEntry
        .queries("q230_incremental_census")(s, sfDir)
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        "served census must equal the batch q230 MV census exactly")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir)); ()
    }
  }
}
