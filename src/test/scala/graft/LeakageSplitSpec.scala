package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{ConnectedComponents, NearDup}

/** q117's whole point: a near-dup PAIR must never straddle train/eval.
  * Rebuild the per-doc split assignment exactly as the query does, then
  * check every q47 candidate pair lands in one split. */
class LeakageSplitSpec extends SparkSpec {

  test("no near-dup pair straddles the q117 split boundary") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val bands = NearDup.lshBands(docs, "doc_id", "text", 3, 9, 3, 3)
      .select($"doc_id", concat_ws("|", $"band_idx", $"band_hash").as("bucket"))
    val comps = ConnectedComponents.minLabelByBucket(bands, "doc_id", "bucket")
      .withColumnRenamed("id", "doc_id")
    val bucket = pmod(graft.functions.DedupFunctions.hash32(
      concat(lit("split:"), $"comp".cast("string"))), lit(10L))
    val split = docs.select($"doc_id")
      .join(comps, Seq("doc_id"), "left")
      .withColumn("comp", coalesce($"comp", $"doc_id"))
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .select($"doc_id", $"split")
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text", 3, 9, 3, 3)
    val bad = pairs
      .join(split.select($"doc_id".as("doc_a"), $"split".as("sa")), Seq("doc_a"))
      .join(split.select($"doc_id".as("doc_b"), $"split".as("sb")), Seq("doc_b"))
      .filter($"sa" =!= $"sb")
    assert(bad.count() == 0, "a near-dup pair crossed the split boundary")
  }
}
