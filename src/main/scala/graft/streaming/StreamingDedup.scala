package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.fingerprint
import graft.operators.NearDup

/** Streaming incremental corpus dedup — the per-micro-batch realization
  * of q106 (`queries/CorpusOpsQueries`): every arriving document is
  * classified against a PERSISTED fingerprint/band index as
  * `exact_dup` (fingerprint already in the corpus), `near_dup` (shares
  * a MinHash LSH band bucket), or `new`; then the batch's own rows are
  * appended to the index so later batches — and later documents inside
  * the same batch, via the in-batch min-doc_id rule — see them.
  *
  * This is the ingestion-time dedup the reference's daily jobs
  * approximate with full-table rewrites (`etl/LogDelay.scala` re-reads
  * yesterday wholesale): here the corpus index is the only persistent
  * state and each trigger costs O(batch + matched buckets), never a
  * corpus rescan.
  *
  * Scale notes: both membership checks are semi-joins against
  * DISTINCT-projected parquet indexes — the same plan shape as q106,
  * which ScaleProbe measured flat at 10×. Index rows carry the writing
  * `batch_id` (a partition column): membership reads EXCLUDE the current
  * batch's id and the write dynamically overwrites only that batch's
  * partitions, so an at-least-once foreachBatch RETRY can neither see
  * its own prior half-written attempt (which would flip every doc to
  * `exact_dup` by self-match) nor leave duplicate index rows behind —
  * verdicts are stable under retry by construction. At lake scale the
  * two index dirs map 1:1 to Delta tables and the band index gets
  * bucket-partitioned so the semi-join prunes files.
  */
object StreamingDedup {

  /** Classify one (batch) DataFrame of `(doc_id, text)` against the
    * index at `indexDir`, write the batch's fingerprint/band rows into
    * the index under its `batchId`, and return the verdicts
    * `(doc_id, verdict)`. The returned frame is materialized
    * (localCheckpoint) BEFORE the index write — its plan reads the index
    * lazily, so writing first would make every document match itself.
    * Membership reads skip `batch_id = batchId` and the write overwrites
    * exactly that partition, so a retried batch never sees (or
    * duplicates) its own prior attempt. */
  def classifyAndIndex(batch: DataFrame, indexDir: String, batchId: Long,
      k: Int = 3, nh: Int = 9, b: Int = 3, r: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fpPath = new Path(s"$indexDir/fp")
    val bandPath = new Path(s"$indexDir/bands")
    val fs = fpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // exclude THIS batch's partitions: on a retry they hold the failed
    // attempt's rows (partition pruning makes the exclusion free)
    def readIf(p: Path): Option[DataFrame] =
      if (fs.exists(p))
        Some(spark.read.parquet(p.toString).where($"batch_id" =!= batchId))
      else None

    val docs = batch.select($"doc_id", $"text").persist()
    try {
      val fp = docs.select($"doc_id", fingerprint($"text").as("fp")).persist()
      val bands = NearDup.lshBands(docs, "doc_id", "text", k, nh, b, r).persist()
      try {
        // --- membership vs the persisted corpus index --------------------
        val exactIdx = readIf(fpPath).map(idx =>
            fp.join(idx.select($"fp").distinct(), Seq("fp"), "left_semi")
              .select($"doc_id"))
          .getOrElse(fp.limit(0).select($"doc_id"))
        val nearIdx = readIf(bandPath).map(idx =>
            bands.join(idx.select($"band_idx", $"band_hash").distinct(),
                Seq("band_idx", "band_hash"), "left_semi")
              .select($"doc_id").distinct())
          .getOrElse(fp.limit(0).select($"doc_id"))
        // --- in-batch: min doc_id per bucket survives, the rest match it --
        val exactInBatch = fp
          .withColumn("mn", min($"doc_id").over(Window.partitionBy($"fp")))
          .filter($"doc_id" > $"mn").select($"doc_id")
        val nearInBatch = bands
          .withColumn("mn",
            min($"doc_id").over(Window.partitionBy($"band_idx", $"band_hash")))
          .filter($"doc_id" > $"mn").select($"doc_id").distinct()

        val exactIds = exactIdx.union(exactInBatch).distinct()
          .withColumn("is_exact", lit(1))
        val nearIds = nearIdx.union(nearInBatch).distinct()
          .withColumn("is_near", lit(1))
        val verdicts = docs.select($"doc_id")
          .join(exactIds, Seq("doc_id"), "left")
          .join(nearIds, Seq("doc_id"), "left")
          .select($"doc_id",
            when($"is_exact" === 1, "exact_dup")
              .when($"is_near" === 1, "near_dup")
              .otherwise("new").as("verdict"))
          // eager: must be computed before the appends below
          .localCheckpoint()

        def writeIdx(df: DataFrame, p: Path): Unit =
          df.withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(p.toString)
        writeIdx(fp, fpPath)
        writeIdx(bands, bandPath)
        verdicts
      } finally { fp.unpersist(); bands.unpersist() }
    } finally { docs.unpersist() }
  }

  /** foreachBatch sink: classify each micro-batch, hand the verdicts to
    * `onVerdicts` (report table upsert, router, metrics), grow the index.
    * Wire as `stream.writeStream.foreachBatch(incrementalDedupSink(...))`. */
  def incrementalDedupSink(indexDir: String,
      onVerdicts: (DataFrame, Long) => Unit,
      k: Int = 3, nh: Int = 9, b: Int = 3, r: Int = 3): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      onVerdicts(classifyAndIndex(batch, indexDir, batchId, k, nh, b, r), batchId)
}
