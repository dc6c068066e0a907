package graft.streaming

import graft.operators.SeqPacker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming shard EXPORT — lands [[StreamingPacker]]'s emissions on
  * disk incrementally, completing stream → pack → artifact (batch
  * [[SeqPacker.writeShards]] is the offline tier; this is its
  * micro-batch twin, the `VectorIndex.ingestSink` idiom).
  *
  * Layout: `dir/data/batch_id=N/lang=…/bucket=…` placement rows plus
  * `dir/manifest/batch_id=N` per-(batch, shard) rows. Retry stability
  * is per-batch idempotence WITHOUT a sidecar: [[appendBatch]] rewrites
  * ONLY its own `batch_id=N` subtrees (delete-then-write), so a crashed
  * or redelivered micro-batch converges and no other batch is ever
  * touched — exactly `VectorIndex.appendTo`'s contract.
  *
  * Manifest mergeability (the design pitfall SURVEY's round-10 queue
  * records, resolved here): per-batch rows carry pieces, token mass and
  * the order-free XOR fingerprint — all of which merge across batches
  * by sum/sum/xor — but deliberately NOT a per-batch sequence count: an
  * open sequence legally SPANS micro-batches under next-fit, so
  * per-batch distinct-seq counts double-count at the seam. [[census]]
  * derives global n_seqs from the merged data at read time instead,
  * and cross-checks the mergeable stats against the data (`ok`), so
  * a lost or doubled batch surfaces exactly as in the batch export's
  * q249 round-trip census. */
object StreamingExport {

  /** Read-side schemas (explicit, so an empty export reads back —
    * the [[SeqPacker.readShards]] rule). Partition columns:
    * (batch_id) then (lang, bucket) under data. */
  val dataSchema: StructType = StructType(Seq(
    StructField("ord1", LongType), StructField("ord2", LongType),
    StructField("docId", LongType), StructField("size", LongType),
    StructField("seq", LongType), StructField("batch_id", LongType),
    StructField("lang", StringType), StructField("bucket", LongType)))

  val manifestSchema: StructType = StructType(Seq(
    StructField("lang", StringType), StructField("bucket", LongType),
    StructField("n_pieces", LongType), StructField("sum_tokens", LongType),
    StructField("checksum", LongType), StructField("batch_id", LongType)))

  /** Appends one micro-batch of placements: placement rows under
    * `data/batch_id=N` (directory-partitioned by (lang, bucket) inside,
    * hash-repartitioned so shard dirs don't explode into small files)
    * and the batch's mergeable manifest rows under `manifest/batch_id=N`.
    * Rewrites only its OWN batch subtrees — redelivery-idempotent. */
  def appendBatch(placed: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = placed.sparkSession
    val dataP = new org.apache.hadoop.fs.Path(s"$dir/data/batch_id=$batchId")
    val manP = new org.apache.hadoop.fs.Path(s"$dir/manifest/batch_id=$batchId")
    val fs = dataP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // checkpoint BEFORE deleting: consumed by the data write AND the
    // manifest agg — and a redelivered frame may be derived from the
    // very batch_id subtree the deletes below are about to drop
    val df = placed.select(col("lang"), col("bucket"), col("ord1"),
      col("ord2"), col("docId"), col("size"), col("seq")).localCheckpoint()
    fs.delete(dataP, true)
    fs.delete(manP, true)
    df.repartition(col("lang"), col("bucket"))
      .write.partitionBy("lang", "bucket").parquet(dataP.toString)
    df.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_pieces"),
        sum(col("size")).as("sum_tokens"),
        SeqPacker.pieceChecksum.as("checksum"))
      .coalesce(1).write.parquet(manP.toString)
  }

  /** foreachBatch sink: `StreamingPacker.placed(pieces, cap).toDF()
    * .writeStream.foreachBatch(StreamingExport.sink(dir))`. */
  def sink(dir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => appendBatch(batch, dir, batchId)

  /** All placement rows ever landed (batch_id as a column). */
  def readPlaced(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(dataSchema).parquet(s"$dir/data")

  /** Global per-shard census with manifest cross-check: n_pieces /
    * sum_tokens / checksum fold from the per-batch manifest rows
    * (sum/sum/xor — O(batches × shards) rows, data files untouched);
    * n_seqs comes from the merged DATA (sequences span batches); `ok`
    * is 1 iff the data reproduces the folded manifest. */
  def census(spark: SparkSession, dir: String): DataFrame = {
    val man = spark.read.schema(manifestSchema)
      .parquet(s"$dir/manifest")
      .groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n_pieces")).as("n_pieces"),
        sum(col("sum_tokens")).as("sum_tokens"),
        bit_xor(col("checksum")).as("checksum"))
    val data = readPlaced(spark, dir)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("d_pieces"),
        countDistinct(col("seq")).as("n_seqs"),
        sum(col("size")).as("d_tokens"),
        SeqPacker.pieceChecksum.as("d_sum"))
    man.join(data, Seq("lang", "bucket"), "full")
      .select(col("lang"), col("bucket").as("shard"),
        col("n_pieces"), col("n_seqs"), col("sum_tokens"),
        (coalesce(col("d_pieces"), lit(-1L)) === col("n_pieces") &&
          coalesce(col("d_tokens"), lit(-1L)) === col("sum_tokens") &&
          coalesce(col("d_sum"), lit(Long.MinValue)) === col("checksum"))
          .cast("long").as("ok"))
      .orderBy(col("lang"), col("shard"))
  }
}
