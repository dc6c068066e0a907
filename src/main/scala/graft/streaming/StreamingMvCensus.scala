package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming incremental materialized-view census — q230's merge
  * algebra (`queries/CorpusOpsQueries`) run as an ingest loop in the
  * [[StreamingCentroidMonitor]] architecture: each arriving document
  * micro-batch reduces to per-language MERGEABLE states, the states
  * land in the batch's own `batch_id=` partition (idempotent under
  * foreachBatch's at-least-once retries), and the serving census folds
  * partitions without ever rescanning raw history — the reference's
  * daily full-rewrite report jobs become O(batch) per trigger.
  *
  * Two state families, because their merges differ:
  *   - doc-grain counters (docs, char mass, id range): SUM/MIN/MAX —
  *     O(langs) rows per batch;
  *   - exact distinct vocabulary: a per-batch DISTINCT (lang, token)
  *     set whose serving merge is a distinct-union (distinct COUNTS do
  *     not add across batches) — Heaps-sublinear rows per batch; the
  *     100 TB swap is the HLL sketch state `Monitor.stateReport`
  *     already serves (q08's accuracy contract), same layout.
  */
object StreamingMvCensus {

  /** Per-language doc-grain states of one batch. */
  def docStates(batch: DataFrame): DataFrame =
    batch
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))

  /** Distinct (lang, token) vocabulary rows of one batch. */
  def vocabStates(batch: DataFrame): DataFrame =
    batch
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .distinct()

  /** foreachBatch sink: land both state families in the batch's OWN
    * `batch_id=` partition via dynamic partition overwrite — a retried
    * batch recomputes the same deterministic states and overwrites only
    * itself, so nothing double-counts (the StreamingDedup/VectorIndex/
    * StreamingCentroidMonitor idempotence contract). Wire as
    * `docStream.writeStream.foreachBatch(sink(docPath, vocabPath))`. */
  def sink(docPath: String, vocabPath: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      docStates(batch)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(docPath)
      vocabStates(batch)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(vocabPath)
      ()
    }

  /** Serving census from the persisted states: the q230 output shape
    * (lang, n_docs, sum_chars, min_doc, max_doc, n_vocab,
    * chars_per_doc) — counters fold by SUM/MIN/MAX, vocabulary by
    * distinct-union; raw document history is never read. */
  def census(spark: SparkSession, docPath: String,
      vocabPath: String): DataFrame = {
    val doc = spark.read.parquet(docPath)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        min(col("min_doc")).as("min_doc"), max(col("max_doc")).as("max_doc"))
    val voc = spark.read.parquet(vocabPath)
      .groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("n_vocab"))
    doc.join(voc, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("sum_chars"), col("min_doc"),
        col("max_doc"), col("n_vocab"),
        expr("sum_chars DIV n_docs").as("chars_per_doc"))
  }
}
