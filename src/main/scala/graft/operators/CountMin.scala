package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms '05) as a
  * persisted sketch TABLE — the point-frequency member of the
  * mergeable-sketch family the engine already carries (HLL distinct
  * counts: q08/[[SketchRollup]]; GK quantiles: q182; Misra–Gries heavy
  * hitters: q164/q174): a d×w integer counter matrix per group, each
  * item bumping one counter per hash row, point estimate = MIN over the
  * d row counters — always an OVERcount (collisions only add), within
  * ε·N at ε = e/w with probability 1−e^−d.
  *
  * Counters merge by plain integer addition, so the table is
  * partial-aggregatable map-side (the exchange carries at most
  * groups·d·min(w, distinct keys) sparse counter rows regardless of
  * stream length), unions across ingest batches are associative and
  * retry-idempotent BY ALGEBRA when combined with batch_id partitions
  * (the [[SketchRollup]] serving contract), and a 100 TB stream's
  * frequency table stays O(groups·d·w) longs. Unlike Misra–Gries (which
  * keeps only the k heaviest), CMS answers point queries for ANY key
  * after the fact — the trade is overcount instead of omission.
  *
  * Hashing is the repo's engine-replicable md5 idiom (salted hex prefix
  * → BIGINT → mod w), so an external SQL engine reproduces the entire
  * counter matrix bit-for-bit — the property that lets q202 hash-match
  * its oracle in the COLLISION regime, not just the exact one (the
  * stronger form of q182's exact-regime trick). Production can swap a
  * cheaper hash; the algebra is hash-agnostic.
  */
object CountMin {

  /** Row-r bucket of a string key: md5("cm{r}:" + key) hex prefix mod w
    * — deterministic, engine-replicable, uniform enough for the CMS
    * bound (md5 prefixes pass as pairwise-independent here). */
  def bucket(key: Column, r: Int, w: Int): Column =
    conv(substring(md5(concat(lit(s"cm$r:"), key).cast("binary")), 1, 8),
      16, 10).cast("long") % w

  /** DuckDB mirror of [[bucket]] for oracle construction. */
  def duckBucket(keyExpr: String, r: Int, w: Int): String =
    s"(('0x' || substr(md5('cm$r:' || $keyExpr), 1, 8))::BIGINT % $w)"

  /** Per-group SPARSE counter table (groupCols..., r, b, cnt): zero
    * counters are absent — readers treat a missing (r, b) as 0. One
    * narrow explode (d rows per item) + one map-side-combinable count. */
  def sketchTable(df: DataFrame, groupCols: Seq[String], keyCol: String,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2 (got d=$d, w=$w)")
    df.select(groupCols.map(col) :+ col(keyCol).cast("string").as("__k"): _*)
      .where(col("__k").isNotNull)
      .select(groupCols.map(col) :+ explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(col("__k"), r, w).as("b"))): _*))
        .as("__rb"): _*)
      .select(groupCols.map(col) :+ col("__rb.r").as("r") :+
        col("__rb.b").as("b"): _*)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("b"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch tables over the same (d, w): plain integer addition
    * per (group, r, b) — associative, commutative, lossless. */
  def merge(tables: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "merge needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("b"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** foreachBatch sink for streaming ingest: reduce the micro-batch to
    * its sparse counters and land them in the batch's OWN `batch_id=`
    * partition via dynamic overwrite — the repo's streaming idempotence
    * contract ([[SketchRollup]]/StreamingDedup/VectorIndex): a retried
    * batch recomputes identical counters and overwrites only itself,
    * so at-least-once delivery never double-counts. Serve via
    * [[served]] — the same addition algebra applied by the reader. */
  def sink(storePath: String, groupCols: Seq[String], keyCol: String,
      d: Int, w: Int): (DataFrame, Long) => Unit = (batch, batchId) => {
    sketchTable(batch, groupCols, keyCol, d, w)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storePath)
    ()
  }

  /** The served counter table: per-batch partitions summed back into
    * one (group, r, b, cnt) frame — O(groups·d·w·batches) rows read,
    * the raw stream never rescanned. */
  def served(spark: org.apache.spark.sql.SparkSession, storePath: String,
      groupCols: Seq[String]): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("b"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for probe keys: min over the d row
    * counters (missing counter = 0). `probes` carries (groupCols...,
    * keyCol); returns (groupCols..., keyCol, est). The probe side is
    * O(probes·d) rows joining the O(groups·d·w) table — serving never
    * rescans the stream. */
  def estimate(sketch: DataFrame, probes: DataFrame, groupCols: Seq[String],
      keyCol: String, d: Int, w: Int): DataFrame =
    probes
      .select(groupCols.map(col) :+ col(keyCol).cast("string").as("__k"): _*)
      .select(groupCols.map(col) :+ col("__k") :+
        explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), bucket(col("__k"), r, w).as("b"))): _*))
          .as("__rb"): _*)
      .select(groupCols.map(col) :+ col("__k") :+ col("__rb.r").as("r") :+
        col("__rb.b").as("b"): _*)
      .join(sketch, groupCols ++ Seq("r", "b"), "left")
      .groupBy(groupCols.map(col) :+ col("__k"): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .withColumnRenamed("__k", keyCol)
}
