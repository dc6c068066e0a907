package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY H-8): the reference's region-default rule
  * (`etl/LogParser.scala:264`) concentrates every unknown region on one
  * key, so a single reducer receives a large share of a 100 TB shuffle.
  * Two-stage salted aggregation splits each hot key into `buckets`
  * sub-keys for the first (heavy) exchange, then combines the partials
  * in a second (tiny) exchange. AQE's skew-join handling (enabled in
  * GraftSession) covers the JOIN side; this covers aggregations.
  */
object SkewUtils {

  /** Deterministic salt in [0, buckets): hashes the given columns —
    * typically a fine-grained column like user id — so the same input
    * row always lands in the same bucket (reruns are stable). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong))

  /** Two-stage salted sum: `groupBy(keys :+ salt).sum` (heavy exchange,
    * hot keys split `buckets` ways) then `groupBy(keys).sum` (light
    * exchange over keys × buckets rows). Result is identical to a direct
    * `groupBy(keys).agg(sum)` — addition is associative — but no single
    * reducer ever sees a whole hot key. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltSource: Seq[String], buckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", salt(buckets, saltSource.map(col): _*))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Two-stage salted exact distinct count: stage 1 dedups (key, salt,
    * value) — each hot key's value set is split across buckets — stage 2
    * counts the already-distinct rows per key. Exact, unlike
    * approx_count_distinct, but with bounded per-reducer state. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String],
      valueCol: String, buckets: Int = 16): DataFrame = {
    val deduped = df
      .withColumn("_salt", salt(buckets, col(valueCol)))
      .select((keys :+ "_salt" :+ valueCol).map(col): _*)
      .distinct()
    deduped
      .groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as(s"n_distinct_$valueCol"))
  }
}
