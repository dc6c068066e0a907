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
    * exchange over keys × buckets rows). For integral value columns the
    * result is exactly the direct `groupBy(keys).agg(sum)`; for
    * floating-point columns the two-stage accumulation order differs, so
    * round() before any exact cross-engine compare. The `_salt`/`_partial`
    * working columns are dropped from the output but would clobber
    * same-named input columns. */
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

  /** Two-stage exact distinct count: stage 1 dedups (key, value) rows —
    * the distinct() exchange hash-partitions on the FULL tuple, so a hot
    * key's values spread across all reducers already (no extra salt
    * column needed — the value IS the spreader); stage 2 counts the
    * deduped rows per key. Exact, unlike approx_count_distinct, with
    * per-reducer state bounded by tuples-per-partition. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as(s"n_distinct_$valueCol"))

  /** Skew-safe shuffle equi join: every fact row gets a deterministic
    * salt from `spreadCols` (fine-grained columns — line number, user
    * id), and the dim side is replicated once per salt value, so the
    * join key becomes (key, salt) and a hot key's rows fan out over
    * `buckets` reducers instead of one. Result is EXACTLY the plain
    * equi join — the salt is an internal column, dropped on output.
    *
    * This is the manual form for when AQE's skew-join split (on in
    * GraftSession) can't act: AQE only splits FINISHED shuffle blocks
    * of sort-merge joins, so a hot key hidden behind a bucketed-table
    * scan or a stream-static join still needs explicit salting. Dim
    * replication costs buckets× its size — keep `buckets` at the skew
    * factor, not the cluster size, and never salt a broadcastable dim
    * (broadcast already has no shuffle to skew). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      spreadCols: Seq[String], buckets: Int = 16): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val salted = fact.withColumn("_salt", salt(buckets, spreadCols.map(col): _*))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
