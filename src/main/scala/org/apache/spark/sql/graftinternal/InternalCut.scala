package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.classic.{DataFrame, SparkSession}

/** Package-internal shim (compiled into an `org.apache.spark.sql`
  * subpackage to reach `private[sql]` members — the same access route
  * Spark's own test utilities use): a lineage cut that round-trips
  * through the UNSAFE row representation instead of external Rows.
  *
  * `Dataset.rdd` + `createDataFrame(rdd, schema)` — the portable form
  * [[graft.operators.SuffixRank.cut]] shipped with — pays TWO full
  * per-row conversions (InternalRow → external Row via
  * CatalystTypeConverters, then external Row → InternalRow again on
  * re-entry), which for a positions-scale frame checkpointed once per
  * doubling round is the dominant constant factor (the q225 lesson:
  * RDD round-trips bill by serialization, not by the recompute they
  * save). `queryExecution.toRdd` exposes the UnsafeRows directly; the
  * defensive `copy()` is REQUIRED — operators reuse row buffers, so
  * caching references without copying stores one garbage row N times.
  * `internalCreateDataFrame` re-wraps the checkpointed RDD as a fresh
  * leaf with default stats — the same plan-stat reset property the
  * portable cut relies on (see the SuffixRank scaladoc on the
  * BigInteger plan-stat melt). */
object InternalCut {

  def cut(df: DataFrame): DataFrame = {
    val spark: SparkSession = df.sparkSession
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    spark.internalCreateDataFrame(rdd, df.schema)
  }
}
