package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking without a single-partition data window.
  *
  * `Window.orderBy(...)` with no partitionBy funnels EVERY row through one
  * task (Spark warns about exactly this): tolerable for bounded series
  * (q71's one-row-per-day input), a scale-killer on fact-sized inputs —
  * the reference's rank jobs (`rank/reports/StarRank.scala` family) hit
  * the same wall on a single reducer. Classic two-pass alternative:
  *
  *  1. `repartitionByRange` on the sort key: non-overlapping, ordered key
  *     ranges per partition (equal keys co-located), then a PER-PARTITION
  *     row_number (sort within partition; no global exchange of data).
  *  2. Per-partition counts — numPartitions rows of metadata, not data —
  *     cumulated into starting offsets (the only unpartitioned window in
  *     the plan runs over that tiny count set, the same driver-scale work
  *     Spark's own RangePartitioner does when sampling boundaries) and
  *     broadcast back. Global row number = offset + local row number.
  *
  * Exact (not approximate): correctness needs only the range-partition
  * invariant — every key in partition p sorts before every key in p+1 —
  * which holds for ANY sampled boundaries.
  */
object DistributedRank {

  /** Adds a 1-based global row number `rnCol` ordered by `sortCols`.
    * The sort key must be unique per row (append a tiebreak id, as every
    * query in this repo already does) — then row_number == rank ==
    * dense_rank, and percent_rank/cume_dist/ntile derive arithmetically
    * via [[percentRankOf]]/[[cumeDistOf]]/[[ntileOf]]. */
  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): DataFrame =
    withRowNumberAndTotal(df, rnCol, "__total", sortCols: _*).drop("__total")

  /** Like [[withRowNumber]] but also attaches the total row count as
    * `totalCol` — derived from the same per-partition counts, so callers
    * needing N (percent_rank/cume_dist/ntile) don't pay a second scan of
    * the input to count it. */
  def withRowNumberAndTotal(df: DataFrame, rnCol: String, totalCol: String,
      sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = parted.withColumn("__lrn", row_number().over(localW).cast("long"))
    val offW = Window.orderBy(col("__pid"))
    val offsets = local
      .groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(offW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn(totalCol, sum(col("__cnt")).over(
        offW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__off"), col(totalCol))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }

  /** SQL-standard ntile bucket from a global row number and total count:
    * first `total % n` buckets get one extra row. Positive longs only, so
    * double division + long cast is an exact floor. */
  def ntileOf(rn: Column, total: Column, n: Int): Column = {
    val base = (total / n).cast("long")
    val rem = total % n
    val cut = rem * (base + 1)
    when(rn <= cut, (rn - 1) / (base + 1))
      .otherwise(rem + (rn - cut - 1) / base)
      .cast("long").+(1).cast("int")
  }

  /** percent_rank for a unique total ordering: (rn-1)/(N-1); 0 when N=1. */
  def percentRankOf(rn: Column, total: Column): Column =
    when(total === 1, 0.0)
      .otherwise((rn - 1).cast("double") / (total - 1))

  /** cume_dist for a unique total ordering: rn/N. */
  def cumeDistOf(rn: Column, total: Column): Column =
    rn.cast("double") / total
}
