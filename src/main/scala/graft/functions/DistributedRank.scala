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
  * the same wall on a single reducer. Two-pass alternative:
  *
  *  1. ONE driver action freezes approximate quantile boundaries of the
  *     leading sort column as literals. The bucket id `__pid` is then a
  *     PURE FUNCTION of the row value — unlike `repartitionByRange` +
  *     `spark_partition_id()`, whose ids depend on which sampling run /
  *     exchange materialization a branch happens to read, so correctness
  *     would silently hinge on exchange reuse being on. Re-evaluating any
  *     branch here always reassigns identical buckets.
  *  2. One hash exchange on `__pid` (the bucket window's own required
  *     distribution — no second full-data shuffle), then a per-bucket
  *     row_number. Bucket counts — numBuckets rows of metadata, not
  *     data — cumulate into starting offsets via a triangular broadcast
  *     self-join (NOT an un-partitioned window: even over 32 metadata
  *     rows that plans as a single-partition WindowExec and logs the
  *     scale warning — O(numBuckets²) join rows are cheaper than the
  *     noise) and broadcast back: global row number = offset + local
  *     row number.
  *
  * Exact (not approximate): correctness needs only the bucket invariant —
  * every row in bucket p sorts before every row in p+1 — which holds for
  * ANY boundary values because buckets cut on the leading sort column
  * (equal values never straddle a cut; nulls take bucket 0 = Spark's
  * nulls-first, NaN falls to the last = Spark's NaN-last). Boundary
  * quality affects only balance; a single hot key makes one big bucket
  * (same as any range partitioning of that key).
  */
object DistributedRank {

  /** Adds a 1-based global row number `rnCol` ordered by `sortCols`.
    * The sort is ASCENDING (nulls first — the bucket cut `lead <= bound`
    * assumes it; rank a descending order by negating the key). The
    * LEADING sort column must be numeric/timestamp (boundary
    * sampling casts it to double) and the full sort key unique per row
    * (append a tiebreak id, as every query in this repo already does) —
    * then row_number == rank == dense_rank, and percent_rank/cume_dist/
    * ntile derive arithmetically via [[percentRankOf]]/[[cumeDistOf]]/
    * [[ntileOf]]. */
  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): DataFrame =
    withRowNumberAndTotal(df, rnCol, "__total", sortCols: _*).drop("__total")

  /** Like [[withRowNumber]] but also attaches the total row count as
    * `totalCol` — derived from the same per-bucket counts, so callers
    * needing N (percent_rank/cume_dist/ntile) don't pay a second scan of
    * the input to count it. */
  /** Shared first pass: freeze quantile boundaries of the leading sort
    * column, tag every row with its range-bucket id `__pid` (a pure
    * function of the row value — see the object scaladoc), and exchange
    * on it. nb <= 1 short-circuits to one bucket: no cuts to sample (and
    * percentile_approx with an empty percentage array is undefined
    * territory). */
  private def rangeBucketed(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val nb = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val lead = sortCols.head.cast("double")
    val bounds: Seq[Double] = if (nb <= 1) Seq.empty else df
      .select(percentile_approx(lead,
        typedlit((1 until nb).map(_.toDouble / nb)), lit(10000)).as("b"))
      .collect().headOption
      .filter(!_.isNullAt(0))
      .map(_.getSeq[Double](0).distinct.sorted)
      .getOrElse(Seq.empty)
    val pid = bounds.zipWithIndex
      .foldLeft(when(sortCols.head.isNull, 0)) {
        case (acc, (b, i)) => acc.when(lead <= b, i)
      }
      .otherwise(bounds.size).cast("int")
    df.withColumn("__pid", pid).repartition(col("__pid"))
  }

  def withRowNumberAndTotal(df: DataFrame, rnCol: String, totalCol: String,
      sortCols: Column*): DataFrame = {
    val parted = rangeBucketed(df, sortCols)
    val localW = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = parted.withColumn("__lrn", row_number().over(localW).cast("long"))
    val cnts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offsets = prefixOffsets(cnts)
      .crossJoin(broadcast(cnts.agg(sum(col("__cnt")).as(totalCol))))
      .select(col("__pid"), col("__off"), col(totalCol))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }

  /** Exclusive prefix sums over the per-bucket totals `(__pid, __cnt)`
    * WITHOUT a window: even a numBuckets-row un-partitioned window plans
    * as a single-partition WindowExec (and logs Spark's scale warning),
    * so the offsets come from a triangular broadcast self-join instead —
    * O(numBuckets²) joined metadata rows, zero global-window shapes
    * anywhere in the codebase. */
  private def prefixOffsets(cnts: DataFrame): DataFrame = {
    val prior = cnts.select(col("__pid").as("__bpid"), col("__cnt").as("__bcnt"))
    cnts.join(broadcast(prior), col("__bpid") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(first(col("__cnt")).as("__cnt"),
        coalesce(sum(col("__bcnt")), lit(0L)).as("__off"))
  }

  /** Distributed global RUNNING TOTAL (inclusive prefix sum of `valCol`
    * in `sortCols` order) — same two-pass shape as [[withRowNumberAndTotal]]
    * with per-bucket SUMS instead of counts: bucket-local window prefix
    * sums + broadcast per-bucket offsets. The naive
    * `sum().over(Window.orderBy(...))` funnels every row through one task;
    * here the only cross-bucket state is the numBuckets-row offsets join.
    * Same contract: leading
    * sort column numeric, full sort key unique, `valCol` integral (the
    * offsets must be exact — floats would reorder-drift across buckets). */
  def withRunningTotal(df: DataFrame, rtCol: String, valCol: Column,
      sortCols: Column*): DataFrame = {
    val parted = rangeBucketed(df.withColumn("__v", valCol.cast("long")), sortCols)
    val localW = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__lrt", sum(col("__v")).over(localW))
    val cnts = parted.groupBy(col("__pid")).agg(sum(col("__v")).as("__cnt"))
    val offsets = prefixOffsets(cnts).select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rtCol, col("__off") + col("__lrt"))
      .drop("__pid", "__v", "__lrt", "__off")
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
