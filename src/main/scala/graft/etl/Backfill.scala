package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.IoOps

/** Delayed-log patch (`etl/LogDelay.scala:47-49`, `etl/LogDelayPatch.scala`,
  * `etl/OnlineTimePatch.scala`): facts for day D are published with the
  * day-D batch; straggler events for D arrive in later batches. The patch
  * re-reads the RAW rows of only the affected days, merges the late rows,
  * re-aggregates, and idempotently replaces just those day partitions
  * (K9 dynamic partition overwrite — the managed form of the reference's
  * delete-where-day-then-insert). Untouched days are neither read nor
  * rewritten, so at 100 TB patch cost is proportional to the late data's
  * day spread, not the store size.
  *
  * The store holds ADDITIVE partials at (day, dims..., user_id) grain:
  * counts and sums merge by re-summing, and the exact distinct-user count
  * per (day, dims) stays derivable as a row count after any number of
  * patches — the same reason the reference keeps `t_user_array_by_day`
  * at user grain.
  */
object Backfill {

  /** Aggregate raw rows to the stored partial grain. `rows` must carry a
    * string `day` column (the partition value), the `dims`, `user_id`,
    * and a long measure column named `measure`. */
  def toPartials(rows: DataFrame, dims: Seq[String], measure: String): DataFrame =
    rows.groupBy((col("day") +: dims.map(col)) :+ col("user_id"): _*)
      .agg(count(lit(1)).as("n"), sum(col(measure)).as(measure))

  /** Publish day partitions of partials (idempotent: dynamic overwrite
    * replaces exactly the days present in `partials`). Repartitioned on
    * the day first: without it every shuffle task writes a sliver into
    * every day directory (tasks × days small files — measured 960 at
    * sf0.1); `filesPerDay > 1` spreads a huge day over that many writer
    * tasks (deterministic hash of the whole row) when one file per day
    * would bottleneck. */
  def publish(partials: DataFrame, store: String, filesPerDay: Int = 1): Unit = {
    val keyed =
      if (filesPerDay <= 1) partials.repartition(col("day"))
      else partials.repartition(col("day"),
        pmod(crc32(concat_ws("|",
          partials.columns.map(c => col(c).cast("string")): _*)),
          lit(filesPerDay)))
    IoOps.replaceDayPartitions(keyed, store)
  }

  /** Merge late-arriving raw rows into the store. `rawOnTime` is the
    * full on-time raw feed (it is FILTERED to the affected days before
    * any work — with a partitioned raw store the filter prunes to those
    * partitions); `lateRaw` is the straggler batch. Recompute-and-replace
    * rather than read-merge-write of the store itself: Spark (correctly)
    * refuses to overwrite a path it is reading, and the reference's patch
    * jobs re-read the raw day too. The affected-day list is collected —
    * day-count metadata, not data, same scale as Spark's own partition
    * listing. Returns the affected days (sorted). */
  def patchLate(spark: SparkSession, store: String, rawOnTime: DataFrame,
      lateRaw: DataFrame, dims: Seq[String], measure: String): Seq[String] = {
    // NULL-day rows (malformed stragglers) can't name a partition to
    // patch: dropped here, and dropped from the merge below — isin(null)
    // never matches and a bare null would NPE the string sort.
    val days = lateRaw.where(col("day").isNotNull)
      .select(col("day")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (days.nonEmpty) {
      val merged = toPartials(
        rawOnTime.where(col("day").isin(days: _*))
          .unionByName(lateRaw.where(col("day").isNotNull)),
        dims, measure)
      publish(merged, store)
    }
    days
  }
}
