package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized multi-grain report framework (SURVEY §7.1 step 5).
  *
  * The reference runs one hand-written job per report × time-grain
  * (`_by_halfhour/_by_day/_by_week/_by_month/_by_quarter/_by_year`, ~40
  * jobs, e.g. `homed/repots/LiveChannelStatistics.scala:176-223`). Here a
  * single parameterized aggregation covers every grain: callers pass the
  * base facts, dimensions, and metric expressions once.
  *
  * Scale: each grain is one hash aggregate over the same scan (Spark
  * reuses the cached/scanned base via the union); rolling distinct uses
  * the explode-offsets formulation — a pure hash aggregation — instead of
  * a theta join, so there is no BNLJ anywhere at 100 TB.
  */
object GrainReports {

  /** Time bucket for a grain. halfhour = epoch/1800 floor; calendar
    * grains use date_trunc (ISO weeks, like DuckDB). */
  def bucket(ts: Column, grain: String): Column = grain match {
    case "halfhour" =>
      timestamp_seconds(floor(unix_timestamp(ts) / 1800) * 1800)
    case g => date_trunc(g, ts)
  }

  /** One aggregation per grain over the same base, unioned with a grain
    * tag column. `metrics` must be pre-aliased aggregate columns.
    * NOTE: the base is scanned ONCE PER GRAIN (the per-grain bucket
    * expressions produce different exchanges, so Spark cannot share
    * them) — `base.cache()` before calling when the scan is expensive.
    * Coarse grains cannot be rolled up from fine-grain partials when
    * metrics include countDistinct. */
  def multiGrain(base: DataFrame, tsCol: String, grains: Seq[String],
      dims: Seq[String], metrics: Seq[Column]): DataFrame =
    grains.map { g =>
      val agged = base
        .groupBy(bucket(col(tsCol), g).as("bucket") +: dims.map(col): _*)
        .agg(metrics.head, metrics.tail: _*)
      agged.select(lit(g).as("grain") +: agged.columns.map(col): _*)
    }.reduce(_ unionByName _)

  /** Rolling n-day distinct count per day (the reference's 7d/30d grains,
    * `LiveChannelStatistics.scala:574-606`, recomputed there by
    * re-unioning per-day user arrays). Formulation: dedup (day, id),
    * explode each row to the n window-days it contributes to, hash-agg a
    * distinct count per window day, keep days that exist in the data.
    * No theta join; shuffle keys are (day) — uniform. */
  def rollingDistinct(base: DataFrame, tsCol: String, idCol: String,
      nDays: Int): DataFrame = {
    // sequence(0, nDays-1) silently counts BACKWARDS for nDays <= 0
    require(nDays >= 1, s"rolling window must cover at least 1 day (got $nDays)")
    val idDays = base
      .select(to_date(col(tsCol)).as("day"), col(idCol).as("id"))
      .distinct()
    val days = idDays.select(col("day")).distinct()
    idDays
      .select(col("id"),
        explode(sequence(lit(0), lit(nDays - 1))).as("off"), col("day"))
      .select(col("id"), date_add(col("day"), col("off")).as("wday"))
      .join(days.withColumnRenamed("day", "wday"), Seq("wday"), "left_semi")
      .groupBy(col("wday").as("day"))
      .agg(countDistinct(col("id")).as(s"uv_${nDays}d"))
  }
}
