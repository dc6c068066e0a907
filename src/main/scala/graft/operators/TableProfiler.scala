package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-scan column profiler — the stats census every warehouse loads
  * lead with (null rates, cardinalities, ranges feed CBO estimates,
  * data-quality gates and schema-drift alarms; the reference's ops
  * side eyeballs per-table counts in its completeness monitor,
  * `monitor/MonitorApp.scala:16-48` — this is the per-COLUMN form).
  *
  * ALL columns profile in ONE aggregate over ONE scan: Catalyst plans
  * the multi-`countDistinct` via Expand (row multiplication ×
  * |profiled columns|, still a single pass — the fused alternative to
  * K per-column jobs costing K scans). At 100 TB swap the exact
  * distinct counts for `approx_count_distinct` — same plan minus the
  * Expand, HLL error; the exact form here is what lets the output
  * hash-match an external oracle (q205).
  *
  * Type discipline (cross-engine contract): numeric ranges emit as
  * `round(..., 4)` doubles in `min_num`/`max_num`; string ranges emit
  * binary-collation `min_str`/`max_str`; timestamp ranges emit
  * ISO-formatted strings (engine-stable, unlike raw timestamp
  * rendering). Each row profiles one column; absent measures are NULL.
  */
object TableProfiler {

  /** Profile `cols` (default: every column) of `df`: one output row per
    * column — (column, n_rows, n_null, n_distinct, min_num, max_num,
    * min_str, max_str). */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.schema.map(_.name)
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    val aggs = names.flatMap { c =>
      val base = Seq(
        sum(col(c).isNull.cast("long")).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
      types(c) match {
        case _: NumericType => base ++ Seq(
          round(min(col(c)).cast("double"), 4).as(s"__minn_$c"),
          round(max(col(c)).cast("double"), 4).as(s"__maxn_$c"))
        case _: StringType => base ++ Seq(
          min(col(c)).as(s"__mins_$c"),
          max(col(c)).as(s"__maxs_$c"))
        case _: TimestampType | _: TimestampNTZType | _: DateType => base ++ Seq(
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__mins_$c"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__maxs_$c"))
        case _ => base
      }
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = names.map { c =>
      val hasNum = types(c) match { case _: NumericType => true; case _ => false }
      val hasStr = types(c) match {
        case _: StringType | _: TimestampType | _: TimestampNTZType |
             _: DateType => true
        case _ => false
      }
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        (if (hasNum) col(s"__minn_$c") else lit(null).cast("double")).as("min_num"),
        (if (hasNum) col(s"__maxn_$c") else lit(null).cast("double")).as("max_num"),
        (if (hasStr) col(s"__mins_$c") else lit(null).cast("string")).as("min_str"),
        (if (hasStr) col(s"__maxs_$c") else lit(null).cast("string")).as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
      .orderBy(col("column"))
  }
}
