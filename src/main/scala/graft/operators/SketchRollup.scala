package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted mergeable-sketch tables — the pre-aggregated UV (unique
  * visitor) architecture every 100 TB reporting stack converges on
  * (cf. the reference's per-grain UV report mains, e.g.
  * `homed/report/UserOnlineByHalfHour.scala`, which recount distinct
  * users per grain from raw logs): aggregate the raw stream ONCE into
  * fine-grain HLL sketches (one binary column per cell, KB-bounded by
  * lgK), persist that table, and serve every coarser grain — weekly,
  * monthly, all-time, any dimension rollup — by sketch UNION, never by
  * re-scanning raw data.
  *
  * Sketch algebra (Apache DataSketches HLL, built into Spark as
  * `hll_sketch_agg`/`hll_union_agg`): union is associative,
  * commutative, and lossless w.r.t. the register state, so
  * `estimate(union(daily sketches)) == estimate(sketch(all rows))`
  * EXACTLY (same lgK) — SketchRollupSpec pins that equality, which is
  * what makes the persisted table a safe substitute for the raw scan.
  * Error vs the true distinct count stays the HLL guarantee (~1.04/√2^lgK
  * rsd); the spec pins a 5σ envelope like q08's.
  *
  * Scale shape: building the sketch table is one map-side-partial agg
  * over the raw table (sketches merge in the partial, so the exchange
  * carries O(cells) KB-sized states, never user ids); every rollup
  * after that reads O(cells) rows — at 100 TB the raw scan happens
  * once per ingest batch instead of once per report × grain.
  */
object SketchRollup {

  /** Fine-grain sketch table: one HLL state per `groupCols` cell over
    * distinct `idCol` values. The partial aggregation is the point: each
    * task emits one KB-sized register bank per cell, so the exchange
    * volume is O(cells·2^lgK bytes) regardless of row count. */
  def sketchTable(df: DataFrame, groupCols: Seq[String], idCol: String,
      lgK: Int = 14): DataFrame = {
    require(groupCols.nonEmpty, "sketchTable needs at least one grouping column")
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21] (got $lgK)")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(idCol), lit(lgK)).as("uv_sketch"))
  }

  /** Merge two sketch tables on `keys`: full outer join, one-sided cells
    * pass through, shared cells union register-wise (same lgK). This is
    * the micro-batch UPSERT of the realtime UV architecture — each batch
    * sketches its own rows and unions into the persisted table, so users
    * seen in many batches count ONCE (the correctness a naive counter
    * upsert cannot provide). StreamingSketchTableSpec drives it under
    * foreachBatch with heavy cross-batch user overlap. */
  def mergeSketchTables(cur: DataFrame, prev: DataFrame,
      keys: Seq[String]): DataFrame = {
    val p = prev.withColumnRenamed("uv_sketch", "_prev_sketch")
    cur.join(p, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("uv_sketch").isNull, col("_prev_sketch"))
          .when(col("_prev_sketch").isNull, col("uv_sketch"))
          .otherwise(hll_union(col("uv_sketch"), col("_prev_sketch")))
          .as("uv_sketch"): _*)
  }

  /** Roll a sketch table up to coarser `keys` by sketch union, and emit
    * the UV estimate. Reads O(cells) rows — never the raw table. */
  def rollupEstimate(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    val merged =
      if (keys.isEmpty)
        sketches.agg(hll_union_agg(col("uv_sketch")).as("merged"))
      else
        sketches.groupBy(keys.map(col): _*)
          .agg(hll_union_agg(col("uv_sketch")).as("merged"))
    merged.withColumn("uv", hll_sketch_estimate(col("merged")).cast("long"))
      .drop("merged")
  }
}
