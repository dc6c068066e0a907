package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join by bucket decomposition.
  *
  * Spark plans an inequality-only join (`a.st < b.en && b.st < a.en`)
  * as a BroadcastNestedLoop / cartesian — O(|L|·|R|) comparisons, dead
  * at scale. This operator MANUFACTURES an equi key: each half-open
  * interval [st, en) explodes into the fixed-width buckets it touches,
  * the two sides equi-join on the bucket id, and a pair is kept only in
  * the ONE bucket containing its overlap's start
  * (`bucket == floor(max(st_l, st_r) / width)`) — exactly-once without
  * a distinct, because that bucket is unique per overlapping pair and
  * both intervals by construction cover it. Comparisons are bounded by
  * per-bucket density², never corpus²; one exchange per side on the
  * bucket key.
  *
  * Reference analogue: the EPG time-attach joins
  * (`homed/repots/ChannelReport.scala:68-73`) carry an equi key and
  * stay hash joins (q18); this is the missing general form for when
  * the problem has NO natural equi key.
  *
  * Width tuning: rows ∝ duration/width per interval, probe cost ∝
  * density·width per bucket — set width near the p99 interval duration.
  * Long-tail intervals only add replica rows; exactly-once counting is
  * unaffected.
  */
object IntervalJoin {

  /** All overlapping pairs between `left` and `right`. Both frames must
    * carry integral `stCol`/`enCol` (half-open [st, en); rows with
    * en ≤ st are empty intervals and are dropped — they overlap
    * nothing). Output: every left column prefixed `l_`, every right
    * column prefixed `r_`. Self-joins: pass the same frame twice and
    * filter `l_<id> < r_<id>` to keep each unordered pair once. */
  def overlapJoin(left: DataFrame, right: DataFrame,
      stCol: String, enCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def exploded(df: DataFrame, p: String): DataFrame = {
      // unresolved col(name) after a wholesale rename — cross-frame
      // df(col) refs break under self-join dataset-id re-resolution
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, p + c))
      renamed
        .where(col(p + enCol) > col(p + stCol))
        .withColumn("__bucket",
          explode(sequence(
            floor(col(p + stCol) / bucketWidth),
            floor((col(p + enCol) - 1) / bucketWidth))))
    }
    val l = exploded(left, "l_")
    val r = exploded(right, "r_")
    l.join(r, Seq("__bucket"))
      .where(col("l_" + stCol) < col("r_" + enCol) &&
        col("r_" + stCol) < col("l_" + enCol) &&
        col("__bucket") ===
          floor(greatest(col("l_" + stCol), col("r_" + stCol)) / bucketWidth))
      .drop("__bucket")
  }
}
