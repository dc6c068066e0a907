package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate for a group's top-k. Score is kept in
  * exact integer units (e.g. cents) so ordering is deterministic across
  * engines and partition orders. */
case class ScoredId(id: Long, score: Long)

/** Grouped exact top-k as a typed Aggregator — the scale path for
  * "top N per group" when groups are huge: each task reduces its slice
  * of a group to ≤ k rows BEFORE the shuffle (partial aggregation), so
  * the exchange carries O(groups × k) rows and merge touches 2k
  * elements. The
  * window form (`row_number().over(partitionBy(g).orderBy(...))`)
  * shuffles EVERY row of every group and sorts whole groups — at 100 TB
  * with million-row groups that is the difference between a bounded agg
  * and a spill.
  *
  * Order is (score desc, id asc) with the id tie-break, so the result
  * is a deterministic function of the SET of inputs regardless of
  * partitioning — spec-proven equal to the window form.
  *
  * Reference analogue: the reference's per-channel "top programs"
  * reports sort whole partitions in HiveQL (rank() over full shuffles,
  * e.g. `homed/repots/ColumnVisitStatistics.scala` rank windows); this
  * keeps the same contract with a bounded buffer.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(String, ScoredId), Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  private def ord: Ordering[ScoredId] = Ordering.by(s => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Vector.empty

  // buffer stays sorted and ≤ k, so insert + re-take touches k+1
  // elements — constant-bounded work per input row
  override def reduce(b: Seq[ScoredId], a: (String, ScoredId)): Seq[ScoredId] =
    (b :+ a._2).sorted(ord).take(k)

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
