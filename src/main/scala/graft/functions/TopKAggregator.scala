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

  // buffer stays sorted and ≤ k; the common case (full buffer, new row
  // sorts after the k-th) is one comparison, otherwise binary-search
  // insert — O(log k) search + O(k) shift, never a per-row sort
  override def reduce(b: Seq[ScoredId], a: (String, ScoredId)): Seq[ScoredId] = {
    val x = a._2
    if (b.length >= k && ord.compare(x, b.last) >= 0) b
    else {
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.compare(b(mid), x) <= 0) lo = mid + 1 else hi = mid
      }
      val ins = (b.take(lo) :+ x) ++ b.drop(lo)
      if (ins.length > k) ins.take(k) else ins
    }
  }

  // two sorted runs → linear merge, then cap at k
  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] = {
    val out = Vector.newBuilder[ScoredId]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < x.length || j < y.length)) {
      val takeX = j >= y.length ||
        (i < x.length && ord.compare(x(i), y(j)) <= 0)
      if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
