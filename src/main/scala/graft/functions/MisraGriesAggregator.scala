package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequency summary as a typed Aggregator — the bounded-
  * memory half of two-pass EXACT heavy hitters (q164).
  *
  * Why it exists: "which tokens exceed φ·N of a 100 TB corpus" via a
  * plain `groupBy(token).count()` shuffles the ENTIRE vocabulary —
  * billions of distinct n-grams, a full-corpus exchange, just to keep
  * the dozens of rows above the threshold. A Misra–Gries summary of
  * capacity k reduces each partition to ≤ k (item, weight) pairs BEFORE
  * the exchange (classic partial aggregation — the map side emits O(k)
  * rows per task no matter how many distinct items it saw), and merged
  * summaries obey the same guarantee (Agarwal et al., "Mergeable
  * Summaries", PODS'12): any item with true count > N/(k+1) SURVIVES in
  * the merged summary, and every reported weight underestimates the
  * true count by at most N/(k+1). The summary alone is approximate —
  * the exact pass (a semi join of the candidates back against the
  * corpus, then a real count of just those items) restores exactness;
  * no approximation ever reaches the output.
  *
  * Determinism note: reported WEIGHTS depend on partitioning (decrement
  * order), so only the guaranteed-superset property is stable — which
  * is exactly what a candidate-pruning pass needs, and why the output
  * of the two-pass operator (exact recounts, exact threshold) is
  * deterministic even though this intermediate is not.
  *
  * Implementation: the buffer is a Map of ≤ k items; an unseen item
  * with a full buffer decrements every counter by the new item's weight
  * capped at the buffer minimum (the batched form of the textbook
  * one-decrement step, correct for weighted arrivals); zero-weight
  * entries evict. Merge sums per-item weights, then applies one joint
  * decrement of the (k+1)-th largest weight — the mergeable-summaries
  * rule. */
/** MG summary buffer: ≤ k surviving (item, residual weight) entries plus
  * the EXACT total number of items summarized (`n` rides the buffer —
  * the mergeable-summaries formulation — so callers get the group size
  * and the threshold base from the same single pass). */
case class MgSummary(items: Map[String, Long], n: Long)

class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MgSummary, MgSummary] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: MgSummary = MgSummary(Map.empty, 0L)

  override def reduce(b: MgSummary, item: String): MgSummary = {
    val m = b.items.get(item) match {
      case Some(w) => b.items.updated(item, w + 1L)
      case None if b.items.size < k => b.items.updated(item, 1L)
      case None =>
        // decrement-all by the arriving unit weight; evict zeros. The
        // event removes ≤ k+1 total mass, so ≤ n/(k+1) events can occur
        // — the per-item undercount bound.
        b.items.iterator
          .map { case (i, w) => (i, w - 1L) }
          .filter(_._2 > 0L)
          .toMap
    }
    MgSummary(m, b.n + 1L)
  }

  override def merge(x: MgSummary, y: MgSummary): MgSummary = {
    val summed = y.items.foldLeft(x.items) { case (acc, (i, w)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + w)
    }
    val m =
      if (summed.size <= k) summed
      else {
        // joint decrement by the (k+1)-th largest weight, evict
        // non-positive — Agarwal et al.'s merge, which preserves the
        // combined (n₁+n₂)/(k+1) error bound
        val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        summed.iterator
          .map { case (i, w) => (i, w - cut) }
          .filter(_._2 > 0L)
          .toMap
      }
    MgSummary(m, x.n + y.n)
  }

  override def finish(b: MgSummary): MgSummary = b

  override def bufferEncoder: Encoder[MgSummary] = ExpressionEncoder[MgSummary]()
  override def outputEncoder: Encoder[MgSummary] = ExpressionEncoder[MgSummary]()
}
