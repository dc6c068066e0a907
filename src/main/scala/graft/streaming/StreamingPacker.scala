package graft.streaming

import graft.operators.SeqPacker.{Piece, Placed}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, ValueState}

private[streaming] final case class PackState(seq: Long, rem: Long)

/** Streaming next-fit sequence packing — the incremental twin of batch
  * [[graft.operators.SeqPacker.pack]] (the CdcMachine/StreamingMvCensus
  * twin idiom): pieces of the boundary-respecting pack arrive as a
  * stream and each (lang, bucket) key folds them through the SAME
  * next-fit recurrence in O(1) typed state per key on RocksDB — next-fit
  * is chosen in SeqPacker precisely because its state is one open
  * remainder, which is what makes this twin possible at all (best-fit
  * keeps the whole open-sequence array and is the offline-only tier).
  *
  * Ordering contract: next-fit is order-DEPENDENT by definition (it IS
  * "pack in arrival order"), so unlike CdcMachine's total-order winner
  * the stream must deliver each key's pieces in nondecreasing
  * (ord1, ord2) across micro-batches — the natural contract when the
  * upstream emits pieces in packing order (e.g. the per-language salted
  * rank order SeqPacker documents). WITHIN a batch arrival order is
  * free: the processor sorts its group slice (bounded by a 64-doc
  * bucket's pieces) before folding. StreamingPackerSpec proves replay
  * equality against the batch pack under an adversarial mid-bucket
  * batch split with shuffled within-batch order.
  *
  * At 100 TB: state is two longs per OPEN (lang, bucket) — buckets are
  * 64 docs, so live state tracks only buckets still receiving pieces;
  * the keyed shuffle is the same (lang, bucket) exchange the batch pack
  * pays. Emissions append; a sequence census folds them with the exact
  * q240 aggregation because piece→sequence assignment is identical. */
object StreamingPacker {

  final class Processor(cap: Int)
      extends StatefulProcessor[(String, Long), Piece, Placed] {
    @transient private var st: ValueState[PackState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PackState](
        "pack", Encoders.product[PackState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[Piece],
        timerValues: TimerValues): Iterator[Placed] = {
      var s = if (st.exists()) st.get() else PackState(-1L, 0L)
      // within-batch order is adversarial; the fold order is the batch
      // pack's (ord1, ord2). Bounded: one bucket's piece slice.
      val out = rows.toArray.sortBy(p => (p.ord1, p.ord2)).map { p =>
        if (p.size <= s.rem) s = PackState(s.seq, s.rem - p.size)
        else s = PackState(s.seq + 1L, cap.toLong - p.size)
        Placed(p.lang, p.bucket, p.ord1, p.ord2, p.docId, p.size, s.seq)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Wire the pack onto a piece stream (RocksDB provider required, as
    * for every transformWithState op). */
  def placed(pieces: Dataset[Piece], cap: Int)(
      implicit s: SparkSession): Dataset[Placed] = {
    import s.implicits._
    require(cap > 0, s"cap must be positive, got $cap")
    pieces.groupByKey(p => (p.lang, p.bucket))
      .transformWithState(new Processor(cap), TimeMode.None(),
        OutputMode.Append())
  }
}
