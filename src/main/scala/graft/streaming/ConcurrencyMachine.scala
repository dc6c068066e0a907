package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, ValueState}

/** One ±1 sweep-line delta on a concurrency stream (key = the series,
  * e.g. "day|event_type"; tSec = epoch seconds). */
final case class ConcDelta(key: String, tSec: Long, delta: Long)

/** Per-batch peak concurrency observed in one EPOCH hour (tSec / 3600)
  * of a series. The epoch hour is globally unique, so series keys need
  * not embed the day: peaks from different days can never collapse into
  * one (key, hr) bucket. Callers wanting hour-of-day take `hr % 24`. */
final case class ConcPeak(key: String, hr: Long, peak: Long)

/** Streaming peak-concurrency sweep line — the incremental twin of batch
  * q98 (`queries/BehaviorQueries`): per series, the running ±1 sum over
  * interval deltas, with the per-hour maximum emitted each micro-batch.
  * State is ONE long per series (the current concurrency) — the sweep
  * value is continuous across batches, so max-over-batches of the
  * emitted peaks equals the batch sweep's per-hour peak exactly when
  * deltas arrive in event-time order (the q98 replay contract, same as
  * FunnelMachine's; ConcurrencyMachineSpec proves the equality on the
  * fixture).
  *
  * Within a batch, equal-timestamp deltas are collapsed before the
  * running sum — the same tie rule q98 applies — so the peak never
  * depends on the arrival order of simultaneous starts/ends. */
object ConcurrencyMachine {

  final class Processor
      extends StatefulProcessor[String, ConcDelta, ConcPeak] {
    @transient private var conc: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      conc = getHandle.getValueState[Long](
        "conc", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ConcDelta],
        timerValues: TimerValues): Iterator[ConcPeak] = {
      var c = if (conc.exists()) conc.get() else 0L
      // collapse ties, then sweep in time order
      val points = rows.toSeq.groupBy(_.tSec).toSeq.sortBy(_._1)
        .map { case (t, ds) => c += ds.map(_.delta).sum; (t, c) }
      conc.update(c)
      points.groupBy { case (t, _) => t / 3600L }
        .map { case (hr, pts) => ConcPeak(key, hr, pts.map(_._2).max) }
        .iterator
    }
  }

  /** Wire the sweep line onto a delta stream (RocksDB provider required,
    * as for every transformWithState op). */
  def hourlyPeaks(deltas: Dataset[ConcDelta])(
      implicit s: SparkSession): Dataset[ConcPeak] = {
    import s.implicits._
    deltas.groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
