package graft.core

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.jdk.CollectionConverters._

/** One completed Spark action, as the ops log sees it. */
final case class TimedJob(action: String, millis: Long, succeeded: Boolean,
    planHead: String)

/** Ops-side job timing — the reference wraps every job in a Stopwatch
  * and appends wall-clock lines to `/r2/bigdata/timer_*.log`
  * (`utils/LogUtils.scala:60-72`, values never published). Rebuilt on
  * the engine's own listener bus instead of hand-threaded stopwatches:
  * every action (count/collect/save) reports its wall time and the head
  * of its physical plan, with zero changes to job code.
  *
  * Scale notes: the listener runs on the driver's listener bus — keep
  * the callback O(1) (enqueue only; no plan stringification beyond the
  * first line) or slow listeners stall the bus. Entries live in a
  * bounded in-memory queue; [[report]] drains to a text file via the K7
  * sink for the ops-side tail -f the reference's timer logs served. */
final class JobTimer(maxEntries: Int = 10000) extends QueryExecutionListener {
  private val buf = new ConcurrentLinkedQueue[TimedJob]()
  // ConcurrentLinkedQueue.size() is O(n) — walking 10k nodes per completed
  // action would itself stall the listener bus, so the count is tracked
  // beside the queue and every callback stays O(1)
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  private def head(qe: QueryExecution): String = {
    val s = qe.executedPlan.nodeName
    if (s.length > 120) s.take(120) else s
  }

  private def add(j: TimedJob): Unit = {
    buf.add(j)
    var c = n.incrementAndGet()
    while (c > maxEntries) { // drop oldest, stay bounded
      c = if (buf.poll() != null) n.decrementAndGet() else maxEntries
    }
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    add(TimedJob(funcName, durationNs / 1000000L, succeeded = true, head(qe)))

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    add(TimedJob(funcName, -1L, succeeded = false, head(qe)))

  /** Snapshot of recorded actions, oldest first. */
  def entries: Seq[TimedJob] = buf.iterator().asScala.toSeq

  /** Drain the recorded timings to a delimited report file (K7 sink). */
  def report(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    graft.sources.IoOps.writeTextReport(
      entries.toDF("action", "millis", "succeeded", "plan_head"), path)
  }
}

object JobTimer {
  /** Register a fresh timer on the session's listener bus and return it. */
  def install(spark: SparkSession, maxEntries: Int = 10000): JobTimer = {
    val t = new JobTimer(maxEntries)
    spark.listenerManager.register(t)
    t
  }

  def uninstall(spark: SparkSession, t: JobTimer): Unit =
    spark.listenerManager.unregister(t)
}
